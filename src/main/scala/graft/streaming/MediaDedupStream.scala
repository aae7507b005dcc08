package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental PERCEPTUAL dedup — [[DedupStream]]'s loop at
  * the media layer: a fingerprint stream (doc_id, hash_hi, hash_lo —
  * image dHash, audio Haitsma–Kalker, whatever upstream decode
  * produced) classifies micro-batch by micro-batch against the
  * bucketed fingerprint store
  * ([[graft.operators.MediaDedup.writeFingerprintStore]]); each
  * batch's UNIQUE fingerprints append so every later micro-batch
  * dedups against everything that came before. Per-batch cost ∝
  * batch size — the store side of the classify join is bucketed and
  * exchange-free; the corpus is never re-fingerprinted.
  *
  * Same idempotence story as [[DedupStream]]: the result sink is
  * dynamic-partition-overwrite on micro_batch (a retried batch
  * replaces exactly its own partition), and a crash between the
  * result write and the store append is absorbed by the classify
  * join's batch_id ≠ corpus_id guard plus the append-side anti-join
  * (duplicate appends affect nothing; re-appends are skipped).
  */
object MediaDedupStream {

  /** Start the pipeline: `fpStream` must be a streaming DataFrame of
    * (doc_id, hash_hi, hash_lo). Classifications land at `outPath` as
    * parquet with a micro_batch column; progress checkpoints at
    * `checkpoint`. `maxHamming` must match the store's dial tier
    * (the scheme check fails the first batch fast otherwise). */
  def start(store: String, fpStream: DataFrame, maxHamming: Int,
      outPath: String, checkpoint: String,
      maxFilesPerBucket: Option[Int] = None): StreamingQuery =
    fpStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val classified = graft.operators.MediaDedup
          .ingestFingerprintBatch(batch.sparkSession, store, batch, maxHamming)
        classified.withColumn("micro_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("micro_batch")
          .parquet(outPath)
        // self-triggering compaction in the single writer's
        // between-batch quiet window (DedupStream's cadence contract)
        maxFilesPerBucket.foreach { n =>
          graft.operators.MediaDedup
            .maybeCompactFingerprintStore(batch.sparkSession, store, n)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** [[start]] + live cluster labels ([[DedupStream.startLabeled]]'s
    * media twin): each micro-batch classifies against the fingerprint
    * store AND maintains the incremental label store
    * ([[graft.operators.MediaDedup.ingestFingerprintBatchLabeled]]),
    * so every emitted row carries the doc's CURRENT cluster_id — a
    * batch-2 near-dup of a batch-1 unique joins that doc's cluster
    * with no full CC rerun. Same idempotent dynamic-partition sink;
    * label append and remap rewrite replay-safe the same way. */
  def startLabeled(store: String, fpStream: DataFrame, maxHamming: Int,
      outPath: String, checkpoint: String): StreamingQuery =
    fpStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val labeled = graft.operators.MediaDedup
          .ingestFingerprintBatchLabeled(batch.sparkSession, store, batch,
            maxHamming)
        labeled.withColumn("micro_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("micro_batch")
          .parquet(outPath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
