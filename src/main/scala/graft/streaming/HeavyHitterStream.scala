package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming heavy hitters — t15's Misra-Gries frequent-token sketch
  * maintained across micro-batches. State is store-resident like
  * every streaming state in graft (no executor memory, no watermark-
  * unbounded state), and replay-idempotent.
  *
  * Per micro-batch: exact batch token counts (one batch-sized
  * partial-agg shuffle) are MG-truncated to `cap` counters and land
  * as THIS batch's partial in a `batch_id=` partition with dynamic
  * overwrite — a replayed batch replaces its OWN partial, never
  * double-counts. The published sketch is the bulk MG-merge of every
  * partial: sum counts per token, subtract the (cap+1)-th largest
  * combined count, drop non-positives.
  *
  * GUARANTEE (mergeable summaries, Agarwal et al. 2012, PODS — the
  * same bound t15's batch gate checks): every decrement of Δ at ANY
  * stage (in-batch truncate, publish merge, compaction fold) consumes
  * ≥ (cap+1)·Δ of total count mass, so the total under-count of any
  * token is ≤ N/(cap+1) for N = whole-stream token count — i.e. every
  * token with true count > N/(cap+1) SURVIVES in the published
  * sketch regardless of batch boundaries or fold order. The
  * StreamingSpec gates exactly this against exact whole-stream
  * counts.
  *
  * Store growth is batches × cap rows (KB per batch);
  * `maxStoreParts` folds closed partials into one base partial
  * (`batch_id=-1`) on the signature-store cadence. The fold EXCLUDES
  * the current batch's partition so a replay of the in-flight batch
  * still overwrites its own partial (the fold only touches batches
  * the checkpoint has already committed).
  */
object HeavyHitterStream {

  /** MG-truncate a (w, cnt) frame to ≤ cap rows: subtract the
    * (cap+1)-th largest count, drop non-positives. The threshold
    * election reads cap+1 rows driver-side (KB, TakeOrdered). */
  private[streaming] def mgTruncate(counts: DataFrame, cap: Int): DataFrame = {
    val top = counts.orderBy(desc("cnt"), col("w")).limit(cap + 1).collect()
    if (top.length <= cap) counts
    else {
      val dec = top.last.getLong(1)
      counts.select(col("w"), (col("cnt") - lit(dec)).as("cnt"))
        .filter(col("cnt") > 0)
    }
  }

  private def batchCounts(batch: DataFrame): DataFrame =
    batch.select(explode(
      filter(split(trim(col("text")), " "), w => w =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** The current published sketch: bulk MG-merge of all partials. */
  def publishedSketch(spark: SparkSession, storePath: String, cap: Int): DataFrame =
    mgTruncate(spark.read.parquet(storePath)
      .groupBy(col("w")).agg(sum(col("cnt")).as("cnt")), cap)

  /** Fold every partial EXCEPT `keepBatchId`'s into one base partial
    * (`batch_id=-1`) when the partition count exceeds `maxParts`.
    * Same checked tmp/old rename-swap protocol as
    * [[graft.sources.Sinks.compactParquet]]; runs in the single
    * writer's between-batch quiet window. Returns whether it folded.
    */
  def maybeCompactPartials(spark: SparkSession, storePath: String,
      cap: Int, maxParts: Int, keepBatchId: Long): Boolean = {
    import org.apache.hadoop.fs.Path
    require(maxParts >= 1, s"need maxParts >= 1, got $maxParts")
    val dir = new Path(storePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    val parts = fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
    if (parts.length <= maxParts) return false
    val tmp = new Path(storePath + "_fold_tmp")
    val old = new Path(storePath + "_fold_old")
    require(!fs.exists(tmp) && !fs.exists(old),
      s"heavy-hitter fold: stale $tmp or $old exists — inspect/remove first")
    // partition-column type is inferred on read — pin it to LONG
    val all = spark.read.parquet(storePath)
      .select(col("w"), col("cnt"), col("batch_id").cast("long").as("batch_id"))
    val closed = all.filter(col("batch_id") =!= keepBatchId)
      .groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
    val folded = mgTruncate(closed, cap).withColumn("batch_id", lit(-1L))
    val current = all.filter(col("batch_id") === keepBatchId)
    // materialize BEFORE touching the live directory
    folded.unionByName(current)
      .write.partitionBy("batch_id").parquet(tmp.toString)
    require(fs.rename(dir, old), s"fold: rename $storePath -> $old failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir)
      sys.error(s"fold: rename $tmp -> $storePath failed (original restored)")
    }
    fs.delete(old, true)
    true
  }

  /** `docStream` must carry (doc_id, text). Published sketch lands at
    * `outPath` (full overwrite, ≤ cap rows); partials accumulate at
    * `storePath`, folded whenever the partition count passes
    * `maxStoreParts` (None = never).
    */
  /** `publishEvery`: publish on every n-th batch ([[DriftStream]]'s
    * cadence contract — the MG merge truncates against the GLOBAL
    * sketch, so cadence is the right dial). */
  def start(storePath: String, docStream: DataFrame, cap: Int,
      outPath: String, checkpoint: String,
      maxStoreParts: Option[Int] = None,
      publishEvery: Int = 1): StreamingQuery = {
    require(publishEvery >= 1, s"need publishEvery >= 1, got $publishEvery")
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        mgTruncate(batchCounts(batch), cap)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storePath)
        if (batchId % publishEvery == 0)
          publishedSketch(spark, storePath, cap)
            .write.mode("overwrite").parquet(outPath)
        maxStoreParts.foreach { n =>
          maybeCompactPartials(spark, storePath, cap, n, batchId)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
