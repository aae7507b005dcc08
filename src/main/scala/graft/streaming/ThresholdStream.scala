package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming per-group percentile thresholds — t20's CCNet-style
  * adaptive quality gate kept continuously: "each language's bottom-p
  * score cutoff, over everything seen so far", re-published every
  * micro-batch so a downstream filter always gates against the
  * freshest distribution.
  *
  * State = per-(group, score) count partials in `batch_id=`
  * partitions with dynamic overwrite (the [[AnomalyStream]] layout —
  * counts merge LOSSLESSLY, a replayed batch replaces its own
  * partial). The published threshold table is
  * [[graft.operators.TextOps.percentileThresholds]] over the
  * store's merged histogram — a pure function of the store, so
  * replay converges and the published cutoffs are EXACTLY the batch
  * operator's over every row seen so far (StreamingSpec gates this),
  * with none of the sketch error a t-digest stream would carry.
  * State is bounded by groups × distinct scores — the same
  * "histogram ≪ corpus" premise as batch t20; a continuous score
  * belongs in [[graft.operators.TextOps.percentileGateApprox]]'s
  * sketch instead.
  *
  * PUBLISH MODES ([[EwmaStream]]'s pattern — the election is
  * group-local, a batch can only move the cutoffs of groups it
  * touches): full (default) re-elects every group per batch;
  * incremental (`incrementalPubParts = Some(n)`) partitions store
  * and published table by `pk = pmod(hash(group), n)` and re-elects
  * only the touched pk partitions via dynamic overwrite — per-batch
  * publish cost ∝ touched groups' histograms, flat however many
  * groups have accumulated. Read through [[readPublished]]; content
  * is publish-mode-independent.
  */
object ThresholdStream {

  private def batchCounts(batch: DataFrame, group: String,
      score: String): DataFrame =
    batch.groupBy(col(group), col(score)).agg(count(lit(1)).as("n"))

  /** Lossless histogram merge; keeps `pk` when the store carries one
    * (functionally dependent on `group`, so grouping by it never
    * splits a group's histogram). */
  private def mergeCounts(parts: DataFrame, group: String,
      score: String): DataFrame = {
    val keys =
      if (parts.columns.contains("pk")) Seq(group, score, "pk")
      else Seq(group, score)
    parts.groupBy(keys.map(col): _*).agg(sum(col("n")).as("n"))
  }

  /** Current published thresholds: one (group, thr) row per group
    * from the merged store histogram (full-publish recompute). */
  def publishedThresholds(spark: SparkSession, storePath: String,
      group: String, score: String, p: Double): DataFrame =
    graft.operators.TextOps.percentileThresholds(
      mergeCounts(spark.read.parquet(storePath), group, score)
        .select(col(group), col(score), col("n")),
      group, score, p)

  /** Read the published table regardless of publish mode (drops the
    * `pk` partition column incremental mode adds). */
  def readPublished(spark: SparkSession, outPath: String): DataFrame =
    StoreFold.readPublished(spark, outPath)

  /** Histogram-sum fold on the shared [[StoreFold]] protocol. */
  def maybeCompactPartials(spark: SparkSession, storePath: String,
      group: String, score: String, maxParts: Int,
      keepBatchId: Long,
      partitionCols: Seq[String] = Seq("batch_id")): Boolean =
    StoreFold.foldPartials(spark, storePath, "threshold", maxParts,
      keepBatchId, closed => mergeCounts(closed, group, score),
      partitionCols)

  /** `scoredStream` must carry `group` and integer `score` columns.
    * Thresholds land at `outPath` (group-count rows; full overwrite,
    * or touched-pk dynamic overwrite in incremental mode); count
    * partials accumulate at `storePath`, folded past
    * `maxStoreParts`. */
  def start(storePath: String, scoredStream: DataFrame, group: String,
      score: String, p: Double, outPath: String, checkpoint: String,
      maxStoreParts: Option[Int] = None,
      incrementalPubParts: Option[Int] = None,
      publishEvery: Int = 1): StreamingQuery = {
    StoreFold.requireDials(incrementalPubParts, publishEvery)
    scoredStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // per-batch store/publish/fold body shared with the other
        // key-local twins — [[StoreFold.publishBatch]]
        StoreFold.publishBatch(batch.sparkSession, "threshold",
          storePath, outPath, batchId,
          batchCounts(batch, group, score),
          storeKeyCol = group, pubKeyCol = group,
          publish = st => graft.operators.TextOps.percentileThresholds(
            mergeCounts(st, group, score)
              .select(col(group), col(score), col("n")),
            group, score, p),
          merge = closed => mergeCounts(closed, group, score),
          maxStoreParts, incrementalPubParts, publishEvery)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
