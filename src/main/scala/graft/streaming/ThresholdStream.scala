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
  */
object ThresholdStream {

  private def batchCounts(batch: DataFrame, group: String,
      score: String): DataFrame =
    batch.groupBy(col(group), col(score)).agg(count(lit(1)).as("n"))

  /** Current published thresholds: one (group, thr) row per group
    * from the merged store histogram. */
  def publishedThresholds(spark: SparkSession, storePath: String,
      group: String, score: String, p: Double): DataFrame =
    graft.operators.TextOps.percentileThresholds(
      spark.read.parquet(storePath)
        .groupBy(col(group), col(score)).agg(sum(col("n")).as("n")),
      group, score, p)

  /** Histogram-sum fold on the shared [[StoreFold]] protocol. */
  def maybeCompactPartials(spark: SparkSession, storePath: String,
      group: String, score: String, maxParts: Int,
      keepBatchId: Long): Boolean =
    StoreFold.foldPartials(spark, storePath, "threshold", maxParts,
      keepBatchId, closed => closed
        .groupBy(col(group), col(score)).agg(sum(col("n")).as("n")))

  /** `scoredStream` must carry `group` and integer `score` columns.
    * Thresholds land at `outPath` (full overwrite — group-count
    * rows); count partials accumulate at `storePath`, folded past
    * `maxStoreParts`. */
  def start(storePath: String, scoredStream: DataFrame, group: String,
      score: String, p: Double, outPath: String, checkpoint: String,
      maxStoreParts: Option[Int] = None): StreamingQuery =
    scoredStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batchCounts(batch, group, score)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storePath)
        publishedThresholds(spark, storePath, group, score, p)
          .write.mode("overwrite").parquet(outPath)
        maxStoreParts.foreach { n =>
          maybeCompactPartials(spark, storePath, group, score, n, batchId)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
