package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming drift monitor: [[graft.operators.Quality.psiDrift]]
  * (dq06) re-published every micro-batch over the WHOLE stream so
  * far — the production shape of distribution monitoring, where the
  * PSI table updates as data lands instead of on a nightly batch.
  *
  * State = per-batch (value → cohort counts) partials in `batch_id=`
  * partitions with dynamic overwrite (the [[AnomalyStream]] pattern:
  * a replayed batch replaces its OWN partial, never double-counts).
  * Counts sum is lossless and associative, so the store-fold cadence
  * merges closed partials without changing any published number, and
  * the published table is a PURE function of the store — crash
  * between store write and publish replays identically.
  *
  * Late data is handled by construction: PSI is a whole-history
  * statistic, so a late event simply lands in its batch's partial
  * and the next publish reflects it (bins may shift when a late
  * value extends the global [min, max] — exactly what the batch twin
  * would do, which is the parity contract).
  *
  * SCALE: the store holds distinct-value rows (quantize the value
  * upstream — cents already are — if its cardinality is unbounded),
  * never stream length; per batch one batch-sized partial agg + one
  * store-sized rollup + bins-sized math.
  */
object DriftStream {

  /** Current published PSI table: dq06 over the merged store. */
  def publishedPsi(spark: SparkSession, storePath: String,
      bins: Int): DataFrame =
    graft.operators.Quality.psiFromCounts(
      spark.read.parquet(storePath)
        .groupBy("c").agg(sum("na").as("na"), sum("nb").as("nb")),
      bins)

  /** Counts-sum fold of closed partials (lossless). */
  def maybeCompactPartials(spark: SparkSession, storePath: String,
      maxParts: Int, keepBatchId: Long): Boolean =
    StoreFold.foldPartials(spark, storePath, "drift", maxParts,
      keepBatchId, closed => closed.groupBy("c")
        .agg(sum("na").as("na"), sum("nb").as("nb")))

  /** `stream` must carry `valCol` (integer-quantized value) and
    * `grpCol` (cohort boolean). The PSI table lands at `outPath`
    * (overwrite per publish).
    *
    * `publishEvery`: PSI re-bins GLOBALLY (one late value can move
    * every bin boundary), so there is no key-local incremental
    * publish — the honest dial is cadence: publish on every
    * `publishEvery`-th batch (batchId % publishEvery == 0; default 1
    * = every batch). The store still absorbs every batch losslessly,
    * so an off-cadence published table is exactly the previous
    * publish point's batch-twin output — staleness is bounded by the
    * cadence, correctness never is, and a crash replay of a publish
    * batch republishes identically (the publish is a pure function
    * of the store).
    */
  def start(storePath: String, stream: DataFrame, valCol: String,
      grpCol: String, bins: Int, outPath: String, checkpoint: String,
      maxStoreParts: Option[Int] = None,
      publishEvery: Int = 1): StreamingQuery = {
    require(publishEvery >= 1, s"need publishEvery >= 1, got $publishEvery")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.operators.Quality.valueCohortCounts(batch, valCol, grpCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storePath)
        if (batchId % publishEvery == 0)
          publishedPsi(spark, storePath, bins)
            .write.mode("overwrite").parquet(outPath)
        maxStoreParts.foreach { n =>
          maybeCompactPartials(spark, storePath, n, batchId)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
