package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming EWMA — ts08 kept continuously: the per-key
  * exponentially-weighted trend re-published every micro-batch as
  * events land.
  *
  * State = per-(key, bucket, batch) bucket-total PARTIALS (decimal
  * sums — associative/commutative, so merge order never matters) in
  * `batch_id=` partitions on the shared [[StoreFold]] layout. The
  * published table re-merges the partials to exact per-bucket cents
  * and re-runs [[graft.operators.Timeseries.ewmaFromCents]]'s
  * integer fold END TO END: a late event that lands in an EARLIER
  * bucket legitimately shifts every later bucket's ewma, and the
  * fold input is bucket-sized (keys × grid, never event volume), so
  * recomputing the whole fold is both the only SAFE answer and a
  * cheap one. Published output is therefore always identical to
  * batch ts08 over every event seen so far (StreamingSpec gates
  * this, late-event case included).
  *
  * SCALE: per batch, one batch-sized partial agg + a store-sized
  * re-merge + a bucket-sized fold; events never cross a batch
  * boundary twice — only (key, bucket, total) partials do.
  */
object EwmaStream {

  private def partials(df: DataFrame, keyCol: String, bucketNs: Long)
      : DataFrame =
    df.select(col(keyCol).cast("string").as("k"),
        expr(s"ts_ns div ${bucketNs}L").as("bucket"),
        col("value").cast("decimal(18,2)").as("vd"))
      .groupBy(col("k"), col("bucket"))
      .agg(sum(col("vd")).cast("decimal(38,2)").as("total"))

  private def merge(parts: DataFrame): DataFrame =
    parts.groupBy(col("k"), col("bucket"))
      .agg(sum(col("total")).cast("decimal(38,2)").as("total"))

  /** Current published trend, ts08's output shape. */
  def publishedEwma(spark: SparkSession, storePath: String,
      keyCol: String, alphaDen: Long): DataFrame =
    graft.operators.Timeseries.ewmaFromCents(
      merge(spark.read.parquet(storePath))
        .select(col("k"), col("bucket"),
          (col("total") * 100).cast("long").as("cents")),
      alphaDen, keyCol)

  /** Bucket-total merge on the shared [[StoreFold]] protocol. */
  def maybeCompactPartials(spark: SparkSession, storePath: String,
      maxParts: Int, keepBatchId: Long): Boolean =
    StoreFold.foldPartials(spark, storePath, "ewma", maxParts,
      keepBatchId, merge)

  /** `eventStream` must carry (`keyCol`, ts_ns, value). */
  def start(storePath: String, eventStream: DataFrame, keyCol: String,
      bucketNs: Long, alphaDen: Long, outPath: String, checkpoint: String,
      maxStoreParts: Option[Int] = None): StreamingQuery =
    eventStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        partials(batch, keyCol, bucketNs)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storePath)
        publishedEwma(spark, storePath, keyCol, alphaDen)
          .write.mode("overwrite").parquet(outPath)
        maxStoreParts.foreach { n =>
          maybeCompactPartials(spark, storePath, n, batchId)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
