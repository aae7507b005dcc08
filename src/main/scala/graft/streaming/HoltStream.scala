package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Holt double-exponential smoothing — ts15 kept
  * continuously: the per-key level + linear-trend forecaster
  * re-published every micro-batch as events land (the metrics shape
  * where [[EwmaStream]]'s single EWMA lags every ramp).
  *
  * State = per-(key, bucket, batch) bucket-total PARTIALS (decimal
  * sums — associative/commutative) on the shared [[StoreFold]]
  * layout, exactly [[EwmaStream]]'s store; the published table
  * re-merges them to exact cents and re-runs
  * [[graft.operators.Timeseries.holtFromCents]]'s two-register
  * integer fold END TO END, so a late event that re-opens an early
  * bucket legitimately shifts every later level/trend and published
  * output always equals batch ts15 over every event seen so far
  * (StreamingSpec gates this, late-event case included).
  *
  * The fold is KEY-LOCAL (two registers per key, never reading
  * another key's buckets), so both publish dials apply verbatim
  * through [[StoreFold.publishBatch]]: `publishEvery` cadence, or
  * `incrementalPubParts` touched-pk publish (mutually exclusive,
  * require-enforced).
  *
  * SCALE: [[EwmaStream]]'s exact budget — per batch one batch-sized
  * partial agg + a touched-pk-sized (incremental) or store-sized
  * (full) re-merge + a bucket-sized fold with 2 longs of state per
  * key; events never cross a batch boundary twice, only (key,
  * bucket, total) partials do.
  */
object HoltStream {

  private def partials(df: DataFrame, keyCol: String, bucketNs: Long)
      : DataFrame =
    df.select(col(keyCol).cast("string").as("k"),
        expr(s"ts_ns div ${bucketNs}L").as("bucket"),
        col("value").cast("decimal(18,2)").as("vd"))
      .groupBy(col("k"), col("bucket"))
      .agg(sum(col("vd")).cast("decimal(38,2)").as("total"))

  /** Lossless bucket-total merge; keeps the `pk` partition column
    * when the store carries one (functionally dependent on k). */
  private def merge(parts: DataFrame): DataFrame = {
    val keys =
      if (parts.columns.contains("pk")) Seq("k", "bucket", "pk")
      else Seq("k", "bucket")
    parts.groupBy(keys.map(col): _*)
      .agg(sum(col("total")).cast("decimal(38,2)").as("total"))
  }

  private def foldFromStore(store: DataFrame, keyCol: String,
      alphaDen: Long, betaDen: Long): DataFrame =
    graft.operators.Timeseries.holtFromCents(
      merge(store)
        .select(col("k"), col("bucket"),
          (col("total") * 100).cast("long").as("cents")),
      alphaDen, betaDen, keyCol)

  /** Current published forecast, ts15's output shape (full-publish
    * recompute over the whole store). */
  def publishedHolt(spark: SparkSession, storePath: String,
      keyCol: String, alphaDen: Long, betaDen: Long): DataFrame =
    foldFromStore(spark.read.parquet(storePath), keyCol, alphaDen, betaDen)

  /** Read the published table regardless of publish mode (drops the
    * `pk` partition column incremental mode adds). */
  def readPublished(spark: SparkSession, outPath: String): DataFrame =
    StoreFold.readPublished(spark, outPath)

  /** Bucket-total merge on the shared [[StoreFold]] protocol. */
  def maybeCompactPartials(spark: SparkSession, storePath: String,
      maxParts: Int, keepBatchId: Long,
      partitionCols: Seq[String] = Seq("batch_id")): Boolean =
    StoreFold.foldPartials(spark, storePath, "holt", maxParts,
      keepBatchId, merge, partitionCols)

  /** `eventStream` must carry (`keyCol`, ts_ns, value). Dials and
    * per-batch body are [[StoreFold.publishBatch]]'s — the publish-
    * side pk hash rides keyCol (the fold output's keyCol IS the
    * store's string k, [[EwmaStream]]'s contract). */
  def start(storePath: String, eventStream: DataFrame, keyCol: String,
      bucketNs: Long, alphaDen: Long, betaDen: Long, outPath: String,
      checkpoint: String,
      maxStoreParts: Option[Int] = None,
      incrementalPubParts: Option[Int] = None,
      publishEvery: Int = 1): StreamingQuery = {
    StoreFold.requireDials(incrementalPubParts, publishEvery)
    eventStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StoreFold.publishBatch(batch.sparkSession, "holt",
          storePath, outPath, batchId,
          partials(batch, keyCol, bucketNs),
          storeKeyCol = "k", pubKeyCol = keyCol,
          publish = st => foldFromStore(st, keyCol, alphaDen, betaDen),
          merge = merge,
          maxStoreParts, incrementalPubParts, publishEvery)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
