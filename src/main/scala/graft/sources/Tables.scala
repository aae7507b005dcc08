package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders — graft's catalog surface (reference:
  * /root/reference/src/catalog/mod.rs:1). Scans are plain
  * `spark.read.parquet` so Catalyst's datasource V2 path gives filter
  * pushdown + column pruning for free; at 100 TB the same call reads a
  * partitioned directory tree and prunes partitions from the predicate.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts contract: downstream always sees `ts` (TIMESTAMP, µs,
    * UTC instant) plus `ts_ns` (epoch-nanos BIGINT). The on-disk type
    * has shipped in two generations, so the loader adapts on schema:
    *   - TIMESTAMP(NANOS) — read as a nanos long (nanosAsLong conf);
    *     `ts div 1000` is integer division because ns values (~1.7e18)
    *     exceed double precision.
    *   - TIMESTAMP(MICROS) — read as a timestamp (NTZ under the
    *     default inferTimestampNTZ); cast to an instant under the UTC
    *     session zone and derive ts_ns = unix_micros * 1000 (no
    *     overflow: |µs| < 2^53 for any realistic date, ×1000 < 2^63).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts_ns",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
