package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StoreFold

/** Crash-recovery contract of the shared store-fold protocol: a fold
  * interrupted at ANY point (between the two renames, after the swap
  * but before cleanup, or mid-write of the tmp output) must
  * auto-recover on the next call with the store's known-good content
  * intact — no manual repair step.
  */
class StoreFoldSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def freshStore(): String = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-fold").toString + "/store"
    Seq((1L, 10L, 0L), (1L, 5L, 1L), (2L, 20L, 2L))
      .toDF("k", "v", "batch_id")
      .write.partitionBy("batch_id").parquet(path)
    path
  }

  private def merge(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(sum(col("v")).cast("long").as("v"))

  private def totals(path: String): Map[Long, Long] =
    spark.read.parquet(path).groupBy(col("k"))
      .agg(sum(col("v")).cast("long").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fs(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("fold folds closed partials and keeps the in-flight batch") {
    val path = freshStore()
    assert(StoreFold.foldPartials(spark, path, "t", maxParts = 2,
      keepBatchId = 2L, merge))
    // partition-column inference may surface batch_id as INT
    val parts = spark.read.parquet(path)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(parts === Set(-1L, 2L))
    assert(totals(path) === Map(1L -> 15L, 2L -> 20L))
  }

  test("crash between the two renames auto-recovers (dir restored from _fold_old)") {
    val path = freshStore()
    val before = totals(path)
    val (f, dir) = fs(path)
    val old = new org.apache.hadoop.fs.Path(path + "_fold_old")
    val tmp = new org.apache.hadoop.fs.Path(path + "_fold_tmp")
    // simulate: tmp fully written, dir renamed to old, second rename lost
    assert(f.rename(dir, old))
    f.mkdirs(tmp)
    // next call heals and (parts > maxParts) immediately re-folds
    assert(StoreFold.foldPartials(spark, path, "t", maxParts = 2,
      keepBatchId = 2L, merge))
    assert(f.exists(dir) && !f.exists(old) && !f.exists(tmp))
    assert(totals(path) === before)
  }

  test("crash after the swap but before cleanup drops the stale _fold_old") {
    val path = freshStore()
    val (f, dir) = fs(path)
    val old = new org.apache.hadoop.fs.Path(path + "_fold_old")
    f.mkdirs(old) // stale pre-fold copy left behind
    // parts == maxParts: heals the leftovers, then no fold needed
    assert(!StoreFold.foldPartials(spark, path, "t", maxParts = 3,
      keepBatchId = 2L, merge))
    assert(f.exists(dir) && !f.exists(old))
    assert(totals(path) === Map(1L -> 15L, 2L -> 20L))
  }

  test("half-written _fold_tmp is discarded, store untouched") {
    val path = freshStore()
    val (f, dir) = fs(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "_fold_tmp")
    f.mkdirs(tmp)
    assert(!StoreFold.foldPartials(spark, path, "t", maxParts = 3,
      keepBatchId = 2L, merge))
    assert(f.exists(dir) && !f.exists(tmp))
    assert(totals(path) === Map(1L -> 15L, 2L -> 20L))
  }
}
