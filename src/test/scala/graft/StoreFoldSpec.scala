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

  test("pk-store fold merges only touched pk dirs and byte-copies the rest (content equals a full re-merge)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-pkfold")
      .toString + "/store"
    // base (batch_id=-1) holds pks 0,1,2; closed partial batch 0
    // touches ONLY pk=1; batch 1 is in-flight
    Seq((1L, 10L, -1L, 0), (2L, 20L, -1L, 1), (3L, 30L, -1L, 2),
        (2L, 5L, 0L, 1),
        (3L, 7L, 1L, 2))
      .toDF("k", "v", "batch_id", "pk")
      .repartition(col("pk"))
      .write.partitionBy("batch_id", "pk").parquet(path)
    def merge(df: org.apache.spark.sql.DataFrame) = {
      val keys = if (df.columns.contains("pk")) Seq("k", "pk") else Seq("k")
      df.groupBy(keys.map(col): _*).agg(sum(col("v")).cast("long").as("v"))
    }
    def files(sub: String): Set[String] =
      Option(new java.io.File(s"$path/$sub").listFiles())
        .map(_.map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .getOrElse(Set.empty)
    val untouched0 = files("batch_id=-1/pk=0")
    val untouched2 = files("batch_id=-1/pk=2")
    val keepFiles = files("batch_id=1/pk=2")
    assert(untouched0.nonEmpty && untouched2.nonEmpty && keepFiles.nonEmpty)
    assert(StoreFold.foldPartials(spark, path, "t", maxParts = 2,
      keepBatchId = 1L, merge, Seq("batch_id", "pk")))
    // content = full re-merge semantics: base absorbs batch 0's pk=1
    // rows, in-flight batch 1 untouched
    val got = spark.read.parquet(path)
      .select(col("k"), col("v"), col("batch_id").cast("long"), col("pk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === Set((1L, 10L, -1L, 0), (2L, 25L, -1L, 1),
      (3L, 30L, -1L, 2), (3L, 7L, 1L, 2)))
    // untouched base pk dirs and the in-flight partial were COPIED,
    // not rewritten: identical file names (a rewrite mints new uuids)
    assert(files("batch_id=-1/pk=0") === untouched0)
    assert(files("batch_id=-1/pk=2") === untouched2)
    assert(files("batch_id=1/pk=2") === keepFiles)
    // the touched pk dir WAS rewritten
    assert(files("batch_id=-1/pk=1").nonEmpty)
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
