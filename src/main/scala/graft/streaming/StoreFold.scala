package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared store-fold protocol of the streaming twins: merge every
  * CLOSED `batch_id=` partial into the `batch_id=-1` base when the
  * partition count exceeds `maxParts`, leaving the in-flight batch's
  * partial untouched (so its replay still overwrites its own
  * partition). Crash-safe via the checked tmp/old rename swap, run in
  * the single writer's between-batch quiet window.
  *
  * Each twin supplies only its MERGE (counts sum, latest-wins
  * max(struct), HLL register union, bar-field merges, histogram sum)
  * — the merge must be lossless/associative over its partials;
  * everything protocol-critical (stale-dir guard, swap ordering,
  * rollback on a failed second rename) lives HERE once.
  *
  * `merge` receives the closed partials (with their `batch_id`
  * column) and returns the folded frame WITHOUT `batch_id`; the
  * protocol stamps `-1` and column-aligns against the in-flight
  * partial before the partitioned write.
  */
object StoreFold {
  def foldPartials(spark: SparkSession, storePath: String, label: String,
      maxParts: Int, keepBatchId: Long,
      merge: DataFrame => DataFrame): Boolean = {
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
      s"$label fold: stale $tmp or $old exists — inspect/remove first")
    val all = spark.read.parquet(storePath)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val folded = merge(all.filter(col("batch_id") =!= keepBatchId))
      .withColumn("batch_id", lit(-1L))
    val current = all.filter(col("batch_id") === keepBatchId)
    folded.select(current.columns.map(col): _*)
      .unionByName(current)
      .write.partitionBy("batch_id").parquet(tmp.toString)
    require(fs.rename(dir, old), s"$label fold: rename $storePath -> $old failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir)
      sys.error(s"$label fold: rename $tmp -> $storePath failed (original restored)")
    }
    fs.delete(old, true)
    true
  }
}
