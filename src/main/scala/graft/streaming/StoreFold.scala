package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared store-fold protocol of the streaming twins: merge every
  * CLOSED `batch_id=` partial into the `batch_id=-1` base when the
  * partition count exceeds `maxParts`, leaving the in-flight batch's
  * partial untouched (so its replay still overwrites its own
  * partition). Crash-safe via the checked tmp/old rename swap, run in
  * the single writer's between-batch quiet window; a fold interrupted
  * at ANY point auto-recovers on the next call (the entry block
  * restores the known-good store from `_fold_old` / discards a
  * never-swapped `_fold_tmp`), so no crash state needs manual repair.
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
  /** Read a published table regardless of publish mode: incremental
    * publish adds a `pk` key-hash partition column (rewrite
    * granularity, not content) — drop it so readers see the same
    * shape either way. Shared by every twin with the
    * `incrementalPubParts` dial. */
  def readPublished(spark: SparkSession, outPath: String): DataFrame = {
    val df = spark.read.parquet(outPath)
    if (df.columns.contains("pk")) df.drop("pk") else df
  }

  /** `partitionCols` must start with `batch_id`; twins whose store
    * carries a secondary partition column (the incremental-publish
    * `pk` key-hash bucket) pass it here so the folded rewrite keeps
    * the layout the publish-side partition pruning depends on. */
  def foldPartials(spark: SparkSession, storePath: String, label: String,
      maxParts: Int, keepBatchId: Long,
      merge: DataFrame => DataFrame,
      partitionCols: Seq[String] = Seq("batch_id")): Boolean = {
    import org.apache.hadoop.fs.Path
    require(maxParts >= 1, s"need maxParts >= 1, got $maxParts")
    require(partitionCols.headOption.contains("batch_id"),
      s"$label fold: partitionCols must lead with batch_id, got $partitionCols")
    val dir = new Path(storePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(storePath + "_fold_tmp")
    val old = new Path(storePath + "_fold_old")
    // Crash auto-recovery, in dependency order. A fold that died
    // leaves one of three states, each with an unambiguous known-good
    // restore (so the next micro-batch heals the store instead of
    // refusing to run):
    //  - dir MISSING + old present: died between the two renames —
    //    old IS the pre-fold store; rename it back.
    //  - dir present + old present: died after the second rename but
    //    before cleanup — the fold landed; old is a stale copy.
    //  - tmp present (old gone after the steps above): tmp was never
    //    swapped in, possibly half-written — discard; the fold reruns.
    if (!fs.exists(dir) && fs.exists(old))
      require(fs.rename(old, dir),
        s"$label fold: recovery rename $old -> $storePath failed")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (!fs.exists(dir)) return false
    val parts = fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
    if (parts.length <= maxParts) return false
    val all = spark.read.parquet(storePath)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val folded = merge(all.filter(col("batch_id") =!= keepBatchId))
      .withColumn("batch_id", lit(-1L))
    val current = all.filter(col("batch_id") === keepBatchId)
    val rewrite = folded.select(current.columns.map(col): _*)
      .unionByName(current)
    // secondary-partitioned stores (batch_id × pk) would otherwise
    // land up to one file per (shuffle task × pk dir) — thousands of
    // tiny files whose LISTING cost then grows every later publish/
    // fold pass. Task-align with the layout (equal partition values
    // colocate under hash repartition) → ~one file per directory.
    val aligned =
      if (partitionCols.size > 1) rewrite.repartition(partitionCols.map(col): _*)
      else rewrite
    aligned.write.partitionBy(partitionCols: _*).parquet(tmp.toString)
    require(fs.rename(dir, old), s"$label fold: rename $storePath -> $old failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir)
      sys.error(s"$label fold: rename $tmp -> $storePath failed (original restored)")
    }
    fs.delete(old, true)
    true
  }
}
