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
  * protocol stamps `-1` and column-aligns before the partitioned
  * write.
  *
  * Secondary-partitioned stores (batch_id × pk, the
  * incremental-publish layout) get an INCREMENTAL fold: only the pk
  * dirs the closed partials touch are re-merged; every untouched
  * base pk dir and the in-flight partial are parallel byte-copied
  * into the swap target, so untouched history never
  * decodes/shuffles/re-encodes. Crash-safety is identical — tmp is
  * still built in full and lands via the same whole-dir rename swap.
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
    if (partitionCols.size > 1) {
      // --- INCREMENTAL fold for secondary-partitioned (batch_id × pk)
      // stores: only the pk dirs the closed non-base partials touch
      // can change the base, so merge JUST those (partition-pruned
      // read, small shuffle, ≤ touched-many dirs written) and
      // BYTE-COPY everything else — untouched base pk dirs and the
      // in-flight partial — into the swap target. No decode/shuffle/
      // encode for untouched data; crash-safety is unchanged because
      // tmp is still built in full and lands via the same whole-dir
      // rename swap (a crash mid-copy discards tmp like any other
      // half-built tmp). Writes task-align with the layout
      // (repartition on the partition cols → ~one file per dir).
      import org.apache.hadoop.fs.FileUtil
      val pkCol = partitionCols(1)
      val conf = spark.sparkContext.hadoopConfiguration
      val keepName = s"batch_id=$keepBatchId"
      val touchedNames: Set[String] = parts.toSeq
        .filter(p => p != keepName && p != "batch_id=-1")
        .flatMap(p => fs.listStatus(new Path(dir, p))
          .filter(_.isDirectory).map(_.getPath.getName)
          .filter(_.startsWith(s"$pkCol=")))
        .toSet
      // dir-name values compare against the CAST partition column, so
      // the prune is type-agnostic (int pk dirs read back as ints)
      val touchedVals = touchedNames.toSeq.map(_.stripPrefix(s"$pkCol="))
      val folded = merge(all.filter(col("batch_id") =!= keepBatchId &&
          col(pkCol).cast("string").isin(touchedVals: _*)))
        .withColumn("batch_id", lit(-1L))
      folded.select(all.columns.map(col): _*)
        .repartition(partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*).parquet(tmp.toString)
      val baseDir = new Path(dir, "batch_id=-1")
      val baseCopies: Seq[(Path, Path)] =
        if (!fs.exists(baseDir)) Seq.empty
        else fs.listStatus(baseDir).filter(_.isDirectory).map(_.getPath)
          .filter(p => p.getName.startsWith(s"$pkCol=") &&
            !touchedNames(p.getName))
          .map(p => p -> new Path(tmp, s"batch_id=-1/${p.getName}")).toSeq
      val keepDir = new Path(dir, keepName)
      val copies: Seq[(Path, Path)] = baseCopies ++
        (if (fs.exists(keepDir)) Seq(keepDir -> new Path(tmp, keepName))
         else Seq.empty)
      // parallel: up to p small dirs to copy — a serial driver loop at
      // ~15 ms/file (local-FS checksum round-trips) would cost more
      // than the rewrite it replaces. Hadoop FileSystem is thread-safe;
      // parallelStream propagates the first failure as an exception,
      // which discards tmp like any other half-built fold.
      import scala.jdk.CollectionConverters._
      copies.asJava.parallelStream().forEach { t =>
        require(FileUtil.copy(fs, t._1, fs, t._2, false, conf),
          s"$label fold: copy ${t._1} -> ${t._2} failed")
      }
    } else {
      // --- classic whole-store rewrite for batch_id-only stores
      val folded = merge(all.filter(col("batch_id") =!= keepBatchId))
        .withColumn("batch_id", lit(-1L))
      val current = all.filter(col("batch_id") === keepBatchId)
      folded.select(current.columns.map(col): _*)
        .unionByName(current)
        .write.partitionBy(partitionCols: _*).parquet(tmp.toString)
    }
    require(fs.rename(dir, old), s"$label fold: rename $storePath -> $old failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir)
      sys.error(s"$label fold: rename $tmp -> $storePath failed (original restored)")
    }
    fs.delete(old, true)
    true
  }
}
