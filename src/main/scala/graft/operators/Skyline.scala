package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skyline (Pareto-optimal) query — minimize `minCol`, maximize
  * `maxCol` (pattern from "Integration of Skyline Queries into Spark
  * SQL", EDBT 2023). Two-phase: each partition computes its local
  * skyline with an in-memory dominance scan (local skylines are tiny),
  * then the union of locals — orders of magnitude smaller than the
  * input — is reduced to the global skyline in one task. No all-pairs
  * self-join, no O(n²) shuffle; the naive NOT EXISTS formulation is
  * kept as the oracle.
  */
object Skyline {
  type QFn = (SparkSession, String) => DataFrame

  /** rows of (id, minimize, maximize) → skyline rows.
    *
    * The single-task global phase only runs once the candidate union
    * fits under `maxGlobalRows`: while it doesn't, another local
    * round at reduced parallelism folds candidates further (on
    * correlated data each fold shrinks geometrically). If a fold
    * stops shrinking — anti-correlated data, where the skyline itself
    * is O(n) and ANY algorithm must materialize it somewhere — this
    * throws instead of silently funneling the input through one task.
    * The per-round count() is a deliberate guard cost: candidate
    * counts, not data rows.
    */
  def skyline2(df: DataFrame, idCol: String, minCol: String, maxCol: String,
      maxGlobalRows: Long = 1L << 20): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(col(idCol).cast("bigint"), col(minCol).cast("double"),
      col(maxCol).cast("double")).as[(Long, Double, Double)]

    def localSkyline(it: Iterator[(Long, Double, Double)]): Iterator[(Long, Double, Double)] = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
      it.foreach { p =>
        // p dominated by any kept point? (kept.min <= p.min && kept.max >= p.max, one strict)
        val dominated = kept.exists(q =>
          q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
        if (!dominated) {
          kept.filterInPlace(q =>
            !(p._2 <= q._2 && p._3 >= q._3 && (p._2 < q._2 || p._3 > q._3)))
          kept += p
        }
      }
      kept.iterator
    }

    // phase 1: per-partition skylines (lineage cut so each guard
    // count() and the next fold reuse the materialized candidates)
    var cur = ds.mapPartitions(localSkyline).localCheckpoint(true)
    var parts = cur.rdd.getNumPartitions
    var n = cur.count()
    var prev = Long.MaxValue
    while (n > maxGlobalRows) {
      // even an input arriving with <=2 partitions gets folds at
      // parts=2 (repartition co-mingles points, so correlated data
      // keeps collapsing); only NON-SHRINKAGE — anti-correlated data
      // whose skyline is O(n) — aborts
      if (n >= prev)
        throw new IllegalStateException(
          s"skyline2: candidate union has $n rows (> $maxGlobalRows) and is no longer " +
            "shrinking — near-linear skyline (anti-correlated data); raise maxGlobalRows " +
            "or reduce the objective space before the global phase")
      prev = n
      parts = math.max(2, parts / 8)
      cur = cur.repartition(parts).mapPartitions(localSkyline).localCheckpoint(true)
      n = cur.count()
    }
    cur.repartition(1) // phase 2: candidates verified tiny — one final scan
      .mapPartitions(localSkyline)
      .toDF(idCol, minCol, maxCol)
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // parts Pareto-optimal on (low retail price, large size)
    ("sk01_skyline", (s: SparkSession, d: String) => {
      skyline2(Tables.part(s, d), "p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size
      FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      ORDER BY p_partkey"""))
  )
}
