package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Warehouse dimension maintenance: SCD Type-2 history build from a
  * change log, and point-in-time snapshot reconstruction over that
  * history — the two halves of "what did this dimension look like
  * when the model was trained?", which a reproducible training
  * pipeline needs as much as any BI stack.
  *
  * Reference anchor: keenwa's MERGE/upsert surface (q63) covers the
  * current-state table; SCD2 is the temporal companion the reference
  * models via plain relational operators (logical/mod.rs) — windows +
  * filters here, no bespoke runtime.
  *
  * SCALE: ONE (key) exchange total. The change-detection lag window,
  * the post-filter version numbering, and the interval close (lead)
  * all share the same (key) partitioning and (ts, tie) sort order, so
  * Catalyst plans one shuffle + one sort and streams the three window
  * functions over it; the filter between them preserves both
  * properties. Snapshot reconstruction is a map-only filter over the
  * history — no join, no shuffle.
  */
object Warehouse {
  type QFn = (SparkSession, String) => DataFrame

  /** SCD2 history from a change log: one row per (key, run of equal
    * `attrCol` values in (tsCol, tieCol) order) with
    * `eff_from`/`eff_to` interval bounds (eff_to null = current) and
    * a per-key `version` ordinal. `tieCol` must make the per-key
    * order total — determinism rides on it. `attrCol` is assumed
    * non-null (a null attr would merge into the preceding run).
    */
  def scd2History(changes: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol),
        lag(col(attrCol), 1).over(w).as("_prev"))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("eff_from"),
        lead(col(tsCol), 1).over(w).as("eff_to"),
        row_number().over(w).cast("bigint").as("version"))
  }

  /** The dimension as of instant `at`: map-only interval filter over
    * [[scd2History]] output (eff_from ≤ at < eff_to, open current
    * rows included). */
  def snapshotAt(history: DataFrame, at: java.sql.Timestamp): DataFrame =
    history.filter(col("eff_from") <= lit(at) &&
      (col("eff_to").isNull || col("eff_to") > lit(at)))

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"
  private def ordersHistory(s: SparkSession, d: String): DataFrame =
    scd2History(Tables.orders(s, d), "o_custkey", "o_orderstatus",
      "o_orderdate", "o_orderkey")

  private val historySql = """
      l AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
              lag(o_orderstatus) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS prev
            FROM orders),
      ch AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
             FROM l WHERE prev IS NULL OR prev <> o_orderstatus),
      v AS (SELECT o_custkey, o_orderstatus, o_orderdate AS eff_from,
              lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS eff_to,
              CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
            FROM ch)"""

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // ---- SCD2 history of each customer's order-status attribute ----
    ("wh01_scd2_history", (s: SparkSession, d: String) => {
      ordersHistory(s, d)
        .select(col("o_custkey"), col("o_orderstatus"),
          date_format(col("eff_from"), TsFmt).as("eff_from"),
          date_format(col("eff_to"), TsFmt).as("eff_to"), col("version"),
          when(col("eff_to").isNull, 1L).otherwise(0L).as("is_current"))
        .orderBy("o_custkey", "version")
    }, Some(s"""
      WITH $historySql
      SELECT o_custkey, o_orderstatus,
        strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS eff_from,
        strftime(eff_to, '%Y-%m-%d %H:%M:%S') AS eff_to, version,
        CAST(CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
          AS is_current
      FROM v ORDER BY o_custkey, version""")),

    // ---- point-in-time snapshot: every customer's status as of
    //      1998-06-15 — map-only filter over the history ----
    ("wh02_scd2_snapshot", (s: SparkSession, d: String) => {
      snapshotAt(ordersHistory(s, d),
        java.sql.Timestamp.valueOf("1998-06-15 00:00:00"))
        .select(col("o_custkey"), col("o_orderstatus"),
          date_format(col("eff_from"), TsFmt).as("eff_from"), col("version"))
        .orderBy("o_custkey")
    }, Some(s"""
      WITH $historySql
      SELECT o_custkey, o_orderstatus,
        strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS eff_from, version
      FROM v
      WHERE eff_from <= TIMESTAMP '1998-06-15 00:00:00'
        AND (eff_to IS NULL OR eff_to > TIMESTAMP '1998-06-15 00:00:00')
      ORDER BY o_custkey"""))
  )
}
