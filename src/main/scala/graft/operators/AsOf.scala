package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (most-recent-at-or-before) join — an operator Spark lacks
  * natively. Implemented by the union+window technique: tag both
  * inputs, sort each partition key's rows by (time, side) and carry
  * the latest right-side values forward with last(_, ignoreNulls).
  *
  * Scale: ONE shuffle of (left ∪ right) on the partition key — no
  * range self-join blowup, no per-key driver loop; window state is a
  * single carried row per key. This beats the naive
  * left-join-then-filter-max formulation (which shuffles twice and
  * materializes every candidate pair).
  */
object AsOf {
  type QFn = (SparkSession, String) => DataFrame

  /** For each left row: columns of the latest right row (per `on`)
    * with right time <= left time. Right value columns come back
    * null when no such row exists (left-outer semantics).
    *
    * @param rightVals right columns to carry (must not clash with left)
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
      .select(Seq(col(on), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == on).map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_t", col(rightTime)).withColumn("_side", lit(0))
      .select(Seq(col(on), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == on).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    // right (side 0) sorts before left (side 1) at equal time → ties
    // count as matches (>= semantics, like SQL ASOF JOIN)
    val w = Window.partitionBy(col(on)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_t", "_side")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // each purchase matched to the user's latest signup at-or-before it
    ("ao01_asof_join", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        // µs-floored for oracle parity (DuckDB reads parquet NANOS as µs)
        .withColumn("tns", expr("(ts_ns div 1000) * 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tns"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("tns"))
        .agg(max(col("event_id")).as("signup_event"))
      asofJoin(purchases, signups, on = "user_id",
        leftTime = "tns", rightTime = "tns", rightVals = Seq("signup_event"))
        .select(col("event_id"), col("user_id"), col("signup_event"))
        .orderBy("event_id")
    }, Some("""
      WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events
                 WHERE event_type = 'purchase'),
           g AS (SELECT user_id, epoch_ns(ts) AS tns, max(event_id) AS signup_event
                 FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, g.signup_event
      FROM p ASOF LEFT JOIN g ON p.user_id = g.user_id AND p.tns >= g.tns
      ORDER BY p.event_id"""))
  )
}
