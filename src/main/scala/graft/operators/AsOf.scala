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

  /** As-of join with TOLERANCE and DIRECTION (the pandas merge_asof /
    * kdb wj surface): backward matches the latest right row in
    * [leftTime − tolerance, leftTime], forward the earliest in
    * [leftTime, leftTime + tolerance]; outside the window the right
    * values come back null. Same one-shuffle union+window plan as
    * [[asofJoin]] — the matched right TIME rides the carry so the
    * tolerance check is a row-local filter, not a second join.
    * Time columns must be integer epochs (ns here).
    */
  def asofJoinNear(left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightVals: Seq[String],
      toleranceNs: Long, forward: Boolean = false): DataFrame = {
    require(toleranceNs >= 0, "tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
      .select(Seq(col(on), col("_t"), col("_side"),
        lit(null).cast("long").as("_rt")) ++
        leftCols.filterNot(_ == on).map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_t", col(rightTime)).withColumn("_side", lit(0))
      .select(Seq(col(on), col("_t"), col("_side"),
        col(rightTime).cast("long").as("_rt")) ++
        leftCols.filterNot(_ == on).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    // backward: ascending traversal carries the latest right at-or-
    // before. forward: DESCENDING traversal — the most recently seen
    // right row is the smallest right time >= left time. Either way
    // side 0 sorts first at equal time, so ties count as matches.
    val ord =
      if (forward) Seq(col("_t").desc, col("_side").asc)
      else Seq(col("_t").asc, col("_side").asc)
    val w = Window.partitionBy(col(on)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct(_rt, vals*) per right row, not each column
    // independently: a null in one value column must not let that
    // column keep an OLDER row's value while _rt advances — the
    // tolerance gate would then validate a stale value against the
    // matched time. The when(_side=0, …) makes left rows null for the
    // carry (the struct itself is never null on right rows, even with
    // null members), so last(ignoreNulls) always lands a whole row.
    val carried = l.unionByName(r)
      .withColumn("_carry", last(
        when(col("_side") === 0, struct(col("_rt") +: rightVals.map(col): _*)),
        ignoreNulls = true).over(w))
    val within = col("_carry").isNotNull &&
      abs(col("_t") - col("_carry")("_rt")) <= toleranceNs
    val gated = rightVals.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(within, col("_carry")(c)))
    }
    gated.filter(col("_side") === 1).drop("_t", "_side", "_rt", "_carry")
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
      ORDER BY p.event_id""")),

    // ---- tolerance as-of: ao01 but a signup only counts within the
    //      trailing 3 days — the staleness bound every real as-of
    //      enrichment needs (a year-old quote row must NOT price
    //      today's trade). Oracle: correlated max within the window ----
    ("ao02_asof_tolerance", (s: SparkSession, d: String) => {
      val tol = 3L * 24 * 3600 * 1000000000L
      val ev = Tables.events(s, d)
        .withColumn("tns", expr("(ts_ns div 1000) * 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tns"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("tns"))
        .agg(max(col("event_id")).as("signup_event"))
      asofJoinNear(purchases, signups, on = "user_id",
        leftTime = "tns", rightTime = "tns",
        rightVals = Seq("signup_event"), toleranceNs = tol)
        .select(col("event_id"), col("user_id"), col("signup_event"))
        .orderBy("event_id")
    }, Some("""
      WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events
                 WHERE event_type = 'purchase'),
           g AS (SELECT user_id, epoch_ns(ts) AS tns, max(event_id) AS signup_event
                 FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
           m AS (SELECT p.event_id, p.user_id, p.tns,
                   (SELECT max(g.tns) FROM g
                    WHERE g.user_id = p.user_id AND g.tns <= p.tns
                      AND g.tns >= p.tns - 259200000000000) AS mt
                 FROM p)
      SELECT m.event_id, m.user_id, g.signup_event
      FROM m LEFT JOIN g ON g.user_id = m.user_id AND g.tns = m.mt
      ORDER BY m.event_id""")),

    // ---- forward as-of: each signup matched to the user's FIRST
    //      purchase within the next 7 days (time-to-convert — the
    //      funnel metric). Forward = descending window traversal;
    //      same single-shuffle plan ----
    ("ao03_asof_forward", (s: SparkSession, d: String) => {
      val tol = 7L * 24 * 3600 * 1000000000L
      val ev = Tables.events(s, d)
        .withColumn("tns", expr("(ts_ns div 1000) * 1000"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_event"), col("user_id"), col("tns"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("tns"))
        .agg(min(col("event_id")).as("purchase_event"))
      asofJoinNear(signups, purchases, on = "user_id",
        leftTime = "tns", rightTime = "tns",
        rightVals = Seq("purchase_event"), toleranceNs = tol, forward = true)
        .select(col("signup_event"), col("user_id"), col("purchase_event"))
        .orderBy("signup_event")
    }, Some("""
      WITH g AS (SELECT event_id AS signup_event, user_id, epoch_ns(ts) AS tns
                 FROM events WHERE event_type = 'signup'),
           p AS (SELECT user_id, epoch_ns(ts) AS tns, min(event_id) AS purchase_event
                 FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
           m AS (SELECT g.signup_event, g.user_id, g.tns,
                   (SELECT min(p.tns) FROM p
                    WHERE p.user_id = g.user_id AND p.tns >= g.tns
                      AND p.tns <= g.tns + 604800000000000) AS mt
                 FROM g)
      SELECT m.signup_event, m.user_id, p.purchase_event
      FROM m LEFT JOIN p ON p.user_id = m.user_id AND p.tns = m.mt
      ORDER BY m.signup_event"""))
  )
}
