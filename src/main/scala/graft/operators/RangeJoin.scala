package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Point-in-interval join without a nested-loop: intervals are
  * exploded onto fixed-width buckets, points map to one bucket, the
  * join becomes an equi-join on (key, bucket) with an exact refine
  * filter. Spark plans a raw inequality join as
  * BroadcastNestedLoopJoin (O(n·m) — unusable at scale); this
  * composition is O(n + m·buckets_per_interval) shuffle rows.
  * (Preference order honored: composition of built-ins, no custom
  * physical operator needed.)
  */
object RangeJoin {
  type QFn = (SparkSession, String) => DataFrame

  /** Join `points` (pt = time column) to `intervals` [startCol, endCol]
    * sharing equi-key `on`. bucketWidth must be >= typical interval
    * length for few buckets per interval.
    */
  def pointIntervalJoin(points: DataFrame, intervals: DataFrame, on: String,
      pt: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    val ivals = intervals.withColumn("_b",
      explode(sequence(col(startCol) div bucketWidth, col(endCol) div bucketWidth)))
    val pts = points.withColumn("_b", col(pt) div bucketWidth)
    pts.join(ivals, Seq(on, "_b"))
      .filter(col(pt) >= col(startCol) && col(pt) <= col(endCol))
      .drop("_b")
  }

  private implicit class DivCol(c: Column) {
    def div(w: Long): Column = expr(s"(${c.toString}) div $w")
  }

  /** Interval×interval overlap join on a shared grid: both sides
    * explode onto fixed-width buckets, candidates come from the
    * bucket equi-join, the exact overlap predicate refines, and
    * `distinct` collapses pairs that met in several buckets. Same
    * scale rationale as [[pointIntervalJoin]]: Spark plans the raw
    * inequality pair as a nested-loop product; this is
    * O((n+m)·buckets_per_interval) shuffle rows on a key Catalyst
    * hash-partitions like any equi-join.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      sa: String, ea: String, sb: String, eb: String, bucketWidth: Long): DataFrame = {
    val ab = a.withColumn("_b", explode(sequence(col(sa) div bucketWidth, col(ea) div bucketWidth)))
    val bb = b.withColumn("_b", explode(sequence(col(sb) div bucketWidth, col(eb) div bucketWidth)))
    ab.join(bb, "_b")
      .filter(col(sa) <= col(eb) && col(sb) <= col(ea))
      .drop("_b").distinct()
  }

  /** (user_id, sid, s_start, s_end) session intervals in µs — the
    * rj01/rj02 front half (same gap rule as ss01, µs-floored for
    * oracle parity across both events-table timestamp generations).
    * One (user) shuffle feeding both interval-join shapes. */
  private def userSessions(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    ev
      .select(col("user_id"), col("event_id"), col("tus"),
        lag(col("tus"), 1).over(w).as("prev"))
      .select(col("user_id"), col("event_id"), col("tus"),
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1L)
          .otherwise(0L).as("is_new"))
      .select(col("user_id"), col("tus"), sum(col("is_new")).over(wRun).as("sid"))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("tus")).as("s_start"), max(col("tus")).as("s_end"))
  }

  /** Peak concurrency over an interval set — "how many sessions were
    * open at once, and when" (capacity planning / occupancy). Classic
    * sweep-line: +1 at each start, −1 just past each closed end,
    * running sum, max. The −1 sorts BEFORE the +1 at an equal
    * timestamp (delta asc), so intermediate sums within an instant
    * never overshoot and the max is attained exactly at each
    * instant's last +1 — making max and its earliest timestamp
    * order-independent.
    *
    * SCALE: a single global ordered window would serialize; instead
    * the t23 two-phase shape on UTC days — per-day net deltas
    * (days-sized), exclusive day-offset prefix (window over the
    * days-sized frame), then day-partitioned in-day windows + offset
    * = the exact global running sum with day-level parallelism.
    */
  def maxConcurrency(intervals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = intervals.select(col("s_start").as("ts"), lit(1L).as("delta"),
        col("user_id"), col("sid"))
      .unionAll(intervals.select((col("s_end") + 1L).as("ts"),
        lit(-1L).as("delta"), col("user_id"), col("sid")))
      .withColumn("day", expr("ts div 86400000000L"))
    val perDay = b.groupBy(col("day")).agg(sum(col("delta")).as("net"))
    val wDays = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perDay.select(col("day"),
      coalesce(sum(col("net")).over(wDays), lit(0L)).as("off"))
    val wIn = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("delta"), col("user_id"), col("sid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = b.join(broadcast(offs), Seq("day"))
      .withColumn("conc", sum(col("delta")).over(wIn) + col("off"))
    val mx = cum.agg(max(col("conc")).as("mc"))
    val n = intervals.agg(count(lit(1)).as("n_sessions"))
    cum.join(broadcast(mx), col("conc") === col("mc"))
      .agg(max(col("conc")).as("max_concurrent"), min(col("ts")).as("at_us"))
      .crossJoin(broadcast(n))
      .select(col("n_sessions"), col("max_concurrent"), col("at_us"))
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // events joined back to their user's session intervals (sessions
    // derived as in ss01), counting events per session interval
    ("rj01_point_interval", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .withColumn("tus", expr("ts_ns div 1000"))
      val sessions = userSessions(ev)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("tus"))
      pointIntervalJoin(purchases, sessions, on = "user_id",
        pt = "tus", startCol = "s_start", endCol = "s_end",
        bucketWidth = 3600L * 1000000L) // 1h buckets (µs)
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_purchases"))
        .select(col("user_id"), col("sid").cast("bigint").as("sid"), col("n_purchases"))
        .orderBy("user_id", "sid")
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                   epoch_ns(ts) // 1000 AS tus FROM events),
      l AS (SELECT user_id, event_id, tus, event_type,
              lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tus, event_type,
              CASE WHEN p IS NULL OR tus - p > 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess0 AS (SELECT user_id, tus, event_type,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
            FROM f),
      sessions AS (SELECT user_id, sid, min(tus) AS s_start, max(tus) AS s_end
                   FROM sess0 GROUP BY user_id, sid),
      purchases AS (SELECT user_id, event_id, tus FROM e WHERE event_type = 'purchase')
      SELECT p.user_id, CAST(s.sid AS BIGINT) AS sid, count(*) AS n_purchases
      FROM purchases p JOIN sessions s
        ON p.user_id = s.user_id AND p.tus BETWEEN s.s_start AND s.s_end
      GROUP BY p.user_id, s.sid ORDER BY p.user_id, sid""")),

    // interval×interval overlap via the shared grid: for a 10% user
    // sample, count concurrent sessions of OTHER users (co-activity).
    // The raw inequality pair would plan as a nested-loop product;
    // the grid join's candidate volume is (n+m)·buckets_per_interval
    // on an equi-key Catalyst hash-partitions normally. Oracle is the
    // exhaustive inequality join, so a hash match proves the grid
    // candidates covered every true overlap (bucketWidth ≥ nothing is
    // required for completeness — adjacent-bucket pairs always share
    // a bucket because both sides explode the FULL span).
    ("rj02_interval_overlap", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .withColumn("tus", expr("ts_ns div 1000"))
      val sessions = userSessions(ev)
      val a = sessions.filter(pmod(col("user_id"), lit(10L)) === 0L)
        .select(col("user_id").as("a_user"), col("sid").as("a_sid"),
          col("s_start").as("a_start"), col("s_end").as("a_end"))
      val b = sessions
        .select(col("user_id").as("b_user"), col("sid").as("b_sid"),
          col("s_start").as("b_start"), col("s_end").as("b_end"))
      intervalOverlapJoin(a, b, "a_start", "a_end", "b_start", "b_end",
        bucketWidth = 3600L * 1000000L) // 1h buckets (µs)
        .filter(col("a_user") =!= col("b_user"))
        .groupBy(col("a_user"), col("a_sid"))
        .agg(count(lit(1)).as("n_concurrent"))
        .select(col("a_user"), col("a_sid").cast("bigint").as("a_sid"),
          col("n_concurrent"))
        .orderBy("a_user", "a_sid")
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
                   epoch_ns(ts) // 1000 AS tus FROM events),
      l AS (SELECT user_id, event_id, tus,
              lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tus,
              CASE WHEN p IS NULL OR tus - p > 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess0 AS (SELECT user_id, tus,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
            FROM f),
      sessions AS (SELECT user_id, sid, min(tus) AS s_start, max(tus) AS s_end
                   FROM sess0 GROUP BY user_id, sid),
      a AS (SELECT user_id AS a_user, sid AS a_sid,
                   s_start AS a_start, s_end AS a_end
            FROM sessions WHERE user_id % 10 = 0)
      SELECT a_user, CAST(a_sid AS BIGINT) AS a_sid,
             count(*) AS n_concurrent
      FROM a JOIN sessions b
        ON a.a_start <= b.s_end AND b.s_start <= a.a_end
       AND b.user_id <> a.a_user
      GROUP BY a_user, a_sid ORDER BY a_user, a_sid""")),

    // ---- peak concurrency over the same session intervals: global
    //      sweep-line, the oracle a single ordered window ----
    ("rj03_max_concurrency", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .withColumn("tus", expr("ts_ns div 1000"))
      maxConcurrency(userSessions(ev))
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
                   epoch_ns(ts) // 1000 AS tus FROM events),
      l AS (SELECT user_id, event_id, tus,
              lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tus,
              CASE WHEN p IS NULL OR tus - p > 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess0 AS (SELECT user_id, tus,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
            FROM f),
      sessions AS (SELECT user_id, sid, min(tus) AS s_start, max(tus) AS s_end
                   FROM sess0 GROUP BY user_id, sid),
      b AS (SELECT s_start AS ts, 1 AS delta FROM sessions
            UNION ALL SELECT s_end + 1, -1 FROM sessions),
      c AS (SELECT ts, CAST(sum(delta) OVER (ORDER BY ts, delta
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS conc
            FROM b),
      m AS (SELECT max(conc) AS mc FROM c)
      SELECT (SELECT count(*) FROM sessions) AS n_sessions,
        m.mc AS max_concurrent,
        (SELECT min(ts) FROM c WHERE conc = m.mc) AS at_us
      FROM m""")),

    // ---- per-user coverage/gap report over the same session
    //      intervals: time-in-app vs lifetime span, gap count, and
    //      the longest absence — the engagement-shape complement to
    //      rj03's global occupancy. A user's sessions are DISJOINT by
    //      construction (a >30 min gap is what splits them), so
    //      covered time is a plain sum and gaps come from ONE lag
    //      over session-count rows; everything integer µs, the
    //      coverage ratio one gated division ----
    ("rj04_coverage_gaps", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .withColumn("tus", expr("ts_ns div 1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("s_start"))
      userSessions(ev)
        .withColumn("pend", lag(col("s_end"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("s_end") - col("s_start")).as("covered_us"),
          (max(col("s_end")) - min(col("s_start"))).as("span_us"),
          max(col("s_start") - col("pend")).as("max_gap_us"))
        .select(col("user_id"), col("n_sessions"),
          col("covered_us").cast("long").as("covered_us"), col("span_us"),
          (col("n_sessions") - 1).as("n_gaps"), col("max_gap_us"),
          round(try_divide(col("covered_us").cast("double"),
            col("span_us").cast("double")), 6).as("coverage"))
        .orderBy("user_id")
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
                   epoch_ns(ts) // 1000 AS tus FROM events),
      l AS (SELECT user_id, event_id, tus,
              lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tus,
              CASE WHEN p IS NULL OR tus - p > 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess0 AS (SELECT user_id, tus,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
            FROM f),
      sessions AS (SELECT user_id, sid, min(tus) AS s_start, max(tus) AS s_end
                   FROM sess0 GROUP BY user_id, sid),
      g AS (SELECT user_id, s_start, s_end,
              lag(s_end) OVER (PARTITION BY user_id ORDER BY s_start) AS pend
            FROM sessions)
      SELECT user_id, count(*) AS n_sessions,
        CAST(sum(s_end - s_start) AS BIGINT) AS covered_us,
        max(s_end) - min(s_start) AS span_us,
        count(*) - 1 AS n_gaps,
        max(s_start - pend) AS max_gap_us,
        CASE WHEN max(s_end) - min(s_start) = 0 THEN NULL
          ELSE round(CAST(CAST(sum(s_end - s_start) AS BIGINT) AS DOUBLE)
            / CAST(max(s_end) - min(s_start) AS DOUBLE), 6) END AS coverage
      FROM g GROUP BY user_id ORDER BY user_id""")),

    // ---- inter-session gap spectrum: rj04's gaps rolled into exact
    //      power-of-two MINUTE buckets — "do users come back in
    //      minutes, hours, or days". The bucket id is the BINARY
    //      DIGIT COUNT of the gap in whole minutes (length(bin(g)) =
    //      ⌊log₂ g⌋ + 1, pure integer — a float log2 could misbucket
    //      at an exact power of two); one partial-aggregable rollup
    //      over gap rows ----
    ("rj05_gap_spectrum", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .withColumn("tus", expr("ts_ns div 1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("s_start"))
      userSessions(ev)
        .withColumn("pend", lag(col("s_end"), 1).over(w))
        .filter(col("pend").isNotNull)
        .select(expr("(s_start - pend) div 60000000L").as("gap_min"))
        .filter(col("gap_min") >= 1)
        .select(length(expr("bin(gap_min)")).cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"))
        .select(col("bucket"),
          expr("CAST(shiftleft(1L, CAST(bucket - 1 AS INT)) AS BIGINT)")
            .as("lo_minutes"),
          col("n_gaps"))
        .orderBy("bucket")
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
                   epoch_ns(ts) // 1000 AS tus FROM events),
      l AS (SELECT user_id, event_id, tus,
              lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tus,
              CASE WHEN p IS NULL OR tus - p > 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess0 AS (SELECT user_id, tus,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
            FROM f),
      sessions AS (SELECT user_id, sid, min(tus) AS s_start, max(tus) AS s_end
                   FROM sess0 GROUP BY user_id, sid),
      g AS (SELECT user_id, s_start,
              lag(s_end) OVER (PARTITION BY user_id ORDER BY s_start) AS pend
            FROM sessions),
      gm AS (SELECT (s_start - pend) // 60000000 AS gap_min
             FROM g WHERE pend IS NOT NULL),
      b AS (SELECT CAST(length(printf('%b', gap_min)) AS BIGINT) AS bucket
            FROM gm WHERE gap_min >= 1)
      SELECT bucket,
        CAST(1 << CAST(bucket - 1 AS INT) AS BIGINT) AS lo_minutes,
        count(*) AS n_gaps
      FROM b GROUP BY bucket ORDER BY bucket"""))
  )
}
