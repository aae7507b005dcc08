package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Gap-based sessionization of the event stream, batch form:
  * lag + cumulative-sum session ids, then per-session rollup. The
  * streaming form (session_window / flatMapGroupsWithState) lives in
  * graft.streaming; this batch variant is the oracle-checkable one.
  * Works on the exact ns longs so ordering and gap arithmetic are
  * integer-exact.
  */
object Sessionize {
  type QFn = (SparkSession, String) => DataFrame

  private val GapNs = 30L * 60 * 1000 * 1000 * 1000 // 30 min in ns

  /** Gap-sessionized events with an ordinal per-user session id —
    * the shared front half of ss01/ss03/ss04. One (user) shuffle.
    * Expects `tsCol` as integer ns (µs-floored upstream for oracle
    * parity). */
  def sessionized(events: DataFrame, gapNs: Long = GapNs,
      userCol: String = "user_id", tsCol: String = "ts_ns",
      idCol: String = "event_id", keepCols: Seq[String] = Seq("event_type"))
      : DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(Seq(col(userCol), col(idCol), col(tsCol)) ++ keepCols.map(col)
        :+ lag(col(tsCol), 1).over(w).as("_prev"): _*)
      // idCol must survive this projection: wRun orders by (tsCol, idCol)
      // and resolves against THIS select's output
      .select(Seq(col(userCol), col(idCol), col(tsCol)) ++ keepCols.map(col)
        :+ when(col("_prev").isNull || col(tsCol) - col("_prev") > gapNs, 1L)
          .otherwise(0L).as("_new"): _*)
      .select(Seq(col(userCol), col(tsCol)) ++ keepCols.map(col)
        :+ sum(col("_new")).over(wRun).as("session_id"): _*)
  }

  /** Hot-user-BOUNDED sessionization — the mitigation for the
    * documented ss01 straggler bound (window partitions don't
    * AQE-split, so one pathological user — a bot — serializes exactly
    * one task; the Scale probe measures it). Users whose event count
    * exceeds `maxPerUser` get their stream pre-split by UTC day: the
    * session window partitions on (user, slice), so no task ever
    * sorts more than one hot DAY of one user. Normal users (slice 0)
    * come out EXACTLY as [[sessionized]] — identical ordinal
    * session_id — and a hot user's sessions are exact within each
    * day; a session genuinely crossing midnight splits in two (the
    * documented approximation this trade buys the bound with).
    * session_id = slice·2³² + within-slice ordinal stays unique and
    * deterministic. Cost: one extra partial-aggregable per-user count
    * (collapses to distinct users map-side) + a broadcast of the hot
    * set (tiny by construction — it IS the pathology list).
    */
  def sessionizedBounded(events: DataFrame, maxPerUser: Long,
      gapNs: Long = GapNs, userCol: String = "user_id", tsCol: String = "ts_ns",
      idCol: String = "event_id", keepCols: Seq[String] = Seq("event_type"))
      : DataFrame = {
    val dayNs = 86400L * 1000000000L
    val hot = events.groupBy(col(userCol)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxPerUser)
      .select(col(userCol), lit(true).as("_hot"))
    val sliced = events.join(broadcast(hot), Seq(userCol), "left")
      .withColumn("_slice",
        when(col("_hot").isNotNull, expr(s"$tsCol div $dayNs")).otherwise(lit(0L)))
    val w = Window.partitionBy(col(userCol), col("_slice"))
      .orderBy(col(tsCol), col(idCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliced
      .select(Seq(col(userCol), col(idCol), col(tsCol), col("_slice"))
        ++ keepCols.map(col)
        :+ lag(col(tsCol), 1).over(w).as("_prev"): _*)
      .select(Seq(col(userCol), col(idCol), col(tsCol), col("_slice"))
        ++ keepCols.map(col)
        :+ when(col("_prev").isNull || col(tsCol) - col("_prev") > gapNs, 1L)
          .otherwise(0L).as("_new"): _*)
      .select(Seq(col(userCol), col(tsCol)) ++ keepCols.map(col)
        :+ (col("_slice") * lit(1L << 32) + sum(col("_new")).over(wRun))
          .as("session_id"): _*)
  }

  /** Per-session stage times of an ORDERED funnel over an ARBITRARY
    * stage list: stage i's first hit AT-OR-AFTER stage i−1's (an
    * out-of-order hit doesn't advance the funnel). Returns one row
    * per (user, session) with a `t_<stage>` ns column per stage
    * (null = session never reached it).
    *
    * Scale: the conditional-min chain is built by FOLD — stage i's
    * window min reads stage i−1's, and hashpartitioning(user) from
    * the sessionize shuffle already satisfies every stage window's
    * (user, session) clustering, so the whole chain is ONE exchange
    * total regardless of N — each window adds only a partition-local
    * sort (plan-pinned in SessionizeSpec + PLANS.md ss04).
    */
  def funnelStageTimes(events: DataFrame, stages: Seq[String],
      gapNs: Long = GapNs, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts_ns",
      idCol: String = "event_id"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate funnel stage in $stages")
    val sess = sessionized(events, gapNs, userCol, tsCol, idCol, Seq(typeCol))
    val ws = Window.partitionBy(col(userCol), col("session_id"))
    val staged = stages.zipWithIndex.foldLeft(sess) { case (df, (st, i)) =>
      val inOrder = if (i == 0) lit(true)
        else col(tsCol) >= col(s"t_${stages(i - 1)}")
      df.withColumn(s"t_$st",
        min(when(col(typeCol) === st && inOrder, col(tsCol))).over(ws))
    }
    val tCols = stages.map(st => s"t_$st")
    staged.groupBy(col(userCol), col("session_id"))
      .agg(max(col(tCols.head)).as(tCols.head),
        tCols.tail.map(c => max(col(c)).as(c)): _*)
  }

  /** Funnel ROLLUP over [[funnelStageTimes]]: session count, per-stage
    * reach counts `n_<stage>` and conversion ratios `r_<stage>`
    * (reach / total sessions). The operator shape every event
    * pipeline's funnel report calls with its own stage list. */
  def funnel(events: DataFrame, stages: Seq[String],
      gapNs: Long = GapNs, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts_ns",
      idCol: String = "event_id"): DataFrame = {
    val times = funnelStageTimes(events, stages, gapNs, userCol, typeCol,
      tsCol, idCol)
    val aggs = count(lit(1)).as("n_sessions") +:
      stages.map(st => count(col(s"t_$st")).as(s"n_$st"))
    val counted = times.agg(aggs.head, aggs.tail: _*)
    stages.foldLeft(counted) { (df, st) =>
      df.withColumn(s"r_$st",
        round(col(s"n_$st").cast("double") / col("n_sessions"), 6))
    }
  }

  /** First-order Markov transition matrix over each user's
    * chronological event stream: counts and row-normalized
    * probabilities of (prev event type → next event type) — the
    * "what do users do after X" table behind next-action models and
    * bot heuristics. Counts exact; each probability ONE rounded
    * division off the exact integers.
    *
    * SCALE: one (user)-keyed lag window over per-user event counts —
    * the ss01 shape with the same hot-user caveat (bound via
    * [[sessionizedBounded]]'s slice discipline if a bot dominates);
    * everything after the pair groupBy is category²-sized.
    */
  def transitionMatrix(events: DataFrame,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts_ns", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("prev_type"))
      .agg(sum("n").cast("long").as("row_n"))
    pairs.join(rowTot, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"), col("row_n"),
        round(col("n").cast("double") / col("row_n").cast("double"), 6)
          .as("p"))
  }

  /** Top session paths: the ordered event-type sequence of each
    * session's first `prefixLen` events, counted across sessions —
    * "what do users actually do" as a ranked path table (the
    * clickstream Sankey's input). Prefix cap FIRST (row_number ≤
    * prefixLen), so the per-session collect is bounded at prefixLen
    * structs even for a bot session — the aggregate's state is O(P),
    * never O(session). The (user, session) window runs under
    * [[sessionized]]'s existing user hash partitioning
    * (ClusteredDistribution is satisfied by a subset key — no second
    * exchange); path assembly is array_sort over the ≤P collected
    * (ts, id, type) structs, deterministic by the unique id tiebreak.
    */
  def sessionPaths(events: DataFrame, prefixLen: Int = 5,
      topK: Int = 20, gapNs: Long = GapNs): DataFrame = {
    require(prefixLen >= 1 && topK >= 1, "need prefixLen/topK >= 1")
    val ev = events.withColumn("eid", col("event_id"))
    val s = sessionized(ev, gapNs, keepCols = Seq("event_type", "eid"))
    val w2 = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_ns"), col("eid"))
    s.withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= prefixLen)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("ts_ns"), col("eid"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path")).limit(topK)
  }

  /** events with ts_ns µs-floored: DuckDB reads parquet NANOS as µs
    * timestamps, so all gap/duration arithmetic must happen at µs
    * resolution for oracle parity. */
  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))

  /** Cohort retention (the product-analytics matrix beside sessions
    * ss01 and funnels ss03/ss04): bucket each user into the ISO week
    * of their FIRST event, then for every (cohort_week, k) count the
    * cohort's users still active k weeks later and their share of the
    * cohort. Shuffle budget: one partial-aggregable distinct over
    * (user, week) — activity collapses to user-weeks BEFORE anything
    * keyed by user, so a bot with millions of events contributes one
    * row per week; one user-key groupBy for first-seen plus the
    * user-key join it colocates with; one matrix-sized (cohort, k)
    * rollup. The retention-share window runs over the matrix
    * (O(weeks²) rows regardless of corpus size), never the corpus.
    */
  def retention(events: DataFrame): DataFrame =
    retentionFromWeeks(activityWeeks(events))

  /** The bot-proof collapse alone: distinct (user_id, week DATE) from
    * raw events — the compact activity table the streaming form
    * accumulates in its store. */
  def activityWeeks(events: DataFrame): DataFrame =
    events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("week")).distinct()

  /** Time-to-convert distribution: for every signup matched to the
    * user's FIRST purchase within `tolNs` ([[AsOf.asofJoinNear]]
    * forward — ao03's shape), the conversion count and EXACT p50/p90
    * lag in whole seconds, elected over the lag histogram by
    * [[TextOps.percentileThresholds]] (rank-based real data values,
    * no interpolation — integer end-to-end).
    *
    * SCALE: the as-of join is one (user) exchange; lags are
    * signup-sized; both percentiles ride ONE histogram election
    * (distinct lag seconds ≪ conversions). Output is a single row.
    */
  def conversionLag(events: DataFrame, tolNs: Long): DataFrame = {
    val ev = events.withColumn("tns", expr("(ts_ns div 1000) * 1000"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("tns"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("tns"))
      .agg(min(col("event_id")).as("p_event"))
    val lags = AsOf.asofJoinNear(signups, purchases, on = "user_id",
        leftTime = "tns", rightTime = "tns", rightVals = Seq("p_event"),
        toleranceNs = tolNs, forward = true)
      .filter(col("p_event").isNotNull)
      // the matched purchase's time is not carried — recover the lag
      // from the purchase table by (user, event) join, purchase-sized
      .join(purchases.select(col("user_id"), col("tns").as("p_tns"),
        col("p_event")), Seq("user_id", "p_event"))
      .select(expr("(p_tns - tns) div 1000000000L").as("lag_s"))
      .withColumn("_g", lit(0))
    val hist = lags.groupBy(col("_g"), col("lag_s"))
      .agg(count(lit(1)).as("n"))
    // the max() re-aggregate guarantees ONE row even when the lag
    // histogram is empty (no conversions at all): without it the
    // crossJoin would collapse the n_converted=0 aggregate row to
    // zero rows, while the oracle's scalar subqueries always yield
    // one row with NULL percentiles
    def thr(p: Double, out: String) =
      TextOps.percentileThresholds(hist, "_g", "lag_s", p)
        .select(col("thr").as(out))
        .agg(max(col(out)).as(out))
    lags.agg(count(lit(1)).as("n_converted"))
      .crossJoin(broadcast(thr(0.5, "p50_lag_s")))
      .crossJoin(broadcast(thr(0.9, "p90_lag_s")))
  }

  /** Daily user growth: per day — active users, NEW users (first
    * seen that day), returning = active − new, and the cumulative
    * distinct user count (= running sum of new, exactly, since every
    * user is new exactly once). Same bot-proof collapse as
    * [[retention]]: the corpus drops to distinct (user, day) before
    * any user-keyed stage; first-seen is one partial-aggregable
    * min(day) per user; the only window runs over the DAY table
    * (calendar-sized, single ordered partition of ~10³ rows at any
    * corpus size — not a skew surface).
    */
  def userGrowth(events: DataFrame): DataFrame = {
    val a = events.select(col("user_id"),
      col("ts").cast("date").as("day")).distinct()
    val act = a.groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val nw = a.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    act.join(nw, Seq("day"), "left")
      .select(col("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("returning_users",
        col("active_users") - col("new_users"))
      .withColumn("cumulative_users", sum(col("new_users")).over(w))
      .select(col("day").cast("string").as("day"), col("active_users"),
        col("new_users"), col("returning_users"), col("cumulative_users"))
  }

  /** [[retention]] from an already-collapsed distinct (user_id, week)
    * table ([[activityWeeks]]' shape; streaming replays this over its
    * store each micro-batch). */
  def retentionFromWeeks(act: DataFrame): DataFrame = {
    val first = act.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val mat = act.join(first, "user_id")
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("bigint").as("week_k"))
      .groupBy("cohort_week", "week_k").agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy("cohort_week")
    mat
      .withColumn("cohort_size",
        max(when(col("week_k") === 0, col("n_users"))).over(w))
      .select(col("cohort_week").cast("string").as("cohort_week"),
        col("week_k"), col("n_users"),
        round(col("n_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_week", "week_k")
  }

  /** DAU / trailing-`windowDays` MAU per day ("stickiness" — the
    * DAU/MAU engagement ratio every growth dashboard carries).
    *
    * Distinct-users-per-sliding-window without re-counting: each
    * user's presence day d covers grid days [d, min(next_d − 1,
    * d + W − 1)] — the span where d is that user's LATEST presence
    * inside the trailing window. Per user the spans are disjoint, so
    * "users covered at day g" IS the distinct trailing count. Spans
    * become ±1 deltas, deltas fold per DAY (partial-aggregable
    * groupBy — this is where user-volume rows disappear), and one
    * running sum over the calendar-sized day table reads MAU at each
    * grid day. SCALE: the only serial stage is the day-table window
    * (thousands of rows for years of data); everything user-sized is
    * hash-parallel. The ss05 bot-proofing applies: activity drops to
    * distinct (user, day) first.
    */
  def stickiness(events: DataFrame, windowDays: Int): DataFrame =
    stickinessFromPresence(events.select(col("user_id"),
      col("ts").cast("date").as("day")).distinct(), windowDays)

  /** The interval machinery of [[stickiness]] over a PRE-DISTINCT
    * (user_id, day) presence frame — the shared back half of the
    * batch entry and the streaming twin
    * ([[graft.streaming.EngagementStream]]), whose store already
    * holds distinct presence rows. `pres` must be unique per
    * (user_id, day). */
  def stickinessFromPresence(pres0: DataFrame, windowDays: Int)
      : DataFrame = {
    val pres = pres0.select(col("user_id"), col("day"))
    val dau = pres.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val uw = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val cap = date_add(col("day"), windowDays - 1)
    val iv = pres.select(col("day").as("s"),
      least(coalesce(date_sub(lead(col("day"), 1).over(uw), 1), cap),
        cap).as("e"))
    val deltas = iv.select(col("s").as("day"), lit(1L).as("dt"))
      .unionAll(iv.select(date_add(col("e"), 1).as("day"),
        lit(-1L).as("dt")))
      .groupBy(col("day")).agg(sum(col("dt")).as("delta"))
    val merged = deltas.select(col("day"), col("delta"),
        lit(0).as("is_grid"), lit(0L).as("dau"))
      .unionAll(dau.select(col("day"), lit(0L).as("delta"),
        lit(1).as("is_grid"), col("dau")))
    val w = Window.orderBy(col("day"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged.withColumn("mau", sum(col("delta")).over(w))
      .filter(col("is_grid") === 1)
      .select(col("day").cast("string").as("day"), col("dau"),
        col("mau").cast("long").as("mau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("stickiness"))
      .orderBy("day")
  }

  /** Engagement-depth (Lness) histogram: for each day, how many of
    * that day's active users were active on 1, 2, …, `windowDays`
    * distinct days of the trailing window — the L7/L28 distribution
    * behind "power-user curve" dashboards (a healthy product shifts
    * mass rightward; ss11's stickiness is this histogram's mean).
    *
    * Per user the trailing count is a RANGE window over the day
    * number (presence rows only — user-day-sized, partitioned by
    * user, so no global serial stage and the ss05 bot-proofing
    * applies: one row per (user, day) no matter the event volume).
    * The histogram rollup is a partial-aggregable (day, l) groupBy.
    */
  def engagementHistogram(events: DataFrame, windowDays: Int): DataFrame = {
    val pres = events.select(col("user_id"),
        col("ts").cast("date").as("day")).distinct()
      .withColumn("dn",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("dn"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    pres.withColumn("l", count(lit(1)).over(w))
      .groupBy(col("day").cast("string").as("day"), col("l"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("day", "l")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    ("ss01_sessionize", (s: SparkSession, d: String) => {
      sessionized(eventsUs(s, d), keepCols = Seq.empty)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts_ns")) - min(col("ts_ns"))).as("dur_ns"))
        .select(col("user_id"), col("session_id").cast("bigint").as("session_id"),
          col("n_events"), col("dur_ns"))
        .orderBy("user_id", "session_id")
    }, ss01OracleSql),

    // ---- ss01 under the hot-user bound: maxPerUser=70 makes the
    //      busier half of the sf corpus "hot" (their windows split by
    //      day) while the rest replays ss01 exactly — the oracle
    //      recomputes the per-user counts, the slice rule, and the
    //      slice-composed session ids ----
    ("ss06_sessionize_bounded", (s: SparkSession, d: String) => {
      sessionizedBounded(eventsUs(s, d), maxPerUser = 70, keepCols = Seq.empty)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_id").cast("bigint").as("session_id"),
          col("n_events"))
        .orderBy("user_id", "session_id")
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
                   (epoch_ns(ts) // 1000) * 1000 AS tns FROM events),
      cnt AS (SELECT user_id, count(*) AS n FROM e GROUP BY user_id),
      s AS (SELECT e.user_id, e.event_id, e.tns,
              CASE WHEN c.n > 70 THEN e.tns // 86400000000000
                   ELSE 0 END AS slice
            FROM e JOIN cnt c USING (user_id)),
      l AS (SELECT user_id, event_id, tns, slice,
              lag(tns) OVER (PARTITION BY user_id, slice
                             ORDER BY tns, event_id) AS p
            FROM s),
      f AS (SELECT user_id, event_id, tns, slice,
              CASE WHEN p IS NULL OR tns - p > 1800000000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, slice, tns,
              sum(is_new) OVER (PARTITION BY user_id, slice
                                ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
      SELECT user_id,
        CAST(slice * 4294967296 + sid AS BIGINT) AS session_id,
        count(*) AS n_events
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")),

    // same sessions via Spark's native session_window (the streaming-
    // ready form); output matches ss01 minus the ordinal session_id
    ("ss02_session_window", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .withColumn("tus", expr("(ts_ns div 1000) * 1000"))
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("tus")) - min(col("tus"))).as("dur_ns"))
        .select(col("user_id"), col("n_events"), col("dur_ns"))
        .orderBy("user_id", "n_events", "dur_ns")
    }, Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
      l AS (SELECT user_id, event_id, tns,
              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tns,
              CASE WHEN p IS NULL OR tns - p > 1800000000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, tns,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f)
      SELECT user_id, count(*) AS n_events,
        CAST(max(tns) - min(tns) AS BIGINT) AS dur_ns
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, n_events, dur_ns""")),

    // ---- ORDERED funnel over ss01's sessions: view → click →
    //      purchase, each stage's first hit AT-OR-AFTER the previous
    //      stage's (a click before any view doesn't advance the
    //      funnel). ONE data exchange total: the (user) sessionization
    //      shuffle satisfies the (user, session) clustering all three
    //      stage windows AND the per-session rollup require. The
    //      funnel metric every event pipeline reports; integer-ns
    //      arithmetic for oracle parity ----
    ("ss03_funnel", (s: SparkSession, d: String) => {
      // the 3-stage special case of funnel(); renamed to the original
      // ss03 report columns
      funnel(eventsUs(s, d), Seq("view", "click", "purchase"))
        .select(col("n_sessions"), col("n_view"),
          col("n_click").as("n_view_click"),
          col("n_purchase").as("n_full_funnel"),
          col("r_view"), col("r_click"), col("r_purchase"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns FROM events),
      l AS (SELECT user_id, event_id, event_type, tns,
              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, event_type, tns,
              CASE WHEN p IS NULL OR tns - p > 1800000000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, event_type, tns,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f),
      a AS (SELECT user_id, session_id,
              min(CASE WHEN event_type = 'view' THEN tns END) AS tv
            FROM sess GROUP BY 1, 2),
      b AS (SELECT s.user_id, s.session_id, a.tv,
              min(CASE WHEN s.event_type = 'click' AND s.tns >= a.tv THEN s.tns END) AS tc
            FROM sess s JOIN a USING (user_id, session_id) GROUP BY 1, 2, 3),
      c AS (SELECT s.user_id, s.session_id, b.tv, b.tc,
              min(CASE WHEN s.event_type = 'purchase' AND s.tns >= b.tc THEN s.tns END) AS tp
            FROM sess s JOIN b USING (user_id, session_id) GROUP BY 1, 2, 3, 4)
      SELECT count(*) AS n_sessions,
        count(tv) AS n_view, count(tc) AS n_view_click, count(tp) AS n_full_funnel,
        round(CAST(count(tv) AS DOUBLE) / count(*), 6) AS r_view,
        round(CAST(count(tc) AS DOUBLE) / count(*), 6) AS r_click,
        round(CAST(count(tp) AS DOUBLE) / count(*), 6) AS r_purchase
      FROM c""")),

    // ---- funnel() over an ARBITRARY 4-stage list (signup → view →
    //      click → purchase), the generalized form of ss03 every event
    //      pipeline calls with its own stage list. Same one-exchange
    //      shape regardless of N: the (user) sessionize shuffle is the
    //      only data exchange; all N stage windows and the rollup ride
    //      it with partition-local sorts ----
    ("ss04_funnel_stages", (s: SparkSession, d: String) => {
      funnel(eventsUs(s, d), Seq("signup", "view", "click", "purchase"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns FROM events),
      l AS (SELECT user_id, event_id, event_type, tns,
              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, event_type, tns,
              CASE WHEN p IS NULL OR tns - p > 1800000000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, event_type, tns,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f),
      a AS (SELECT user_id, session_id,
              min(CASE WHEN event_type = 'signup' THEN tns END) AS t1
            FROM sess GROUP BY 1, 2),
      b AS (SELECT s.user_id, s.session_id, a.t1,
              min(CASE WHEN s.event_type = 'view' AND s.tns >= a.t1 THEN s.tns END) AS t2
            FROM sess s JOIN a USING (user_id, session_id) GROUP BY 1, 2, 3),
      c AS (SELECT s.user_id, s.session_id, b.t1, b.t2,
              min(CASE WHEN s.event_type = 'click' AND s.tns >= b.t2 THEN s.tns END) AS t3
            FROM sess s JOIN b USING (user_id, session_id) GROUP BY 1, 2, 3, 4),
      d4 AS (SELECT s.user_id, s.session_id, c.t1, c.t2, c.t3,
              min(CASE WHEN s.event_type = 'purchase' AND s.tns >= c.t3 THEN s.tns END) AS t4
            FROM sess s JOIN c USING (user_id, session_id) GROUP BY 1, 2, 3, 4, 5)
      SELECT count(*) AS n_sessions,
        count(t1) AS n_signup, count(t2) AS n_view,
        count(t3) AS n_click, count(t4) AS n_purchase,
        round(CAST(count(t1) AS DOUBLE) / count(*), 6) AS r_signup,
        round(CAST(count(t2) AS DOUBLE) / count(*), 6) AS r_view,
        round(CAST(count(t3) AS DOUBLE) / count(*), 6) AS r_click,
        round(CAST(count(t4) AS DOUBLE) / count(*), 6) AS r_purchase
      FROM d4""")),

    // ---- cohort retention matrix: first-event week cohorts, share
    //      still active k weeks later. Week truncation is tz-stable
    //      (UTC session both sides) and insensitive to the ns-vs-µs
    //      generation difference ----
    // ---- time-to-convert: signup → first purchase within 7 days,
    //      exact p50/p90 lag via the t20 rank election; oracle =
    //      ao03's correlated-min + the same histogram election ----
    ("ss08_conversion_lag", (s: SparkSession, d: String) => {
      conversionLag(Tables.events(s, d), 7L * 24 * 3600 * 1000000000L)
        // single row; explicit order because maxRows=1 doesn't
        // propagate through the threshold cross joins
        .orderBy("n_converted")
    }, Some("""
      WITH g AS (SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events
                 WHERE event_type = 'signup'),
      p AS (SELECT user_id, epoch_ns(ts) AS tns, min(event_id) AS p_event
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      m AS (SELECT g.user_id, g.tns,
              (SELECT min(p.tns) FROM p
               WHERE p.user_id = g.user_id AND p.tns >= g.tns
                 AND p.tns <= g.tns + 604800000000000) AS mt
            FROM g),
      l AS (SELECT (mt - tns) // 1000000000 AS lag_s FROM m
            WHERE mt IS NOT NULL),
      h AS (SELECT lag_s, count(*) AS n FROM l GROUP BY 1),
      c AS (SELECT lag_s, sum(n) OVER (ORDER BY lag_s) AS cum,
              sum(n) OVER () AS nt FROM h)
      SELECT (SELECT count(*) FROM l) AS n_converted,
        (SELECT min(lag_s) FROM c WHERE cum >= ceil(0.5 * nt)) AS p50_lag_s,
        (SELECT min(lag_s) FROM c WHERE cum >= ceil(0.9 * nt)) AS p90_lag_s""")),

    // ---- daily user growth: active / new (first-seen that day) /
    //      returning / cumulative distinct users per day. The ss05
    //      collapse discipline: activity drops to distinct (user,
    //      day) BEFORE any user-keyed stage (bot-proof), first-seen
    //      is one partial-aggregable min per user, and the cumulative
    //      window runs over the DAY table (calendar-sized) ----
    ("ss07_user_growth", (s: SparkSession, d: String) => {
      userGrowth(Tables.events(s, d)).orderBy("day")
    }, Some("""
      WITH a AS (SELECT DISTINCT user_id,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
      f AS (SELECT user_id, min(day) AS d0 FROM a GROUP BY 1),
      act AS (SELECT day, count(*) AS active_users FROM a GROUP BY 1),
      nw AS (SELECT d0 AS day, count(*) AS new_users FROM f GROUP BY 1)
      SELECT CAST(act.day AS VARCHAR) AS day, act.active_users,
        coalesce(nw.new_users, 0) AS new_users,
        act.active_users - coalesce(nw.new_users, 0) AS returning_users,
        CAST(sum(coalesce(nw.new_users, 0))
          OVER (ORDER BY act.day) AS BIGINT) AS cumulative_users
      FROM act LEFT JOIN nw USING (day)
      ORDER BY day""")),

    ("ss05_retention", (s: SparkSession, d: String) =>
      retention(Tables.events(s, d)), Some("""
      WITH a AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
      f AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1),
      m AS (SELECT f.cohort_week,
              CAST(datediff('day', f.cohort_week, a.week) / 7 AS BIGINT) AS week_k,
              count(*) AS n_users
            FROM a JOIN f USING (user_id) GROUP BY 1, 2)
      SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_k,
        CAST(n_users AS BIGINT) AS n_users,
        round(CAST(n_users AS DOUBLE) /
          max(CASE WHEN week_k = 0 THEN n_users END)
            OVER (PARTITION BY cohort_week), 6) AS retention
      FROM m ORDER BY cohort_week, week_k""")),

    // ---- first-order Markov transitions: what users do after X —
    //      exact pair counts per user-chronological lag, probability
    //      one rounded division; the oracle replays the identical
    //      (ts, event_id)-ordered lag ----
    ("ss09_transitions", (s: SparkSession, d: String) => {
      transitionMatrix(eventsUs(s, d))
        .orderBy("prev_type", "next_type")
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                   (epoch_ns(ts) // 1000) * 1000 AS tns FROM events),
      l AS (SELECT user_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY tns, event_id) AS prev
            FROM e),
      p AS (SELECT prev AS prev_type, event_type AS next_type,
              count(*) AS n
            FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_n
            FROM p GROUP BY 1)
      SELECT p.prev_type, p.next_type, p.n, t.row_n,
        round(CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE), 6) AS p
      FROM p JOIN t USING (prev_type)
      ORDER BY prev_type, next_type""")),

    // ---- top-20 session-prefix paths (first 5 events per session):
    //      the oracle replays ss01's sessionization, ranks within
    //      session, and string_aggs the ordered prefix ----
    ("ss10_session_paths", (s: SparkSession, d: String) => {
      sessionPaths(eventsUs(s, d))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                   (epoch_ns(ts) // 1000) * 1000 AS tns FROM events),
      l AS (SELECT user_id, event_id, event_type, tns,
              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, event_type, tns,
              CASE WHEN p IS NULL OR tns - p > 1800000000000
                THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, event_id, event_type, tns,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
              ORDER BY tns, event_id) AS rn
            FROM sess),
      p AS (SELECT user_id, session_id,
              string_agg(event_type, '>' ORDER BY tns, event_id) AS path
            FROM r WHERE rn <= 5 GROUP BY 1, 2)
      SELECT path, count(*) AS n_sessions FROM p
      GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""")),

    // ---- DAU / trailing-28-day MAU stickiness per day. The naive
    //      plan (distinct users per 28-day window) re-counts every
    //      user 28×; instead each user's presence days become
    //      DISJOINT coverage intervals ([day, min(next_day−1,
    //      day+27)] — "I am the latest presence in the window"), so
    //      summing interval membership IS the distinct count.
    //      Intervals fold to per-day ±1 nets (day-sized) BEFORE the
    //      one running sum over the calendar — the rj03/t23 two-phase
    //      discipline: no user-volume row ever crosses a global
    //      window ----
    ("ss11_stickiness", (s: SparkSession, d: String) => {
      stickiness(Tables.events(s, d), 28)
    }, Some("""
      WITH pres AS (SELECT DISTINCT user_id,
                      CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                    FROM events),
      dau AS (SELECT day, count(*) AS dau FROM pres GROUP BY 1),
      iv AS (SELECT day AS s,
               least(coalesce(lead(day) OVER (PARTITION BY user_id
                       ORDER BY day) - 1, day + 27), day + 27) AS e
             FROM pres),
      delta AS (SELECT day, CAST(sum(dt) AS BIGINT) AS delta FROM (
          SELECT s AS day, 1 AS dt FROM iv
          UNION ALL SELECT e + 1, -1 FROM iv)
        GROUP BY 1),
      merged AS (
        SELECT day, delta, 0 AS is_grid, 0 AS dau FROM delta
        UNION ALL SELECT day, 0, 1, dau FROM dau),
      run AS (SELECT day, dau, is_grid,
               sum(delta) OVER (ORDER BY day, is_grid
                 ROWS UNBOUNDED PRECEDING) AS mau
              FROM merged)
      SELECT CAST(day AS VARCHAR) AS day, CAST(dau AS BIGINT) AS dau,
        CAST(mau AS BIGINT) AS mau,
        round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6) AS stickiness
      FROM run WHERE is_grid = 1 ORDER BY day""")),

    // ---- L7 engagement histogram: per day, the distribution of
    //      trailing-7-day active-day counts among that day's active
    //      users (the power-user curve; ss11's stickiness is this
    //      histogram's mean). Per-user RANGE window over day numbers
    //      on presence rows (user-day-sized), then a
    //      partial-aggregable (day, l) rollup ----
    ("ss12_engagement_hist", (s: SparkSession, d: String) => {
      engagementHistogram(Tables.events(s, d), 7)
    }, Some("""
      WITH pres AS (SELECT DISTINCT user_id,
                      CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                    FROM events),
      dn AS (SELECT user_id, day,
               CAST(day - DATE '1970-01-01' AS BIGINT) AS dn
             FROM pres),
      l AS (SELECT day, count(*) OVER (PARTITION BY user_id ORDER BY dn
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS l
            FROM dn)
      SELECT CAST(day AS VARCHAR) AS day, CAST(l AS BIGINT) AS l,
        count(*) AS n_users
      FROM l GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- new-vs-returning DAU split: each day's actives partitioned
    //      by whether it's the user's FIRST day ever (ss07's
    //      first-seen min against ss11's presence set) — the growth
    //      headline "how much of today is acquisition vs retention".
    //      Presence distinct first (bot-proof), first-seen one
    //      partial-aggregable min, split one rounded division ----
    ("ss13_dau_split", (s: SparkSession, d: String) => {
      val pres = Tables.events(s, d).select(col("user_id"),
        col("ts").cast("date").as("day")).distinct()
      val first = pres.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"))
      pres.join(first, Seq("user_id"))
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("dau"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("n_new"))
        .select(col("day"), col("dau"), col("n_new"),
          (col("dau") - col("n_new")).as("n_returning"),
          round(col("n_new").cast("double") / col("dau").cast("double"), 6)
            .as("new_share"))
        .orderBy("day")
    }, Some("""
      WITH pres AS (SELECT DISTINCT user_id,
                      CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                    FROM events),
      f AS (SELECT user_id, min(day) AS first_day FROM pres GROUP BY 1),
      a AS (SELECT day, count(*) AS dau,
              CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new
            FROM pres JOIN f USING (user_id) GROUP BY 1)
      SELECT CAST(day AS VARCHAR) AS day, dau, n_new,
        dau - n_new AS n_returning,
        round(CAST(n_new AS DOUBLE) / CAST(dau AS DOUBLE), 6) AS new_share
      FROM a ORDER BY day"""))
  )

  private lazy val ss01OracleSql = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
      l AS (SELECT user_id, event_id, tns,
              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, tns,
              CASE WHEN p IS NULL OR tns - p > 1800000000000 THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, tns,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        count(*) AS n_events,
        CAST(max(tns) - min(tns) AS BIGINT) AS dur_ns
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")
}