package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** The generalized funnel operator: materialization (the round-8
  * UNRESOLVED_COLUMN regression), ordered-stage semantics on a
  * hand-built corpus, and the two-exchange plan shape that must hold
  * for ANY number of stages.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  private def tinyEvents = {
    import spark.implicits._
    // (user_id, event_id, ts_ns, event_type) — gapNs=100 in the tests
    Seq(
      // u1: click BEFORE the first view must not advance the funnel
      (1L, 1L, 5L, "click"), (1L, 2L, 10L, "view"),
      (1L, 3L, 20L, "click"), (1L, 4L, 30L, "purchase"),
      // u2: click with no view at all -> reaches nothing
      (2L, 5L, 10L, "click"),
      // u3: purchase BEFORE the click -> funnel stops at click
      (3L, 6L, 10L, "view"), (3L, 7L, 15L, "purchase"), (3L, 8L, 20L, "click"),
      // u4: gap > 100 splits two sessions; second has only a view
      (4L, 9L, 0L, "view"), (4L, 10L, 50L, "click"), (4L, 11L, 200L, "view")
    ).toDF("user_id", "event_id", "ts_ns", "event_type")
  }

  test("conversionLag: conversion-free input yields ONE row with null percentiles") {
    import spark.implicits._
    // signup present but no purchase at all: the lag histogram is
    // empty, and the thresholds must still contribute one NULL row
    // (not collapse the aggregate row to zero rows — the oracle's
    // scalar subqueries always return n_converted=0 + NULL p50/p90)
    val ev = Seq((1L, 1L, 1000000000L, "signup"), (2L, 2L, 2000000000L, "view"))
      .toDF("user_id", "event_id", "ts_ns", "event_type")
    val out = Sessionize.conversionLag(ev, tolNs = 1000000000L).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(r.fieldIndex("n_converted")) === 0L)
    assert(r.isNullAt(r.fieldIndex("p50_lag_s")))
    assert(r.isNullAt(r.fieldIndex("p90_lag_s")))
  }

  test("sessionized() materializes and keeps the pass-through columns") {
    // round-8 regression: the running-sum window orders by event_id,
    // which a projection dropped -> AnalysisException on ANY call
    val out = Sessionize.sessionized(tinyEvents, gapNs = 100L)
    assert(out.columns.toSeq ===
      Seq("user_id", "ts_ns", "event_type", "session_id"))
    assert(out.count() === 11L)
    val u4 = out.filter(col("user_id") === 4L)
      .select("ts_ns", "session_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      .collect().toMap
    assert(u4 === Map(0L -> 1L, 50L -> 1L, 200L -> 2L))
  }

  test("funnelStageTimes: out-of-order hits do not advance the funnel") {
    val t = Sessionize.funnelStageTimes(
      tinyEvents, Seq("view", "click", "purchase"), gapNs = 100L)
    val rows = t.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        (0 to 2).map(i => Option(r.get(i + 2)).map(_.asInstanceOf[Long])))
    }.toSet
    assert(rows === Set(
      (1L, 1L, Seq(Some(10L), Some(20L), Some(30L))), // click@5 skipped
      (2L, 1L, Seq(None, None, None)),
      (3L, 1L, Seq(Some(10L), Some(20L), None)),      // purchase@15 < click
      (4L, 1L, Seq(Some(0L), Some(50L), None)),
      (4L, 2L, Seq(Some(200L), None, None))))
  }

  test("funnel() rollup counts and ratios") {
    val r = Sessionize.funnel(
      tinyEvents, Seq("view", "click", "purchase"), gapNs = 100L)
      .collect().head
    assert(r.getAs[Long]("n_sessions") === 5L)
    assert(r.getAs[Long]("n_view") === 4L)
    assert(r.getAs[Long]("n_click") === 3L)
    assert(r.getAs[Long]("n_purchase") === 1L)
    assert(r.getAs[Double]("r_view") === 0.8)
    assert(r.getAs[Double]("r_click") === 0.6)
    assert(r.getAs[Double]("r_purchase") === 0.2)
  }

  test("funnelStageTimes plans ONE exchange regardless of stage count") {
    // hashpartitioning(user) satisfies the (user, session) clustering
    // every stage window and the rollup require, so the sessionize
    // shuffle is the ONLY exchange — stage windows add partition-local
    // sorts, never a reshuffle, for any N
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))
    for (n <- Seq(2, 4)) {
      val stages = Seq("signup", "view", "click", "purchase").take(n)
      val df = Sessionize.funnelStageTimes(ev, stages)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"$n stages -> $exchanges exchanges:\n$plan")
    }
  }

  test("sessionPaths: prefix cap, path order by (ts, id), session shuffle is the only wide exchange") {
    val got = Sessionize.sessionPaths(tinyEvents, prefixLen = 2,
        topK = 10, gapNs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // u1: click>view (prefix 2 of 4); u2: click; u3: view>purchase;
    // u4 session 1: view>click, session 2: view
    assert(got === Map("click>view" -> 1L, "click" -> 1L,
      "view>purchase" -> 1L, "view>click" -> 1L, "view" -> 1L))
    // plan: one user-keyed exchange feeds sessionize, the session
    // window, the prefix filter AND the per-session aggregate; the
    // only other exchange is the path-count rollup + the final top-k
    val df = Sessionize.sessionPaths(graft.sources.Tables.events(spark, sf)
      .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected user shuffle + path rollup only:\n$plan")
  }

  test("d18 election: partial-agg groupBy, no per-cluster window") {
    // verdict r7 ask: pin that the canonical election is map-side
    // combinable — a Window over cluster would serialize each cluster
    val df = SparkEntry.queries("d18_canonical_dedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val election = plan.split("jaccardhashes").head // above the LSH stage
    assert(election.contains("partial_max"), plan.take(3000))
    assert(!election.contains("Window"),
      "election must not use a per-cluster window:\n" + election.take(3000))
  }

  test("retention: cohorts by first-seen week, shares vs cohort size, dup events collapse") {
    import spark.implicits._
    // week boundaries (UTC Mondays): 2024-01-01, 2024-01-08, 2024-01-15
    def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 12:00:00")
    val events = Seq(
      // cohort 2024-01-01: u1 active wk0+wk1+wk2, u2 wk0 only,
      // u3 wk0+wk2 (skips wk1) — u1 has DUPLICATE events in wk0
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")), (1L, ts("2024-01-09")),
      (1L, ts("2024-01-16")),
      (2L, ts("2024-01-04")),
      (3L, ts("2024-01-05")), (3L, ts("2024-01-17")),
      // cohort 2024-01-08: u4 active wk0+wk1
      (4L, ts("2024-01-10")), (4L, ts("2024-01-18"))
    ).toDF("user_id", "ts")
    val got = Sessionize.retention(events)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("2024-01-01", 0L)) === ((3L, 1.0)))
    assert(got(("2024-01-01", 1L)) === ((1L, 0.333333)))
    assert(got(("2024-01-01", 2L)) === ((2L, 0.666667)))
    assert(got(("2024-01-08", 0L)) === ((1L, 1.0)))
    assert(got(("2024-01-08", 1L)) === ((1L, 1.0)))
    assert(got.size === 5)
  }

  test("ss04 entry: 4-stage funnel is materializable and monotone") {
    val r = SparkEntry.queries("ss04_funnel_stages")(spark, sf).collect().head
    val ns = Seq("n_signup", "n_view", "n_click", "n_purchase")
      .map(r.getAs[Long])
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"funnel reach must be non-increasing: $ns")
    assert(r.getAs[Long]("n_sessions") > 0L)
  }

  test("sessionizedBounded: normal users exact, hot user splits only at the day boundary") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    val gap = 30L * 60 * 1000 * 1000 * 1000L
    val sec = 1000000000L
    val rows = Seq(
      // user 1 (3 events ≤ maxPerUser): two sessions, must match sessionized
      (1L, 10L, 1000L), (1L, 11L, 1000L + 60L * sec),
      (1L, 12L, 1000L + gap + 61L * sec),
      // user 2 (5 events, HOT): a session straddling midnight + one later
      (2L, 20L, day - 2L * sec), (2L, 21L, day - sec),
      (2L, 22L, day + sec), (2L, 23L, day + 2L * sec),
      (2L, 24L, day + gap + 10L * sec))
    val df = rows.toDF("user_id", "event_id", "ts_ns")
    def toMap(d: org.apache.spark.sql.DataFrame) =
      d.select("user_id", "ts_ns", "session_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bounded = toMap(Sessionize.sessionizedBounded(df, maxPerUser = 3,
      keepCols = Seq.empty))
    val exact = toMap(Sessionize.sessionized(df, keepCols = Seq.empty))
    // normal user: identical session ids, row for row
    rows.filter(_._1 == 1L).foreach { case (u, _, t) =>
      assert(bounded((u, t)) === exact((u, t)), s"non-hot user diverged at ts $t")
    }
    // hot user: the midnight-straddling exact session splits in two;
    // ids compose slice·2^32 + ordinal
    val s32 = 1L << 32
    assert(bounded((2L, day - 2L * sec)) === 1L)
    assert(bounded((2L, day - sec)) === 1L)
    assert(bounded((2L, day + sec)) === s32 + 1L)
    assert(bounded((2L, day + 2L * sec)) === s32 + 1L)
    assert(bounded((2L, day + gap + 10L * sec)) === s32 + 2L)
    // the unbounded truth keeps the straddler whole (2 sessions total)
    assert(rows.filter(_._1 == 2L).map(r => exact((2L, r._3))).distinct.size === 2)
  }
}
