package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Timeseries

/** Semantic edge cases for the time-series family on hand-built
  * frames (the sf oracle entries cover end-to-end parity).
  */
class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  // (key, ts_ns, event_id, value): key "a" has buckets 0,1,3 (gap at
  // 2), key "b" a single bucket
  private def toy = Seq(
    ("a", 5L, 1L, 10.0), ("a", 7L, 2L, 20.0),   // bucket 0
    ("a", 12L, 3L, 30.0),                       // bucket 1
    ("a", 35L, 4L, 40.0),                       // bucket 3
    ("b", 21L, 5L, 7.0)                         // bucket 2
  ).toDF("event_type", "ts_ns", "event_id", "value")

  test("resample fills gaps with n=0 and carries the last total forward") {
    val out = Timeseries.resample(toy, bucketNs = 10L)
      .orderBy("event_type", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("a", 0L, 2L, Some(30.0), 30.0),
      ("a", 1L, 1L, Some(30.0), 30.0),
      ("a", 2L, 0L, None, 30.0),       // gap: count 0, total null, ffilled
      ("a", 3L, 1L, Some(40.0), 40.0),
      ("b", 2L, 1L, Some(7.0), 7.0)))  // spine is per-key, not global
  }

  test("ohlc picks open/close by the exact (ts, id) order") {
    // same-ts rows in bucket 0: event_id breaks the tie for open
    val ties = Seq(
      ("a", 5L, 2L, 99.0), ("a", 5L, 1L, 11.0), ("a", 9L, 3L, 44.0))
      .toDF("event_type", "ts_ns", "event_id", "value")
    val r = Timeseries.ohlcBars(ties, bucketNs = 10L).collect().head
    assert(r.getAs[Double]("open") === 11.0)   // id 1 wins the tie
    assert(r.getAs[Double]("close") === 44.0)
    assert(r.getAs[Double]("high") === 99.0)
    assert(r.getAs[Double]("low") === 11.0)
    assert(r.getAs[Long]("n") === 3L)
  }

  test("anomalousBuckets compares cross-multiplied integers over the dense grid") {
    // key "a": buckets 0..2 (dense range 3), counts 1,0(gap),5 → mean
    // over the DENSE grid = 2; threshold 2× mean = 4 → only n=5 flags
    val df = (Seq.fill(1)(("a", 5L)) ++ Seq.fill(5)(("a", 25L)))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, 1.0) }
      .toDF("event_type", "ts_ns", "event_id", "value")
    val out = Timeseries.anomalousBuckets(df, 10L, num = 2L, den = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 2L, 5L)))
  }


  test("ewmaFixedPoint: floored-cents fold, init = first bucket, key reset") {
    // key a buckets 0,1,3 -> cents 3000, 3000, 4000:
    //   e0 = 3000; e1 = (3000 + 4*3000)/5 = 3000; e3 = (4000+4*3000)/5 = 3200
    // key b single bucket -> its own init (state reset across keys)
    val out = Timeseries.ewmaFixedPoint(toy, bucketNs = 10L, alphaDen = 5L)
      .orderBy("event_type", "bucket")
      .select("event_type", "bucket", "cents", "ewma_cents")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, 3000L, 3000L), ("a", 1L, 3000L, 3000L),
      ("a", 3L, 4000L, 3200L), ("b", 2L, 700L, 700L)))
    // flooring: cents 0 after prev 1 -> (0 + 4*1)/5 floors to 0
    val f = Seq(("k", 1L, 1L, 0.01), ("k", 11L, 2L, 0.0))
      .toDF("event_type", "ts_ns", "event_id", "value")
    val got = Timeseries.ewmaFixedPoint(f, bucketNs = 10L, alphaDen = 5L)
      .orderBy("bucket").select("ewma_cents").as[Long].collect().toSeq
    assert(got === Seq(1L, 0L))
  }

  test("acf matches a driver-side fold; constant series yields null") {
    // key "a": counts over dense grid = [2,1,0,1]; key "c": constant 1s
    val ev = toy.unionAll(Seq(
      ("c", 5L, 9L, 1.0), ("c", 15L, 10L, 1.0), ("c", 25L, 11L, 1.0)
    ).toDF("event_type", "ts_ns", "event_id", "value"))
    val got = Timeseries.acf(ev, bucketNs = 10L, maxLag = 2)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    def ref(xs: Seq[Double], h: Int): Double = {
      val m = xs.sum / xs.length
      val num = (h until xs.length).map(t => (xs(t) - m) * (xs(t - h) - m)).sum
      val den = xs.map(x => (x - m) * (x - m)).sum
      math.rint(num / den * 1e9) / 1e9
    }
    val xs = Seq(2.0, 1.0, 0.0, 1.0)
    assert(got(("a", 1L)) === Some(ref(xs, 1)))
    assert(got(("a", 2L)) === Some(ref(xs, 2)))
    // constant series: zero variance -> null, never NaN
    assert(got(("c", 1L)) === None && got(("c", 2L)) === None)
    // single-bucket key: no lag pairs exist at all
    assert(!got.contains(("b", 1L)))
  }

  test("trendLine: exact slope on a planted line, constant series r2 null, single bucket all null") {
    // key "L": counts 1,2,3,4 per bucket (perfect line slope 1)
    val line = (0 until 4).flatMap(b => (0 to b).map(i =>
      ("L", b * 10L + i, (b * 10 + i).toLong, 1.0)))
    // key "C": constant 2 per bucket -> slope 0, r2 undefined
    val const = (0 until 3).flatMap(b => Seq(
      ("C", b * 10L + 1, 100L + b * 10 + 1, 1.0),
      ("C", b * 10L + 2, 100L + b * 10 + 2, 1.0)))
    // key "S": one bucket -> no x variance at all
    val single = Seq(("S", 5L, 999L, 1.0))
    val ev = (line ++ const ++ single)
      .toDF("event_type", "ts_ns", "event_id", "value")
    val got = Timeseries.trendLine(ev, bucketNs = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got("L") === ((4L, Some(1.0), Some(1.0), Some(1.0))))
    assert(got("C") === ((3L, Some(0.0), Some(2.0), None)))
    assert(got("S") === ((1L, None, None, None)))
  }

  test("decompose: components re-sum to y within rounding; seasonal means sum to ~0 per key") {
    val got = Timeseries.decompose(
      graft.sources.Tables.events(spark, GraftTestSession.sf)
        .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000")),
      bucketNs = 3600L * 1000 * 1000 * 1000)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      if (!r.isNullAt(3) && !r.isNullAt(4)) {
        val y = r.getLong(2).toDouble
        val re = y - r.getDouble(3) - r.getDouble(4) - r.getDouble(5)
        assert(re.abs <= 3e-6, s"decomposition leaked $re at $r")
      }
    }
    // seasonal components average the detrended series, so per key
    // they must sum to ~0 over a whole number of days
    val byKey = got.groupBy(_.getString(0))
    byKey.foreach { case (k, rows) =>
      val s = rows.filterNot(_.isNullAt(4)).map(_.getDouble(4)).sum
      assert(s.abs / rows.length <= 1e-3, s"seasonal bias for $k: $s")
    }
  }

  test("changepoint: planted level shift found at the boundary, earliest-bucket tie") {
    // key "p": 3 buckets of 1 event then 3 buckets of 5 events —
    // CUSUM peaks at the last low bucket (bucket 2)
    val rows = (0 until 3).map(b => ("p", b * 10L, b * 100L + 1L, 1.0)) ++
      (3 until 6).flatMap(b => (0 until 5).map(i =>
        ("p", b * 10L + i, b * 100L + i, 1.0)))
    val got = Timeseries.changepoint(
      rows.toDF("event_type", "ts_ns", "event_id", "value"), bucketNs = 10L)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // deviations d_t = |6*cy - t*18|: t=1..6 cy=1,2,3,8,13,18 ->
    // |6-18|=12, |12-36|=24, |18-54|=36, |48-72|=24, |78-90|=12, 0
    assert(got("p") === ((6L, 2L, 6.0))) // dmax 36 / n 6
  }

  test("resample heavy pass partial-aggregates before the exchange") {
    val events = graft.sources.Tables.events(spark, GraftTestSession.sf)
      .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))
    val df = Timeseries.resample(events, 3600L * 1000 * 1000 * 1000)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // map-side combine: a partial HashAggregate must appear below the
    // (event_type, bucket) exchange
    assert(plan.contains("HashAggregate"), plan.take(800))
    assert("partial_count|partial_sum|Partial".r
      .findFirstIn(plan).isDefined || plan.contains("HashAggregate"))
  }
}
