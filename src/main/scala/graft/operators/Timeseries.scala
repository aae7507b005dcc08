package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Time-series resampling/analytics over the event stream — the
  * operator family a metrics/feature pipeline runs right after
  * sessionization: bucket to a fixed grid, fill the gaps, carry the
  * last observation forward, summarize bars, flag anomalous buckets.
  *
  * Reference anchor: keenwa's window/aggregate surface
  * (src/operators/scalar/aggregates.rs) covers the per-bucket math;
  * the gap-fill spine is the engine-completeness addition every
  * telemetry user writes by hand (generate_series + LEFT JOIN +
  * last-observation-carried-forward).
  *
  * SCALE: the heavy pass in every entry is ONE partial-aggregable
  * groupBy((key, bucket)) ∝ events — map-side combine collapses each
  * task to its distinct buckets before the exchange. Everything after
  * (spine generation, gap join, forward-fill window, anomaly flags)
  * runs on BUCKET-sized data: bounded by keys × time-range/grid, not
  * by event volume, so a 100 TB month of events still forward-fills
  * over ~720 rows per key. The per-key window is therefore NOT the
  * ss01 straggler case — its partition length is the hour count, not
  * a hot user's event count.
  *
  * DETERMINISM: bucket ids are integer floor-divisions of the
  * µs-floored ns epoch (see [[Sessionize]] on the two shipped ts
  * generations); sums go through decimal; open/close are value
  * PASSTHROUGHS picked by an exact (ts, event_id) total order — no
  * float arithmetic anywhere an engine could round differently.
  */
object Timeseries {
  type QFn = (SparkSession, String) => DataFrame

  private val HourNs = 3600L * 1000L * 1000L * 1000L
  private val DayNs = 24L * HourNs

  /** Exact sum: accumulate as decimal (order-insensitive), emit double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** events with ts_ns µs-floored for oracle parity (DuckDB reads the
    * NANOS parquet generation at µs resolution). */
  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))

  /** Resample to a fixed `bucketNs` grid per key, with a dense spine
    * (every bucket between the key's first and last observation) and
    * last-observation-carried-forward over the gaps. Output one row
    * per (key, bucket): `n` events (0 on gaps), `total` (null on
    * gaps), `filled` = ffilled total.
    *
    * Shape: groupBy((key, bucket)) ∝ rows → per-key bounds →
    * `sequence()` spine (bucket-sized) → left join aggregates onto the
    * spine → one per-key ordered window for the carry-forward. The
    * spine join keys are (key, bucket) — co-partitioned with the agg
    * output, and AQE broadcasts the spine side when the time range is
    * small.
    */
  def resample(events: DataFrame, bucketNs: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns",
      valCol: String = "value"): DataFrame = {
    val a = events
      // integer floor-div: a double-division bucket id would round at
      // 2^53 — ns epochs live above it
      .select(col(keyCol), expr(s"$tsCol div ${bucketNs}L").as("bucket"),
        col(valCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col(valCol)).as("total"))
    val spine = a.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(a, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("total"),
        last(col("total"), ignoreNulls = true).over(w).as("filled"))
  }

  /** OHLC bars: per (key, bucket) open/high/low/close/n/total of
    * `valCol`, where open/close are the first/last values in the
    * exact (ts, id) total order. ONE partial-aggregable groupBy — no
    * per-key window, no sort: min_by/max_by over the unique
    * (ts, id) struct pick the endpoints map-side, so a hot key costs
    * a merge of per-task candidates, never a single-task sort.
    */
  def ohlcBars(events: DataFrame, bucketNs: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns",
      idCol: String = "event_id", valCol: String = "value"): DataFrame = {
    val ord = struct(col(tsCol), col(idCol))
    events
      .select(col(keyCol), expr(s"$tsCol div ${bucketNs}L").as("bucket"),
        col(tsCol), col(idCol), col(valCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min_by(col(valCol), ord).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), ord).as("close"),
        dsum(col(valCol)).as("total"))
  }

  /** Anomalous-bucket detection with INTEGER-EXACT thresholds: flag
    * every (key, bucket) whose event count exceeds `num/den` × the
    * key's mean bucket count, comparing n·n_buckets·den > total·num —
    * cross-multiplied BIGINTs, no float mean, so the flag replays
    * bit-identically on any engine. Mean is over the DENSE bucket
    * range (gaps count as 0 via n_buckets = b1−b0+1), which is what
    * "3× the average hour" means on a wall-clock grid.
    *
    * Two partial-aggregable passes over bucket-sized data (per-bucket
    * counts, then per-key totals joined back); the broadcast-sized
    * per-key stats ride a plain join.
    */
  def anomalousBuckets(events: DataFrame, bucketNs: Long,
      num: Long, den: Long, keyCol: String = "event_type",
      tsCol: String = "ts_ns"): DataFrame = {
    val counts = events
      .select(col(keyCol), expr(s"$tsCol div ${bucketNs}L").as("bucket"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
    anomalousFromCounts(counts, num, den, keyCol)
  }

  /** The anomaly flag over PRE-AGGREGATED (key, bucket, n) counts —
    * the shared back half of [[anomalousBuckets]] and the streaming
    * twin ([[graft.streaming.AnomalyStream]]), whose state store
    * already holds merged counts. `counts` must be unique per
    * (key, bucket).
    */
  def anomalousFromCounts(counts: DataFrame, num: Long, den: Long,
      keyCol: String = "event_type"): DataFrame = {
    val stats = counts.groupBy(col(keyCol))
      .agg(sum(col("n")).as("n_total"),
        (max(col("bucket")) - min(col("bucket")) + lit(1L)).as("n_buckets"))
    counts.join(stats, Seq(keyCol))
      .filter(col("n") * col("n_buckets") * lit(den) >
        col("n_total") * lit(num))
      .select(col(keyCol), col("bucket"), col("n"), col("n_total"),
        col("n_buckets"))
  }

  /** Rank-based lower median election over a (key, v) frame: the
    * smallest v whose cumulative count reaches ceil(n/2) — a REAL
    * data value, integer comparisons only, elected over the
    * HISTOGRAM (t20's skew-proof shape: the only value-sized
    * exchange is the partial-aggregable histogram groupBy). */
  private def medianOf(kv: DataFrame, keyCols: Seq[String], vCol: String,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = kv.groupBy((keyCols :+ vCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    hist
      .withColumn("_cum", sum(col("_c")).over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(vCol)))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("_cum") * 2 >= col("_n"))
      .groupBy(keyCols.map(col): _*).agg(min(col(vCol)).as(out))
  }

  /** Robust outliers per key: |x − median| > k · MAD, everything in
    * scaled integers (values → cents) so the flag is engine-exact.
    * Median and MAD (median absolute deviation) are both rank-based
    * lower medians elected via [[medianOf]] — two histogram passes,
    * a broadcast stats join, one map-only flag filter; no per-key
    * sort anywhere. A zero MAD (over half the values identical)
    * degenerates the rule to "any deviation flags", which is the
    * honest reading of k·0.
    */
  def madOutliers(events: DataFrame, k: Long,
      keyCol: String = "event_type"): DataFrame = {
    val cents = events.select(col("event_id"), col(keyCol),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val med = medianOf(cents, Seq(keyCol), "cents", "med")
    val dev = cents.join(broadcast(med), Seq(keyCol))
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = medianOf(dev, Seq(keyCol), "dev", "mad")
    dev.join(broadcast(mad), Seq(keyCol))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col("event_id"), col(keyCol), col("cents"),
        col("med"), col("mad"))
  }

  /** Seasonally-adjusted anomalies: flag every (key, day, hour-of-
    * day) whose count exceeds `num/den` × that key's MEDIAN count for
    * the same hour-of-day across days — "3× its usual 9am", not "3×
    * the flat average" (ts03), so a daily-periodic load pattern stops
    * drowning real spikes. The baseline is [[medianOf]]'s rank-
    * elected lower median per (key, hod) — integer end-to-end.
    *
    * SCALE: one partial-aggregable (key, day, hod) count ∝ events,
    * then everything (median histograms, the stats join, the flag)
    * runs on day-hour-sized data (keys × days × 24), never event
    * volume. Hours with ZERO events are absent from the count frame
    * and therefore from the median population — the baseline is
    * "median over hours that had traffic", documented behavior (a
    * dense-spine variant would compose [[resample]] first).
    */
  def seasonalAnomalies(events: DataFrame, num: Long, den: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns")
      : DataFrame = {
    val c = events.select(col(keyCol),
        expr(s"$tsCol div ${DayNs}L").as("day"),
        expr(s"($tsCol div ${HourNs}L) % 24").as("hod"))
      .groupBy(col(keyCol), col("day"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val med = medianOf(c, Seq(keyCol, "hod"), "n", "med")
    c.join(med, Seq(keyCol, "hod"))
      .filter(col("n") * lit(den) > col("med") * lit(num))
      .select(col(keyCol), col("day"), col("hod"), col("n"), col("med"))
  }

  /** Pearson correlation between TWO keys' per-bucket count series —
    * "do clicks and purchases move together hour by hour?". The
    * series live on the SHARED dense grid (min..max bucket across
    * both keys; absent hours count 0 — a gap in one series is signal,
    * not missing data). Counts are integers, so every sufficient
    * statistic (Σx, Σx², Σxy) is an exact BIGINT; the only float is
    * [[Quality.columnMoments]]'s fixed-order corr expression (round 9,
    * engine-identical).
    *
    * SCALE: one event-sized partial-aggregable (bucket) count with
    * both keys pivoted in the same pass, a bucket-sized spine join,
    * one global agg. Output is a single row.
    */
  /** Rolling (sliding-window) aggregates over the DENSE resampled
    * grid: for every (key, bucket) of [[resample]]'s spine, the
    * trailing `width`-bucket sum/avg of the per-bucket totals and
    * event-count extremes — the moving-average family every
    * dashboard layers on the raw grid. Gap buckets sit in the frame
    * with NULL totals (excluded from sum/avg via the non-null count
    * — the honest "average of observed hours"), and their n=0 DOES
    * count toward the min (a gap is a real zero-traffic hour).
    * Decimal-exact sums; avg is ONE rounded division of the exact
    * sum by the frame's observed count.
    *
    * SCALE: inherits resample's budget (one event-volume groupBy,
    * everything after bucket-sized); the rolling frames add
    * partition-LOCAL window passes over the same (key, bucket) sort
    * — no new exchange (same-key windows reuse the partitioning).
    */
  def rollingAgg(events: DataFrame, bucketNs: Long, width: Int,
      keyCol: String = "event_type", tsCol: String = "ts_ns",
      valCol: String = "value"): DataFrame = {
    require(width >= 1, s"need width >= 1, got $width")
    val base = resample(events, bucketNs, keyCol, tsCol, valCol)
      // re-derive the EXACT decimal per-bucket total (resample emits
      // the §4 double rendering; rolling sums must accumulate decimal)
      .withColumn("td", col("total").cast(DecimalType(18, 2)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(-(width - 1), Window.currentRow)
    base.select(col(keyCol), col("bucket"), col("n"), col("total"),
      sum(col("td")).over(w).cast("double").as("roll_sum"),
      count(col("td")).over(w).as("roll_obs"),
      min(col("n")).over(w).as("roll_min_n"),
      max(col("n")).over(w).as("roll_max_n"),
      when(count(col("td")).over(w) > 0L,
        round(sum(col("td")).over(w).cast("double") /
          count(col("td")).over(w).cast("double"), 6)).as("roll_avg"))
  }

  /** Per-key EWMA over the bucketed series, in INTEGER FIXED-POINT:
    * cents_t = bucket total in cents (exact — the decimal sum has
    * scale 2, so ×100 is integral), and
    *   ewma_0 = cents_0
    *   ewma_t = (cents_t + (alphaDen−1)·ewma_{t−1}) floorDiv alphaDen
    * i.e. α = 1/alphaDen with the division floored each step. A
    * float EWMA is fine in production, but this entry's contract is
    * ENGINE-EXACT replay (the gate compares bit-for-bit), and a
    * float recursion is at the mercy of FMA contraction / evaluation
    * order; integer fixed-point replays identically everywhere.
    * Gaps are skipped (irregular-series EWMA over OBSERVED buckets —
    * feed [[resample]]'s filled spine instead for grid semantics).
    *
    * SCALE: the only event-volume pass is the partial-aggregable
    * (key, bucket) groupBy. The fold itself is inherently sequential
    * per key — so it runs as ONE repartition(key) +
    * sortWithinPartitions + mapPartitions state machine over
    * BUCKET-sized data (rows per key = time-range/grid, ~10²–10³, not
    * event volume; keys spread across tasks, state = 2 longs). The
    * same shape scales to 100 TB of events because the events never
    * reach the fold — only their bucket totals do.
    */
  def ewmaFixedPoint(events: DataFrame, bucketNs: Long, alphaDen: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns",
      valCol: String = "value"): DataFrame =
    ewmaFromCents(
      events
        .select(col(keyCol).cast("string").as("k"),
          expr(s"$tsCol div ${bucketNs}L").as("bucket"), col(valCol))
        .groupBy(col("k"), col("bucket"))
        .agg((sum(col(valCol).cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents")),
      alphaDen, keyCol)

  /** The fold half of [[ewmaFixedPoint]], over PRE-AGGREGATED
    * (k STRING, bucket, cents) rows (unique per (k, bucket)) — shared
    * with the streaming twin ([[graft.streaming.EwmaStream]]), whose
    * partial store already holds merged bucket totals. Re-running the
    * whole fold per publish is the stream's correctness lever: a late
    * event shifts every LATER bucket's ewma, and the fold is
    * bucket-sized, so recomputing it is cheaper than any incremental
    * patching would be safe.
    */
  def ewmaFromCents(cents: DataFrame, alphaDen: Long,
      keyCol: String = "event_type"): DataFrame = {
    require(alphaDen >= 2, s"alphaDen must be >= 2, got $alphaDen")
    val spark = cents.sparkSession
    import spark.implicits._
    cents
      .select(col("k"), col("bucket"), col("cents"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("bucket"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curKey: String = null
        var prev = 0L
        it.map { case (k, b, c) =>
          val e =
            if (k != curKey) c
            else Math.floorDiv(c + (alphaDen - 1) * prev, alphaDen)
          curKey = k
          prev = e
          (k, b, c, e)
        }
      }
      .toDF(keyCol, "bucket", "cents", "ewma_cents")
      // one deterministic double op off the exact integer
      .withColumn("ewma", col("ewma_cents") / 100.0)
  }

  /** Holt double-exponential smoothing (level + linear trend) per key
    * over the bucketed series, in INTEGER FIXED-POINT — the
    * one-step-ahead forecaster a metrics pipeline runs where ts08's
    * single EWMA lags every ramp. α = β = 1/den as floored-cents
    * recurrences:
    *   l_t = ⌊(c_t + (αden−1)·(l_{t−1}+b_{t−1})) / αden⌋
    *   b_t = ⌊((l_t − l_{t−1}) + (βden−1)·b_{t−1}) / βden⌋
    * (l_1 = c_1, b_1 = 0). Float recursions are at the mercy of FMA
    * contraction/eval order — integer division replays
    * bit-identically. GOTCHA measured here: the trend register goes
    * NEGATIVE, and DuckDB's `//` TRUNCATES toward zero ((-7)//5 = -1)
    * while Math.floorDiv floors (-2) — ts08 never sees the
    * difference because EWMA stays positive. Both recurrences
    * therefore use TRUNCATING division (JVM `/`, DuckDB `//` — each
    * engine's native integer division), so the oracle replays the
    * EXACT fold as a recursive CTE over per-key row_number chains
    * (bucket-count-deep, never event-deep — the ts08 discipline,
    * now with two state registers).
    *
    * SCALE: the only event-volume pass is the (key, bucket) groupBy;
    * the fold runs repartition(key) + sortWithinPartitions +
    * mapPartitions over BUCKET-sized series, state = 2 longs.
    */
  def holtFixedPoint(events: DataFrame, bucketNs: Long, alphaDen: Long,
      betaDen: Long, keyCol: String = "event_type",
      tsCol: String = "ts_ns", valCol: String = "value"): DataFrame =
    holtFromCents(
      events
        .select(col(keyCol).cast("string").as("k"),
          expr(s"$tsCol div ${bucketNs}L").as("bucket"), col(valCol))
        .groupBy(col("k"), col("bucket"))
        .agg((sum(col(valCol).cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents")),
      alphaDen, betaDen, keyCol)

  /** The fold half of [[holtFixedPoint]], over PRE-AGGREGATED
    * (k STRING, bucket, cents) rows (unique per (k, bucket)) —
    * [[ewmaFromCents]]'s split, shared with the streaming twin
    * ([[graft.streaming.HoltStream]]) whose partial store already
    * holds merged bucket totals: the two-register fold is key-local
    * and bucket-sized, so the stream re-runs it end to end for
    * touched keys (a late event shifts every later level/trend). */
  def holtFromCents(cents: DataFrame, alphaDen: Long, betaDen: Long,
      keyCol: String = "event_type"): DataFrame = {
    require(alphaDen >= 2 && betaDen >= 2,
      s"need alphaDen/betaDen >= 2, got $alphaDen/$betaDen")
    val spark = cents.sparkSession
    import spark.implicits._
    cents
      .select(col("k"), col("bucket"), col("cents"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("bucket"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curKey: String = null
        var l = 0L
        var b = 0L
        it.map { case (k, bk, c) =>
          if (k != curKey) { curKey = k; l = c; b = 0L }
          else {
            val lPrev = l
            // truncating division (see docstring: DuckDB // truncates)
            l = (c + (alphaDen - 1) * (l + b)) / alphaDen
            b = ((l - lPrev) + (betaDen - 1) * b) / betaDen
          }
          (k, bk, c, l, b)
        }
      }
      .toDF(keyCol, "bucket", "cents", "level_cents", "trend_cents")
      // one deterministic double op off the exact integers
      .withColumn("forecast_next",
        (col("level_cents") + col("trend_cents")) / 100.0)
  }

  def seriesCorr(events: DataFrame, bucketNs: Long, keyA: String,
      keyB: String, keyCol: String = "event_type",
      tsCol: String = "ts_ns"): DataFrame = {
    val c = events.filter(col(keyCol).isin(keyA, keyB))
      .select(expr(s"$tsCol div ${bucketNs}L").as("b"), col(keyCol))
      .groupBy(col("b"))
      .agg(sum(when(col(keyCol) === keyA, 1L).otherwise(0L)).as("x"),
        sum(when(col(keyCol) === keyB, 1L).otherwise(0L)).as("y"))
    val spine = c.agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(explode(sequence(col("b0"), col("b1"))).as("b"))
    val j = spine.join(c, Seq("b"), "left")
      .select(coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val m = j.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    m.withColumn("corr", round(
      (col("n").cast("double") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (sqrt(col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
        sqrt(col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))), 9))
  }

  /** Sample autocorrelation of each key's bucket-count series at lags
    * 1..`maxLag` — THE seasonality/memory diagnostic (a daily cycle
    * shows as a peak at lag 24 on hourly buckets). Uses the full-series
    * mean and variance (textbook ACF):
    * ρ(h) = Σ_{t>h}(x_t−x̄)(x_{t−h}−x̄) / Σ(x_t−x̄)².
    *
    * DETERMINISM: every aggregate is an exact BIGINT sum over the
    * dense [[resample]] grid (counts, their squares, lagged cross
    * products — expanded so the mean never enters a distributed sum);
    * doubles appear only in the final per-(key,lag) scalar, so
    * addition order cannot move bits (§4). Constant series (zero
    * variance) yield null, not NaN.
    *
    * SCALE: the grid is bucket-sized (time-range, not event-count);
    * lag pairs come from a generator explode (grid×maxLag rows, no
    * join against a lag table) and one partial-aggregable
    * (key, lag) groupBy; the only event-volume pass is resample's.
    */
  def acf(events: DataFrame, bucketNs: Long, maxLag: Int,
      keyCol: String = "event_type", tsCol: String = "ts_ns"): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val grid = resample(events, bucketNs, keyCol, tsCol)
      .select(col(keyCol), col("bucket"), col("n").as("x"))
    val stats = grid.groupBy(col(keyCol)).agg(count(lit(1)).as("nb"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
    val pairs = grid
      .select(col(keyCol), col("bucket"), col("x"),
        explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
      .select(col(keyCol), col("lag"), (col("bucket") + col("lag")).as("bucket"),
        col("x").as("xl"))
      .join(grid, Seq(keyCol, "bucket"))
    val agg = pairs.groupBy(col(keyCol), col("lag"))
      .agg(sum(col("x") * col("xl")).as("p"), sum(col("x")).as("a"),
        sum(col("xl")).as("b"), count(lit(1)).as("m"))
    val n = col("nb").cast("double")
    val num = col("p").cast("double") -
      col("sx").cast("double") * (col("a") + col("b")).cast("double") / n +
      col("m").cast("double") * col("sx").cast("double") *
        col("sx").cast("double") / (n * n)
    val den = col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / n
    agg.join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("lag"),
        when(den > 0.0, round(num / den, 9)).as("acf"))
  }

  /** Per-key OLS trend line of the bucket-count series: slope,
    * intercept and R² of count ~ bucket index over the dense
    * [[resample]] grid — "is traffic growing and how fast", the
    * one-number trend a dashboard wants next to [[acf]]'s seasonality.
    * x is re-based to the key's first bucket so Σx/Σx² stay small and
    * the oracle replays exactly.
    *
    * DETERMINISM: all five sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) are exact BIGINT sums over the bucket-sized grid;
    * slope/intercept/R² are fixed-order double expressions off them,
    * rounded at 9. Zero-variance x (single bucket) or y (constant
    * counts, for R²) yield nulls, never NaN.
    *
    * SCALE: resample's event-volume pass + ONE partial-aggregable
    * groupBy(key) over the bucket-sized grid.
    */
  def trendLine(events: DataFrame, bucketNs: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns"): DataFrame = {
    val grid = resample(events, bucketNs, keyCol, tsCol)
      .select(col(keyCol), col("bucket"), col("n").as("y"))
    val based = grid
      .withColumn("x", col("bucket") -
        min(col("bucket")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))))
    val s = based.groupBy(col(keyCol)).agg(
      count(lit(1)).as("nb"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val covN = d("nb") * d("sxy") - d("sx") * d("sy")
    val varXN = d("nb") * d("sxx") - d("sx") * d("sx")
    val varYN = d("nb") * d("syy") - d("sy") * d("sy")
    s.select(col(keyCol), col("nb"),
      when(varXN > 0.0, round(covN / varXN, 9)).as("slope"),
      when(varXN > 0.0,
        round((d("sy") - covN / varXN * d("sx")) / d("nb"), 9))
        .as("intercept"),
      when(varXN > 0.0 && varYN > 0.0,
        round(covN * covN / (varXN * varYN), 9)).as("r2"))
  }

  /** Additive seasonal decomposition of the bucket-count series:
    * y = trend + seasonal + residual per (key, bucket) — [[trendLine]]'s
    * OLS line as the trend, the hour-of-day mean of the detrended
    * series as the seasonal component (classical decomposition with a
    * linear trend), and what's left as the residual an anomaly rule
    * can threshold.
    *
    * DETERMINISM: fitted/detrended values are fixed-order doubles off
    * the 9dp-rounded slope/intercept, rounded at 6; the seasonal MEAN
    * is sum(decimal(18,6))/count — the decimal sum is exact, so the
    * mean is one fixed-order division, never a float accumulation.
    * Keys with no trend (single bucket) carry nulls through.
    *
    * SCALE: resample's event pass + bucket-sized frames throughout;
    * the seasonal groupBy is (key × 24)-sized.
    */
  def decompose(events: DataFrame, bucketNs: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns"): DataFrame = {
    val grid = resample(events, bucketNs, keyCol, tsCol)
      .select(col(keyCol), col("bucket"), col("n").as("y"))
    val based = grid.withColumn("x", col("bucket") -
      min(col("bucket")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol))))
    val tl = trendLine(events, bucketNs, keyCol, tsCol)
      .select(col(keyCol), col("slope"), col("intercept"))
    val fitted = based.join(tl, Seq(keyCol))
      .withColumn("trend",
        round(col("intercept") + col("slope") * col("x").cast("double"), 6))
      .withColumn("r", round(col("y").cast("double") - col("trend"), 6))
      .withColumn("hod", pmod(col("bucket"), lit(24L)))
      .withColumn("rd", col("r").cast(DecimalType(18, 6)))
    val seasonal = fitted.groupBy(col(keyCol), col("hod"))
      .agg(sum(col("rd")).as("srd"), count(col("rd")).as("crd"))
      .select(col(keyCol), col("hod"),
        when(col("crd") > 0L, round(col("srd").cast("double") /
          col("crd").cast("double"), 6)).as("seasonal"))
    fitted.join(seasonal, Seq(keyCol, "hod"))
      .select(col(keyCol), col("bucket"), col("y"), col("trend"),
        col("seasonal"),
        round(col("r") - col("seasonal"), 6).as("resid"))
  }

  /** CUSUM changepoint detection: per key, the bucket where the
    * cumulative deviation from the series mean peaks — the classic
    * "where did the level shift" estimator (the argmax of |Σ_{i≤t}
    * (y_i − ȳ)| is the max-likelihood single changepoint for a mean
    * shift). The mean never materializes: the statistic is scaled by
    * n to d_t = n·Σ_{i≤t} y_i − t·S — EXACT BIGINTs (one cum-sum
    * window over the bucket-sized grid), so the argmax is an integer
    * comparison with the earliest-bucket tiebreak; the reported
    * statistic d_max/n is one rounded division at the end.
    *
    * SCALE: resample's event pass; the cum-sum window and argmax are
    * per-key bucket-sized; output one row per key.
    */
  def changepoint(events: DataFrame, bucketNs: Long,
      keyCol: String = "event_type", tsCol: String = "ts_ns"): DataFrame = {
    val grid = resample(events, bucketNs, keyCol, tsCol)
      .select(col(keyCol), col("bucket"), col("n").as("y"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAllK = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val cum = grid
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("cy", sum(col("y")).over(w))
      .withColumn("nb", count(lit(1)).over(wAllK))
      .withColumn("s", sum(col("y")).over(wAllK))
      .withColumn("d", abs(col("nb") * col("cy") - col("t") * col("s")))
    cum.groupBy(col(keyCol))
      .agg(max(col("nb")).as("nb"),
        max(struct(col("d"), (-col("bucket")).as("negb"))).as("best"))
      .select(col(keyCol), col("nb"),
        (-col("best.negb")).as("change_bucket"),
        round(col("best.d").cast("double") / col("nb").cast("double"), 6)
          .as("cusum_max"))
  }

  private val tsPrefix = """
      WITH e AS (SELECT event_type, event_id,
                   (epoch_ns(ts) // 1000) * 1000 AS tns, value
                 FROM events)"""

  /** Time-weighted average per key: value_i held over [t_i, t_{i+1});
    * TWA = Σ v_i·(t_{i+1}−t_i) / (t_n−t_0). The irregular-sampling
    * mean — count-weighted avg over-weights bursts; TWA weights by
    * how LONG each value was in force. Exact arithmetic: cents
    * (DECIMAL 18,2) × integer ns durations, decimal-summed; the only
    * float is the final division. The last observation per key
    * carries no duration (no successor) and is excluded — the
    * standard left-closed convention.
    *
    * SCALE: one per-key lead window (parallelism = series count, the
    * ts-family discipline) + one partial-aggregable groupBy.
    */
  def timeWeightedAvg(events: DataFrame,
      keyCol: String = "event_type"): DataFrame = {
    val uw = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_ns"), col("event_id"))
    events.select(col(keyCol), col("ts_ns"), col("event_id"),
        col("value"))
      .withColumn("nxt", lead(col("ts_ns"), 1).over(uw))
      .filter(col("nxt").isNotNull)
      .select(col(keyCol), (col("nxt") - col("ts_ns")).as("dur"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dur")).as("total_ns"),
        sum(col("v") * col("dur")).as("wsum"))
      .select(col(keyCol), col("n_segments"), col("total_ns"),
        round(col("wsum").cast("double") /
          col("total_ns").cast("double"), 6).as("twa"))
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // ---- hourly resample + gap fill + forward fill per event type:
    //      the dashboard/feature grid shape ----
    ("ts01_resample_ffill", (s: SparkSession, d: String) => {
      resample(eventsUs(s, d), HourNs)
        .withColumnRenamed("bucket", "hour_idx")
        .orderBy("event_type", "hour_idx")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS hour_idx,
              count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM e GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(hour_idx) AS b0, max(hour_idx) AS b1
                 FROM a GROUP BY 1),
      spine AS (SELECT event_type, unnest(range(b0, b1 + 1)) AS hour_idx
                FROM bounds),
      j AS (SELECT s.event_type, s.hour_idx, coalesce(a.n, 0) AS n, a.total,
              count(a.total) OVER (PARTITION BY s.event_type
                ORDER BY s.hour_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
            FROM spine s LEFT JOIN a
              ON a.event_type = s.event_type AND a.hour_idx = s.hour_idx)
      SELECT event_type, hour_idx, n, total,
        max(total) OVER (PARTITION BY event_type, grp) AS filled
      FROM j ORDER BY event_type, hour_idx""")),

    // ---- hourly OHLC bars: endpoint picks via the exact (ts, id)
    //      order, one partial-aggregable pass ----
    ("ts02_ohlc_bars", (s: SparkSession, d: String) => {
      ohlcBars(eventsUs(s, d), HourNs)
        .withColumnRenamed("bucket", "hour_idx")
        .orderBy("event_type", "hour_idx")
    }, Some(tsPrefix + """,
      r AS (SELECT event_type, tns // 3600000000000 AS hour_idx, value,
              row_number() OVER (PARTITION BY event_type, tns // 3600000000000
                ORDER BY tns, event_id) AS rn_a,
              row_number() OVER (PARTITION BY event_type, tns // 3600000000000
                ORDER BY tns DESC, event_id DESC) AS rn_d
            FROM e)
      SELECT event_type, hour_idx, count(*) AS n,
        max(CASE WHEN rn_a = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        max(CASE WHEN rn_d = 1 THEN value END) AS close,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM r GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- hourly anomaly flags: hours busier than 2 × the type's
    //      dense-grid mean, integer-exact ----
    ("ts03_anomaly_buckets", (s: SparkSession, d: String) => {
      anomalousBuckets(eventsUs(s, d), HourNs, num = 2L, den = 1L)
        .withColumnRenamed("bucket", "hour_idx")
        .orderBy("event_type", "hour_idx")
    }, Some(tsPrefix + """,
      c AS (SELECT event_type, tns // 3600000000000 AS hour_idx,
              count(*) AS n
            FROM e GROUP BY 1, 2),
      st AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total,
               max(hour_idx) - min(hour_idx) + 1 AS n_buckets
             FROM c GROUP BY 1)
      SELECT c.event_type, c.hour_idx, c.n, st.n_total, st.n_buckets
      FROM c JOIN st USING (event_type)
      WHERE c.n * st.n_buckets * 1 > st.n_total * 2
      ORDER BY c.event_type, c.hour_idx""")),

    // ---- robust per-type outliers: |cents − median| > 5·MAD, both
    //      medians rank-elected over histograms (no per-key sort).
    //      Oracle replays the identical lower-median election ----
    ("ts05_mad_outliers", (s: SparkSession, d: String) => {
      madOutliers(eventsUs(s, d), k = 5L)
        .orderBy("event_id")
    }, Some("""
      WITH c AS (SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      h1 AS (SELECT event_type, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
      m1 AS (SELECT event_type, min(cents) AS med FROM (
               SELECT event_type, cents,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS n
               FROM h1) WHERE cum * 2 >= n GROUP BY event_type),
      d AS (SELECT c.event_id, c.event_type, c.cents, m1.med,
              abs(c.cents - m1.med) AS dev
            FROM c JOIN m1 USING (event_type)),
      h2 AS (SELECT event_type, dev, count(*) AS cnt FROM d GROUP BY 1, 2),
      m2 AS (SELECT event_type, min(dev) AS mad FROM (
               SELECT event_type, dev,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS n
               FROM h2) WHERE cum * 2 >= n GROUP BY event_type)
      SELECT d.event_id, d.event_type, d.cents, d.med, m2.mad
      FROM d JOIN m2 USING (event_type)
      WHERE d.dev > 5 * m2.mad
      ORDER BY d.event_id""")),

    // ---- seasonal anomalies: 2x the key's hour-of-day MEDIAN across
    //      days (rank-elected lower median), so daily periodicity is
    //      the baseline, not noise. Oracle replays the election ----
    ("ts06_seasonal_anomalies", (s: SparkSession, d: String) => {
      seasonalAnomalies(eventsUs(s, d), num = 2L, den = 1L)
        .orderBy("event_type", "day", "hod")
    }, Some(tsPrefix + """,
      c AS (SELECT event_type, tns // 86400000000000 AS day,
              (tns // 3600000000000) % 24 AS hod, count(*) AS n
            FROM e GROUP BY 1, 2, 3),
      h AS (SELECT event_type, hod, n, count(*) AS cnt
            FROM c GROUP BY 1, 2, 3),
      m AS (SELECT event_type, hod, min(n) AS med FROM (
              SELECT event_type, hod, n,
                sum(cnt) OVER (PARTITION BY event_type, hod
                  ORDER BY n) AS cum,
                sum(cnt) OVER (PARTITION BY event_type, hod) AS tot
              FROM h) WHERE cum * 2 >= tot GROUP BY event_type, hod)
      SELECT c.event_type, c.day, c.hod, c.n, m.med
      FROM c JOIN m USING (event_type, hod)
      WHERE c.n * 1 > m.med * 2
      ORDER BY c.event_type, c.day, c.hod""")),

    // ---- hourly click↔purchase correlation on the shared dense
    //      grid: exact BIGINT moments, one fixed-order double corr ----
    ("ts07_series_corr", (s: SparkSession, d: String) => {
      seriesCorr(eventsUs(s, d), HourNs, "click", "purchase")
    }, Some(tsPrefix + """,
      c AS (SELECT tns // 3600000000000 AS b,
              sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
              sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
            FROM e WHERE event_type IN ('click', 'purchase') GROUP BY 1),
      g AS (SELECT unnest(generate_series((SELECT min(b) FROM c),
                                          (SELECT max(b) FROM c))) AS b),
      j AS (SELECT coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
            FROM g LEFT JOIN c USING (b)),
      m AS (SELECT count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y * y) AS BIGINT) AS syy,
              CAST(sum(x * y) AS BIGINT) AS sxy
            FROM j)
      SELECT n, sx, sy, sxx, syy, sxy,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
          AS corr
      FROM m""")),

    // ---- daily EWMA per event type, integer fixed-point (α = 1/5):
    //      the trend-smoothing dial of every metrics dashboard, made
    //      ENGINE-EXACT by folding in floored cents instead of a
    //      float recursion (which FMA contraction could skew). The
    //      oracle replays the identical fold as a recursive CTE over
    //      the per-key row_number chain (~92 rounds at daily grain —
    //      the recursion is bucket-count-deep, never event-deep) ----
    ("ts08_ewma", (s: SparkSession, d: String) => {
      ewmaFixedPoint(eventsUs(s, d), DayNs, alphaDen = 5L)
        .withColumnRenamed("bucket", "day_idx")
        .orderBy("event_type", "day_idx")
    }, Some("""
      WITH RECURSIVE e AS (SELECT event_type, event_id,
                   (epoch_ns(ts) // 1000) * 1000 AS tns, value
                 FROM events),
      a AS (SELECT event_type, tns // 86400000000000 AS day_idx,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS cents
            FROM e GROUP BY 1, 2),
      b AS (SELECT event_type, day_idx, cents,
              row_number() OVER (PARTITION BY event_type
                ORDER BY day_idx) AS rn
            FROM a),
      r AS (
        SELECT event_type, day_idx, cents, rn, cents AS ewma_cents
        FROM b WHERE rn = 1
        UNION ALL
        SELECT b.event_type, b.day_idx, b.cents, b.rn,
               (b.cents + 4 * r.ewma_cents) // 5
        FROM r JOIN b ON b.event_type = r.event_type
                     AND b.rn = r.rn + 1)
      SELECT event_type, day_idx, cents, ewma_cents,
             ewma_cents / 100.0 AS ewma
      FROM r ORDER BY event_type, day_idx""")),

    // ---- 24-hour rolling window over the dense hourly grid: moving
    //      sum/avg of totals (decimal-exact, avg one rounded
    //      division by the OBSERVED count) + count extremes where a
    //      gap hour is a real zero ----
    ("ts09_rolling", (s: SparkSession, d: String) => {
      rollingAgg(eventsUs(s, d), HourNs, width = 24)
        .withColumnRenamed("bucket", "hour_idx")
        .orderBy("event_type", "hour_idx")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS hour_idx,
              count(*) AS n,
              sum(CAST(value AS DECIMAL(18,2))) AS td
            FROM e GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(hour_idx) AS b0, max(hour_idx) AS b1
                 FROM a GROUP BY 1),
      spine AS (SELECT event_type, unnest(range(b0, b1 + 1)) AS hour_idx
                FROM bounds),
      j AS (SELECT s.event_type, s.hour_idx,
              coalesce(a.n, 0) AS n,
              CAST(a.td AS DECIMAL(18,2)) AS td
            FROM spine s LEFT JOIN a
              ON a.event_type = s.event_type AND a.hour_idx = s.hour_idx)
      SELECT event_type, hour_idx, n, CAST(td AS DOUBLE) AS total,
        CAST(sum(td) OVER w AS DOUBLE) AS roll_sum,
        CAST(count(td) OVER w AS BIGINT) AS roll_obs,
        min(n) OVER w AS roll_min_n,
        max(n) OVER w AS roll_max_n,
        CASE WHEN count(td) OVER w > 0 THEN
          round(CAST(sum(td) OVER w AS DOUBLE)
                / CAST(count(td) OVER w AS DOUBLE), 6)
        END AS roll_avg
      FROM j
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
      ORDER BY event_type, hour_idx""")),

    // ---- autocorrelation of the hourly count series, lags 1..6:
    //      exact-integer moments, doubles only in the final scalar ----
    ("ts10_acf", (s: SparkSession, d: String) => {
      acf(eventsUs(s, d), HourNs, 6)
        .orderBy("event_type", "lag")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS b, count(*) AS x
            FROM e GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(b) AS b0, max(b) AS b1
                 FROM a GROUP BY 1),
      g AS (SELECT s.event_type, s.b, coalesce(a.x, 0) AS x
            FROM (SELECT event_type, unnest(range(b0, b1 + 1)) AS b
                  FROM bounds) s
            LEFT JOIN a ON a.event_type = s.event_type AND a.b = s.b),
      stats AS (SELECT event_type, count(*) AS nb,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(x * x) AS BIGINT) AS sxx
                FROM g GROUP BY 1),
      pairs AS (SELECT gl.event_type, l.lag, gt.x AS x, gl.x AS xl
                FROM g gl
                CROSS JOIN (SELECT unnest(range(1, 7)) AS lag) l
                JOIN g gt ON gt.event_type = gl.event_type
                         AND gt.b = gl.b + l.lag),
      agg AS (SELECT event_type, lag,
                CAST(sum(x * xl) AS BIGINT) AS p,
                CAST(sum(x) AS BIGINT) AS a2,
                CAST(sum(xl) AS BIGINT) AS b2,
                count(*) AS m
              FROM pairs GROUP BY 1, 2)
      SELECT g.event_type, g.lag,
        CASE WHEN CAST(s.sxx AS DOUBLE)
                  - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                    / CAST(s.nb AS DOUBLE) > 0 THEN
          round((CAST(g.p AS DOUBLE)
                 - CAST(s.sx AS DOUBLE) * CAST(g.a2 + g.b2 AS DOUBLE)
                   / CAST(s.nb AS DOUBLE)
                 + CAST(g.m AS DOUBLE) * CAST(s.sx AS DOUBLE)
                   * CAST(s.sx AS DOUBLE)
                   / (CAST(s.nb AS DOUBLE) * CAST(s.nb AS DOUBLE)))
                / (CAST(s.sxx AS DOUBLE)
                   - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                     / CAST(s.nb AS DOUBLE)), 9)
        END AS acf
      FROM agg g JOIN stats s USING (event_type)
      ORDER BY event_type, lag""")),

    // ---- OLS trend of the hourly count series: slope/intercept/R²
    //      off exact integer sufficient statistics ----
    ("ts11_trend", (s: SparkSession, d: String) => {
      trendLine(eventsUs(s, d), HourNs)
        .orderBy("event_type")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS b, count(*) AS y
            FROM e GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(b) AS b0, max(b) AS b1
                 FROM a GROUP BY 1),
      g AS (SELECT s.event_type, s.b - s.b0 AS x, coalesce(a.y, 0) AS y
            FROM (SELECT event_type, b0, unnest(range(b0, b1 + 1)) AS b
                  FROM bounds) s
            LEFT JOIN a ON a.event_type = s.event_type AND a.b = s.b),
      st AS (SELECT event_type, count(*) AS nb,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
             FROM g GROUP BY 1)
      SELECT event_type, nb,
        CASE WHEN CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          THEN round((CAST(nb AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 9)
        END AS slope,
        CASE WHEN CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          THEN round((CAST(sy AS DOUBLE)
                      - (CAST(nb AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * CAST(sx AS DOUBLE))
                     / CAST(nb AS DOUBLE), 9)
        END AS intercept,
        CASE WHEN CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
              AND CAST(nb AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
          THEN round((CAST(nb AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     * (CAST(nb AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / ((CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(nb AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                     9)
        END AS r2
      FROM st ORDER BY event_type""")),

    // ---- seasonal decomposition: y = OLS trend + hour-of-day mean of
    //      the detrended series + residual; seasonal mean via exact
    //      decimal sum / count ----
    ("ts12_decompose", (s: SparkSession, d: String) => {
      decompose(eventsUs(s, d), HourNs)
        .withColumnRenamed("bucket", "hour_idx")
        .orderBy("event_type", "hour_idx")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS b, count(*) AS y
            FROM e GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(b) AS b0, max(b) AS b1
                 FROM a GROUP BY 1),
      g AS (SELECT s.event_type, s.b, s.b - s.b0 AS x, coalesce(a.y, 0) AS y
            FROM (SELECT event_type, b0, unnest(range(b0, b1 + 1)) AS b
                  FROM bounds) s
            LEFT JOIN a ON a.event_type = s.event_type AND a.b = s.b),
      st AS (SELECT event_type, count(*) AS nb,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
             FROM g GROUP BY 1),
      tl AS (SELECT event_type,
        CASE WHEN CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          THEN round((CAST(nb AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 9)
        END AS slope,
        CASE WHEN CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          THEN round((CAST(sy AS DOUBLE)
                      - (CAST(nb AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(nb AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * CAST(sx AS DOUBLE))
                     / CAST(nb AS DOUBLE), 9)
        END AS intercept
        FROM st),
      f AS (SELECT g.event_type, g.b, g.y,
              round(tl.intercept + tl.slope * CAST(g.x AS DOUBLE), 6)
                AS trend,
              round(CAST(g.y AS DOUBLE)
                    - round(tl.intercept + tl.slope * CAST(g.x AS DOUBLE), 6),
                    6) AS r,
              g.b % 24 AS hod
            FROM g JOIN tl USING (event_type)),
      se AS (SELECT event_type, hod,
               CASE WHEN count(CAST(r AS DECIMAL(18,6))) > 0
                 THEN round(CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
                            / count(CAST(r AS DECIMAL(18,6))), 6)
               END AS seasonal
             FROM f GROUP BY 1, 2)
      SELECT f.event_type, f.b AS hour_idx, f.y, f.trend, se.seasonal,
        round(f.r - se.seasonal, 6) AS resid
      FROM f JOIN se USING (event_type, hod)
      ORDER BY f.event_type, hour_idx""")),

    // ---- CUSUM changepoint per key: exact scaled deviations, argmax
    //      with earliest-bucket tiebreak ----
    ("ts13_changepoint", (s: SparkSession, d: String) => {
      changepoint(eventsUs(s, d), HourNs)
        .orderBy("event_type")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS b, count(*) AS y
            FROM e GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(b) AS b0, max(b) AS b1
                 FROM a GROUP BY 1),
      g AS (SELECT s.event_type, s.b, coalesce(a.y, 0) AS y
            FROM (SELECT event_type, unnest(range(b0, b1 + 1)) AS b
                  FROM bounds) s
            LEFT JOIN a ON a.event_type = s.event_type AND a.b = s.b),
      c AS (SELECT event_type, b,
              CAST(row_number() OVER wk AS BIGINT) AS t,
              CAST(sum(y) OVER wk AS BIGINT) AS cy,
              CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nb,
              CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s
            FROM g
            WINDOW wk AS (PARTITION BY event_type ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      d AS (SELECT event_type, b, nb, abs(nb * cy - t * s) AS dv FROM c),
      m AS (SELECT event_type, max(dv) AS dmax FROM d GROUP BY 1)
      SELECT d.event_type, d.nb,
        min(d.b) AS change_bucket,
        round(CAST(m.dmax AS DOUBLE) / CAST(d.nb AS DOUBLE), 6) AS cusum_max
      FROM d JOIN m ON m.event_type = d.event_type AND d.dv = m.dmax
      GROUP BY d.event_type, d.nb, m.dmax
      ORDER BY d.event_type""")),

    // ---- time-weighted average per key: each observation holds its
    //      value until the next one, so irregular sampling can't bias
    //      the mean toward burst periods (the sensor/price-series
    //      average that count-weighted avg gets wrong). Weights are
    //      exact: cents × integer-ns durations decimal-summed; ONE
    //      double division at the end ----
    ("ts14_time_weighted_avg", (s: SparkSession, d: String) => {
      timeWeightedAvg(eventsUs(s, d)).orderBy("event_type")
    }, Some(tsPrefix + """,
      l AS (SELECT event_type, tns, CAST(value AS DECIMAL(18,2)) AS v,
              lead(tns) OVER (PARTITION BY event_type
                ORDER BY tns, event_id) AS nxt
            FROM e),
      seg AS (SELECT event_type, nxt - tns AS dur, v
              FROM l WHERE nxt IS NOT NULL)
      SELECT event_type, count(*) AS n_segments,
        CAST(sum(dur) AS BIGINT) AS total_ns,
        round(CAST(sum(v * dur) AS DOUBLE) /
              CAST(CAST(sum(dur) AS BIGINT) AS DOUBLE), 6) AS twa
      FROM seg GROUP BY 1 ORDER BY 1""")),

    // ---- daily Holt level+trend per event type (α = β = 1/5),
    //      integer fixed-point: the one-step forecaster where a lone
    //      EWMA lags every ramp. Oracle replays the identical
    //      two-register fold as a recursive CTE over per-key
    //      row_number chains (ts08's shape) ----
    ("ts15_holt", (s: SparkSession, d: String) => {
      holtFixedPoint(eventsUs(s, d), DayNs, alphaDen = 5L, betaDen = 5L)
        .withColumnRenamed("bucket", "day_idx")
        .orderBy("event_type", "day_idx")
    }, Some("""
      WITH RECURSIVE e AS (SELECT event_type, event_id,
                   (epoch_ns(ts) // 1000) * 1000 AS tns, value
                 FROM events),
      a AS (SELECT event_type, tns // 86400000000000 AS day_idx,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS cents
            FROM e GROUP BY 1, 2),
      b AS (SELECT event_type, day_idx, cents,
              row_number() OVER (PARTITION BY event_type
                ORDER BY day_idx) AS rn
            FROM a),
      r AS (
        SELECT event_type, day_idx, cents, rn,
               cents AS level_cents, CAST(0 AS BIGINT) AS trend_cents
        FROM b WHERE rn = 1
        UNION ALL
        SELECT b.event_type, b.day_idx, b.cents, b.rn,
          (b.cents + 4 * (r.level_cents + r.trend_cents)) // 5,
          (((b.cents + 4 * (r.level_cents + r.trend_cents)) // 5
              - r.level_cents) + 4 * r.trend_cents) // 5
        FROM r JOIN b ON b.event_type = r.event_type
                     AND b.rn = r.rn + 1)
      SELECT event_type, day_idx, cents, level_cents, trend_cents,
             (level_cents + trend_cents) / 100.0 AS forecast_next
      FROM r ORDER BY event_type, day_idx""")),

    // ---- peak detection on the dense hourly grid: strict local
    //      maxima with integer prominence (count minus the larger
    //      neighbor) ≥ 3 — "which hours actually spiked", the alert
    //      primitive ts03's mean-threshold misses when the baseline
    //      drifts. Gaps are REAL zeros (dense spine), edges excluded
    //      (no one-sided peaks); everything integer over the
    //      bucket-sized grid ----
    ("ts16_peaks", (s: SparkSession, d: String) => {
      val grid = resample(eventsUs(s, d), HourNs)
        .select(col("event_type"), col("bucket"), col("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      grid
        .withColumn("pn", lag(col("n"), 1).over(w))
        .withColumn("nn", lead(col("n"), 1).over(w))
        .filter(col("pn").isNotNull && col("nn").isNotNull &&
          col("n") > col("pn") && col("n") > col("nn") &&
          col("n") - greatest(col("pn"), col("nn")) >= 3)
        .select(col("event_type"), col("bucket").as("hour_idx"),
          col("n"), (col("n") - greatest(col("pn"), col("nn")))
            .as("prominence"))
        .orderBy("event_type", "hour_idx")
    }, Some(tsPrefix + """,
      a AS (SELECT event_type, tns // 3600000000000 AS b,
              count(*) AS n
            FROM e GROUP BY 1, 2),
      sp AS (SELECT event_type, unnest(generate_series(b0, b1)) AS b
             FROM (SELECT event_type, min(b) AS b0, max(b) AS b1
                   FROM a GROUP BY 1)),
      g AS (SELECT sp.event_type, sp.b, coalesce(a.n, 0) AS n
            FROM sp LEFT JOIN a ON a.event_type = sp.event_type
                               AND a.b = sp.b),
      l AS (SELECT event_type, b, n,
              lag(n) OVER (PARTITION BY event_type ORDER BY b) AS pn,
              lead(n) OVER (PARTITION BY event_type ORDER BY b) AS nn
            FROM g)
      SELECT event_type, b AS hour_idx, n,
        CAST(n - greatest(pn, nn) AS BIGINT) AS prominence
      FROM l
      WHERE pn IS NOT NULL AND nn IS NOT NULL
        AND n > pn AND n > nn AND n - greatest(pn, nn) >= 3
      ORDER BY event_type, hour_idx"""))
  )
}
