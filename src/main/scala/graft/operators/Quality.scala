package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Data-quality profiling + constraint validation (the Deequ-shaped
  * surface a 100 TB ingest runs before anything downstream trusts a
  * table): per-column profiles and a declarative constraint suite,
  * each computed in as few passes as the metrics allow.
  *
  * Reference anchor: keenwa's statistics surface
  * (src/statistics/simple.rs) feeds its cost model from per-relation
  * row counts/selectivity; dq01 is the same metric catalog computed
  * AS data (one row per column) so a pipeline can gate on it.
  *
  * SCALE: dq01 is ONE scan — all per-column metrics ride a single
  * Aggregate (the multi-distinct Expand multiplies map-side rows by
  * the distinct-column count, the documented cost of exact
  * n_distinct; swap in approx_count_distinct when ±2% is fine and the
  * Expand disappears). dq02's single-table checks fuse into one scan
  * the same way; the referential check is a key-shuffled anti-join —
  * broadcast when the parent is dim-sized, shuffle-hash past that —
  * and every emitted row is constraint-sized (a handful), never data.
  */
object Quality {
  type QFn = (SparkSession, String) => DataFrame

  /** One profile row per column: (column, n_rows, n_null, n_distinct,
    * min_s, max_s) with min/max rendered to STRINGS by `fmt` so mixed
    * column types share one schema (numeric→plain digits,
    * double→DECIMAL(18,2) string, timestamp→'yyyy-MM-dd HH:mm:ss' —
    * the SURVEY §4 parity renderings).
    */
  def profile(df: DataFrame, cols: Seq[(String, Column => Column)])
      : DataFrame = {
    val aggs = count(lit(1)).as("_nr") +: cols.flatMap { case (c, fmt) =>
      Seq(count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        fmt(min(col(c))).as(s"_min_$c"),
        fmt(max(col(c))).as(s"_max_$c"))
    }
    // scan-parallelism is the CALLER's dial: dq01 spreads its
    // single-row-group full-table input before calling (the
    // multi-distinct Expand otherwise runs in ONE task), while dq03's
    // small filtered cohorts measured FASTER without the extra
    // exchange (r20 A/B: 2.56 -> 3.5s with an unconditional
    // repartition here) — an unconditional spread in the operator
    // penalizes exactly the cohort-profile callers.
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { case (c, _) =>
      struct(lit(c).as("col_name"), col("_nr").as("n_rows"),
        (col("_nr") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_s"), col(s"_max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Declarative constraint checks → one row per constraint:
    * (constraint, violations, passed 0/1). `uniqueKey` /
    * `completeCols` / `predicates` fuse into ONE scan of `df`;
    * each (childCol, parent, parentCol) referential pair adds one
    * anti-join. Constraint rows are unioned tiny frames.
    */
  def checkConstraints(df: DataFrame,
      uniqueKey: Option[String],
      completeCols: Seq[String],
      predicates: Seq[(String, Column)],
      refs: Seq[(String, String, DataFrame, String)]): DataFrame = {
    val named: Seq[(String, Column)] =
      uniqueKey.toSeq.map(k =>
        s"${k}_unique" -> (count(lit(1)) - countDistinct(col(k)))) ++
      completeCols.map(c =>
        s"${c}_complete" -> (count(lit(1)) - count(col(c)))) ++
      predicates.map { case (n, p) =>
        n -> sum(when(!p, 1L).otherwise(0L)) }
    val aggs = named.map { case (n, c) => c.as(n) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val fused = one.select(explode(array(named.map { case (n, _) =>
      struct(lit(n).as("check_name"), col(n).as("violations"))
    }: _*)).as("c")).select(col("c.*"))
    val refRows = refs.map { case (name, childCol, parent, parentCol) =>
      df.select(col(childCol)).filter(col(childCol).isNotNull)
        .join(parent.select(col(parentCol).as(childCol)), Seq(childCol),
          "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    }
    refRows.foldLeft(fused)(_ unionAll _)
      .select(col("check_name"), col("violations"),
        when(col("violations") === 0L, 1L).otherwise(0L).as("passed"))
  }

  /** Pairwise column moments + Pearson correlation in ONE Aggregate
    * over one scan (the ML-feature-stats pass: which numeric columns
    * are redundant / co-vary). Inputs are cast to DECIMAL(18,2) so
    * every sufficient statistic (Σx, Σx², Σxy) is EXACT — the only
    * float arithmetic is the final correlation, computed from those
    * exact sums in one fixed-order double expression (both engines
    * correctly-round each op, so round(·, 9) is replay-stable). The
    * moment outputs are the exact decimals cast back to DOUBLE (§4's
    * money-sum convention — one correctly-rounded cast on each side,
    * bit-identical across engines).
    *
    * SCALE: no shuffle beyond the global-agg reduce (all k·(k+1)/2
    * sums partial-aggregate map-side); output is pair-count rows.
    * Null policy: rows with a null in EITHER column of a pair are
    * excluded from that pair's stats (pairwise deletion) — the n per
    * pair makes that explicit.
    */
  def columnMoments(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    // (r19 measured note: a long-domain "cents" rewrite — products as
    // long multiplies, decimal only at the sum — benched SLOWER here
    // (5.6 → 8.2s at sf0.1, reproduced in an A/B), so the decimal
    // formulation below stays. The per-row decimal products are not
    // this entry's bottleneck.)
    def d(c: String) = col(c).cast(DecimalType(18, 2))
    val aggs = pairs.flatMap { case (x, y) =>
      val both = d(x).isNotNull && d(y).isNotNull
      def s(c: Column, n: String) =
        sum(when(both, c)).cast(DecimalType(38, 6)).cast("double").as(n)
      Seq(count(when(both, lit(1))).as(s"n_${x}_$y"),
        s(d(x), s"sx_${x}_$y"), s(d(y), s"sy_${x}_$y"),
        s(d(x) * d(x), s"sxx_${x}_$y"), s(d(y) * d(y), s"syy_${x}_$y"),
        s(d(x) * d(y), s"sxy_${x}_$y"))
    }
    // profile()'s scan-parallelism note applies with more force here:
    // the k(k+1)/2 decimal products + sums are the whole cost (cor01
    // at sf0.1: 5.5s of cpu in ONE task off a single-row-group file).
    // Decimal sums are exact, so spreading the partials is value-safe.
    val spread = df.select(cols.map(col): _*)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val one = spread.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (x, y) =>
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"n_${x}_$y").as("n"),
        col(s"sx_${x}_$y").as("sum_x"), col(s"sy_${x}_$y").as("sum_y"),
        col(s"sxx_${x}_$y").as("sum_xx"), col(s"syy_${x}_$y").as("sum_yy"),
        col(s"sxy_${x}_$y").as("sum_xy"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .withColumn("corr", round(
        (col("n").cast("double") * col("sum_xy").cast("double") -
          col("sum_x").cast("double") * col("sum_y").cast("double")) /
        (sqrt(col("n").cast("double") * col("sum_xx").cast("double") -
            col("sum_x").cast("double") * col("sum_x").cast("double")) *
          sqrt(col("n").cast("double") * col("sum_yy").cast("double") -
            col("sum_y").cast("double") * col("sum_y").cast("double"))), 9))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic, INTEGER-EXACT:
    * values (already integral — cents, counts, ids) are split into
    * cohorts by boolean `grpCol`; D·n1·n2 = max over distinct values
    * of |count₁(≤v)·n2 − count₂(≤v)·n1| — cross-multiplied BIGINTs,
    * so the statistic replays bit-identically on any engine (the
    * float `ks` is ONE division off the exact integers at the end).
    * Output is one row: (n1, n2, d_num, ks, at_c = the smallest
    * value attaining the max — deterministic tiebreak).
    *
    * SCALE — the distributed prefix sum, with DETERMINISTIC
    * partitioning: the one event-volume pass is the groupBy(value);
    * everything after runs on distinct-value-sized data. The global
    * cumulative count is NOT a single-partition window (the classic
    * KS-at-scale trap) and NOT repartitionByRange (whose sampled
    * boundaries can differ between the two jobs that would need
    * them): values are assigned to `buckets` fixed-width slices of
    * [min, max] — pure arithmetic off a broadcast 1-row min/max
    * frame, so every pass derives the SAME partitioning — then the
    * running sum is a per-bucket parallel window plus broadcast
    * exclusive bucket offsets (a bucket-count-sized window).
    * Fixed-width slices skew only if the value distribution is
    * pathologically concentrated — then raise `buckets`; each slice
    * is still distinct-value-bounded.
    */
  def ksDrift(values: DataFrame, valCol: String, grpCol: String,
      buckets: Int = 256): DataFrame = {
    val d = values
      .groupBy(col(valCol).as("c"))
      .agg(sum(when(col(grpCol), 1L).otherwise(0L)).as("na"),
        sum(when(col(grpCol), 0L).otherwise(1L)).as("nb"))
    val mm = d.agg(min("c").as("cmin"), max("c").as("cmax"),
      sum("na").cast("long").as("n1"), sum("nb").cast("long").as("n2"))
    val bucketed = d.crossJoin(broadcast(mm))
      .withColumn("pid",
        ((col("c") - col("cmin")) * buckets /
          (col("cmax") - col("cmin") + 1)).cast("long"))
    val wIn = Window.partitionBy("pid").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = bucketed
      .withColumn("ia", sum("na").over(wIn))
      .withColumn("ib", sum("nb").over(wIn))
    // exclusive per-bucket offsets: a window over BUCKET-COUNT rows
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketed.groupBy("pid")
      .agg(sum("na").as("ba"), sum("nb").as("bb"))
      .select(col("pid"),
        coalesce(sum("ba").over(wOff), lit(0L)).as("oa"),
        coalesce(sum("bb").over(wOff), lit(0L)).as("ob"))
    val cum = inBucket.join(broadcast(offs), Seq("pid"))
      .withColumn("dd",
        abs((col("ia") + col("oa")) * col("n2") -
          (col("ib") + col("ob")) * col("n1")))
    val m = cum.groupBy().agg(max("dd").as("d_num"))
    cum.join(broadcast(m), col("dd") === col("d_num"))
      .groupBy()
      .agg(max("n1").as("n1"), max("n2").as("n2"),
        max("d_num").as("d_num"), min("c").as("at_c"))
      // empty cohort -> KS undefined -> null (NOT an unguarded
      // division: ANSI mode throws DIVIDE_BY_ZERO even for doubles)
      .withColumn("ks",
        when(col("n1") > 0L && col("n2") > 0L,
          col("d_num").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double"))))
  }

  /** Chi-squared two-sample drift over a CATEGORICAL column — the
    * companion to [[ksDrift]] (continuous): did the category mix
    * shift between cohorts? One row per category with the exact
    * integer contingency moments (observed counts, expected-count
    * NUMERATORS e_i·N = row_total·cohort_total — kept as exact
    * BIGINT products so no float expectation ever materializes) and
    * the cell's chi-squared contribution as ONE fixed-order double
    * expression off those exact integers (each op correctly rounded
    * → engine-identical; round 9 on top). No total emitted: a SUM of
    * float cells is evaluation-order-dependent — consumers sum the
    * (category-count) cells themselves, or read the exact integers.
    *
    * SCALE: one partial-aggregable groupBy(category) over the data;
    * totals ride a broadcast 1-row frame; output is category-sized.
    */
  def chiSquaredDrift(values: DataFrame, catCol: String, grpCol: String)
      : DataFrame = {
    val cells = values
      .groupBy(col(catCol).as("cat"))
      .agg(sum(when(col(grpCol), 1L).otherwise(0L)).as("o1"),
        sum(when(col(grpCol), 0L).otherwise(1L)).as("o2"))
    val tot = cells.agg(sum("o1").cast("long").as("n1"),
      sum("o2").cast("long").as("n2"))
    def term(o: Column, nCohort: Column, r: Column, n: Column): Column = {
      val diff = (o * n - r * nCohort).cast("double")
      val den = (n * r * nCohort).cast("double")
      // cohort empty or category absent -> contribution undefined
      when(den > 0.0, diff * diff / den)
    }
    cells.crossJoin(broadcast(tot))
      .withColumn("r", col("o1") + col("o2"))
      .withColumn("n", col("n1") + col("n2"))
      .select(col("cat"), col("o1"), col("o2"),
        (col("r") * col("n1")).as("e1_num"),
        (col("r") * col("n2")).as("e2_num"),
        col("n").as("n_total"),
        round(term(col("o1"), col("n1"), col("r"), col("n")) +
          term(col("o2"), col("n2"), col("r"), col("n")), 9)
          .as("cell_chi2"))
  }

  /** Population-stability-index drift over a continuous column — the
    * monitoring-dashboard companion to [[ksDrift]] (KS answers "did
    * the distribution move?", PSI answers "by how much, and in which
    * bins"). Fixed-width integer bins over the global [min, max]
    * (dq04's deterministic-slices discipline — the input is integer
    * cents, so bin assignment is exact floor-div, never a float
    * boundary), a DENSE bin spine so add-one (Laplace) smoothing is
    * well-defined on empty bins, and per-bin contribution
    * (p−q)·ln(p/q) computed as ONE fixed-order double expression off
    * exact BIGINT smoothed-share numerators. psi_total is the
    * decimal sum of the rounded cells (order-independent), repeated
    * per row.
    *
    * SCALE: one partial-aggregable groupBy(value) + a bin groupBy;
    * everything after is bins-sized (the over-() window runs on B
    * rows, not data).
    */
  def psiDrift(values: DataFrame, valCol: String, grpCol: String,
      bins: Int = 10): DataFrame =
    psiFromCounts(valueCohortCounts(values, valCol, grpCol), bins)

  /** The (value → cohort counts) histogram both drift tests and the
    * streaming drift monitor fold over: one partial-aggregable
    * groupBy, rows = distinct values. The streaming store keeps
    * exactly these rows per batch partial (counts sum is lossless and
    * associative — the store-fold merge).
    */
  def valueCohortCounts(values: DataFrame, valCol: String,
      grpCol: String): DataFrame =
    values.groupBy(col(valCol).as("c"))
      .agg(sum(when(col(grpCol), 1L).otherwise(0L)).as("na"),
        sum(when(col(grpCol), 0L).otherwise(1L)).as("nb"))

  /** [[psiDrift]] off an already-aggregated (c, na, nb) histogram —
    * the streaming twin publishes this over its folded store. */
  def psiFromCounts(d: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val spark = d.sparkSession
    val mm = d.agg(min("c").as("cmin"), max("c").as("cmax"))
    val occ = d.crossJoin(broadcast(mm))
      .withColumn("bin", expr(s"((c - cmin) * ${bins}L) div (cmax - cmin + 1)"))
      .groupBy("bin").agg(sum("na").as("o1"), sum("nb").as("o2"))
    val spine = spark.range(bins).select(col("id").as("bin"))
    val cells = spine.join(occ, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("o1"), lit(0L)).as("o1"),
        coalesce(col("o2"), lit(0L)).as("o2"))
    val tot = cells.agg(sum("o1").cast("long").as("n1"),
      sum("o2").cast("long").as("n2"))
    val b = lit(bins.toLong)
    val pnum = col("o1") + 1L
    val qnum = col("o2") + 1L
    val pden = col("n1") + b
    val qden = col("n2") + b
    val psiBin = round(
      ((pnum * qden - qnum * pden).cast("double") /
        (pden.cast("double") * qden.cast("double"))) *
      log((pnum * qden).cast("double") / (qnum * pden).cast("double")), 9)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells.crossJoin(broadcast(tot))
      .withColumn("psi_bin", psiBin)
      .withColumn("psi_total", round(
        sum(col("psi_bin").cast(DecimalType(28, 10))).over(wAll)
          .cast("double"), 9))
      .select(col("bin"), col("o1"), col("o2"),
        col("psi_bin"), col("psi_total"))
  }

  /** Benford first-significant-digit audit over a positive integer
    * column — the forensic realness check (fabricated or truncated
    * money values drift off the log distribution). Digit extraction
    * is string-exact off the integer (first char of the decimal
    * rendering — no float log in the bucketing); observed counts and
    * N are exact BIGINTs on a dense 1..9 spine; the expected share
    * log10(1+1/d) and the per-digit deviation/chi² contribution are
    * fixed-order doubles off those integers (dq05's discipline: no
    * float total, consumers sum the 9 cells).
    *
    * SCALE: ONE partial-aggregable groupBy(digit) — 9 groups; spine
    * join and all downstream math are 9-row.
    */
  def benfordDigits(values: DataFrame, valCol: String): DataFrame = {
    val spark = values.sparkSession
    val occ = values.filter(col(valCol) > 0L)
      .select(substring(col(valCol).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val spine = spark.range(1, 10).select(col("id").as("digit"))
    val cells = spine.join(occ, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val tot = cells.agg(sum("n_obs").cast("long").as("n_total"))
    val expP = log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
    val obsP = col("n_obs").cast("double") / col("n_total").cast("double")
    val dev = obsP - expP
    cells.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"), col("n_total"),
        round(expP, 9).as("exp_p"), round(obsP, 9).as("obs_p"),
        round(dev * dev * col("n_total").cast("double") / expP, 9)
          .as("cell_chi2"))
  }

  /** Functional-dependency audit: for each claimed `det → dep`, how
    * many determinant groups carry MORE than one distinct dependent
    * value — the profiling check behind "is this column derivable",
    * key discovery, and denormalization safety. One exact
    * (det, fd)-keyed distinct count per dependency; violations and
    * the worst group's distinct count reported as exact integers.
    *
    * SCALE: per FD one partial-aggregable groupBy(det) over a
    * two-column projection; the union of FD reports is FD-count rows.
    */
  def fdAudit(df: DataFrame, fds: Seq[(String, String, String)]): DataFrame = {
    require(fds.nonEmpty, "need at least one det -> dep pair")
    fds.map { case (name, det, dep) =>
      df.select(col(det).as("d"), col(dep).as("v"))
        .groupBy(col("d")).agg(countDistinct(col("v")).as("nv"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nv") > 1L, 1L).otherwise(0L)).as("n_violating"),
          max(col("nv")).as("max_distinct"))
        .select(lit(name).as("fd"), col("n_groups"),
          col("n_violating").cast("bigint").as("n_violating"),
          col("max_distinct"))
    }.reduce(_ unionAll _)
  }

  private val fmtLong: Column => Column = _.cast("string")
  private val fmtStr: Column => Column = identity
  private val fmtMoney: Column => Column =
    _.cast(DecimalType(18, 2)).cast("string")
  private val fmtTs: Column => Column =
    date_format(_, "yyyy-MM-dd HH:mm:ss")

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // ---- one-pass column profile of orders ----
    ("dq01_profile", (s: SparkSession, d: String) => {
      // orders.parquet is one row group -> one scan task; project the
      // profiled columns and spread so the multi-distinct Expand
      // partial-aggregates across cores (guide §2.5 input skew; every
      // profile metric partial-aggregates, so values are unchanged)
      profile(Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        .repartition(s.sparkContext.defaultParallelism), Seq(
        "o_orderkey" -> fmtLong, "o_custkey" -> fmtLong,
        "o_orderstatus" -> fmtStr, "o_totalprice" -> fmtMoney,
        "o_orderdate" -> fmtTs, "o_orderpriority" -> fmtStr))
        .orderBy("col_name")
    }, Some {
      def leg(c: String, minmax: String => String) = s"""
        SELECT '$c' AS col_name, count(*) AS n_rows,
          count(*) - count($c) AS n_null,
          count(DISTINCT $c) AS n_distinct,
          ${minmax(s"min($c)")} AS min_s, ${minmax(s"max($c)")} AS max_s
        FROM orders"""
      val varchar = (e: String) => s"CAST($e AS VARCHAR)"
      val money = (e: String) => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
      val tsf = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
      Seq(leg("o_orderkey", varchar), leg("o_custkey", varchar),
        leg("o_orderstatus", varchar), leg("o_totalprice", money),
        leg("o_orderdate", tsf), leg("o_orderpriority", varchar))
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    }),

    // ---- constraint suite over orders (+ customer FK) ----
    ("dq02_constraints", (s: SparkSession, d: String) => {
      checkConstraints(Tables.orders(s, d),
        uniqueKey = Some("o_orderkey"),
        completeCols = Seq("o_custkey"),
        predicates = Seq(
          "o_totalprice_nonneg" -> (col("o_totalprice") >= 0),
          "o_orderstatus_domain" -> col("o_orderstatus").isin("O", "F", "P")),
        refs = Seq(("o_custkey_fk", "o_custkey",
          Tables.customer(s, d), "c_custkey")))
        .orderBy("check_name")
    }, Some("""
      WITH m AS (
        SELECT 'o_orderkey_unique' AS check_name,
          count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
        UNION ALL
        SELECT 'o_custkey_complete', count(*) - count(o_custkey) FROM orders
        UNION ALL
        SELECT 'o_totalprice_nonneg',
          sum(CASE WHEN NOT (o_totalprice >= 0) THEN 1 ELSE 0 END) FROM orders
        UNION ALL
        SELECT 'o_orderstatus_domain',
          sum(CASE WHEN NOT (o_orderstatus IN ('O','F','P')) THEN 1 ELSE 0 END)
        FROM orders
        UNION ALL
        SELECT 'o_custkey_fk', count(*) FROM
          (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
          ANTI JOIN customer ON o.o_custkey = c_custkey)
      SELECT check_name, CAST(violations AS BIGINT) AS violations,
        CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
      FROM m ORDER BY check_name""")),

    // ---- profile drift: dq01's profile of two order cohorts (pre/
    //      post 1998) diffed with the CDC classifier — the schema-
    //      drift monitor a nightly pipeline runs. Two one-pass
    //      profiles + one profile-sized (≈ #columns rows) diff join —
    //      the fact table is scanned twice and shuffled never ----
    ("dq03_profile_drift", (s: SparkSession, d: String) => {
      val cut = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
      def prof(f: Column) = profile(
        Tables.orders(s, d).filter(f), Seq(
          "o_custkey" -> fmtLong, "o_orderstatus" -> fmtStr,
          "o_totalprice" -> fmtMoney))
      Warehouse.snapshotDiff(
        prof(col("o_orderdate") < lit(cut)),
        prof(col("o_orderdate") >= lit(cut)),
        Seq("col_name"),
        Seq("n_rows", "n_null", "n_distinct", "min_s", "max_s"))
        .orderBy("col_name")
    }, Some {
      def side(alias: String, cond: String) = {
        def leg(c: String, fmt: String => String) = s"""
          SELECT '$c' AS col_name, count(*) AS n_rows,
            count(*) - count($c) AS n_null,
            count(DISTINCT $c) AS n_distinct,
            ${fmt(s"min($c)")} AS min_s, ${fmt(s"max($c)")} AS max_s
          FROM orders WHERE $cond"""
        val varchar = (e: String) => s"CAST($e AS VARCHAR)"
        val money = (e: String) => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
        s"""$alias AS (${Seq(leg("o_custkey", varchar),
          leg("o_orderstatus", varchar), leg("o_totalprice", money))
          .mkString(" UNION ALL ")})"""
      }
      s"""
      WITH ${side("p1", "o_orderdate < TIMESTAMP '1998-01-01 00:00:00'")},
      ${side("p2", "o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'")}
      SELECT coalesce(p1.col_name, p2.col_name) AS col_name,
        CASE WHEN p1.col_name IS NULL THEN 'I'
             WHEN p2.col_name IS NULL THEN 'D'
             WHEN p1.n_rows IS DISTINCT FROM p2.n_rows
               OR p1.n_null IS DISTINCT FROM p2.n_null
               OR p1.n_distinct IS DISTINCT FROM p2.n_distinct
               OR p1.min_s IS DISTINCT FROM p2.min_s
               OR p1.max_s IS DISTINCT FROM p2.max_s THEN 'U' END
          AS change_type,
        p1.n_rows AS old_n_rows, p2.n_rows AS new_n_rows,
        p1.n_null AS old_n_null, p2.n_null AS new_n_null,
        p1.n_distinct AS old_n_distinct, p2.n_distinct AS new_n_distinct,
        p1.min_s AS old_min_s, p2.min_s AS new_min_s,
        p1.max_s AS old_max_s, p2.max_s AS new_max_s
      FROM p1 FULL JOIN p2 ON p1.col_name = p2.col_name
      WHERE CASE WHEN p1.col_name IS NULL THEN 'I'
             WHEN p2.col_name IS NULL THEN 'D'
             WHEN p1.n_rows IS DISTINCT FROM p2.n_rows
               OR p1.n_null IS DISTINCT FROM p2.n_null
               OR p1.n_distinct IS DISTINCT FROM p2.n_distinct
               OR p1.min_s IS DISTINCT FROM p2.min_s
               OR p1.max_s IS DISTINCT FROM p2.max_s THEN 'U' END
        IS NOT NULL
      ORDER BY col_name"""
    }),

    // ---- pairwise moments + correlation of lineitem's numeric
    //      features, one Aggregate over one scan; sums exact decimal,
    //      corr one fixed-order double expression on top ----
    ("cor01_column_moments", (s: SparkSession, d: String) => {
      columnMoments(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("col_x", "col_y")
    }, Some {
      def leg(x: String, y: String) = s"""
        SELECT col_x, col_y, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
          round((CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                 - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
            / (sqrt(CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                    - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                      - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE))), 9)
            AS corr
        FROM (
          SELECT '$x' AS col_x, '$y' AS col_y,
            count(*) FILTER (ok) AS n,
            CAST(CAST(sum(xx) FILTER (ok) AS DECIMAL(38,6)) AS DOUBLE) AS sum_x,
            CAST(CAST(sum(yy) FILTER (ok) AS DECIMAL(38,6)) AS DOUBLE) AS sum_y,
            CAST(CAST(sum(xx * xx) FILTER (ok) AS DECIMAL(38,6)) AS DOUBLE) AS sum_xx,
            CAST(CAST(sum(yy * yy) FILTER (ok) AS DECIMAL(38,6)) AS DOUBLE) AS sum_yy,
            CAST(CAST(sum(xx * yy) FILTER (ok) AS DECIMAL(38,6)) AS DOUBLE) AS sum_xy
          FROM (SELECT CAST($x AS DECIMAL(18,2)) AS xx,
                       CAST($y AS DECIMAL(18,2)) AS yy,
                       $x IS NOT NULL AND $y IS NOT NULL AS ok
                FROM lineitem))"""
      Seq(leg("l_quantity", "l_extendedprice"),
        leg("l_quantity", "l_discount"),
        leg("l_extendedprice", "l_discount"))
        .mkString("", " UNION ALL ", " ORDER BY col_x, col_y")
    }),

    // ---- two-sample KS drift: did order value DISTRIBUTION shift
    //      between the pre-/post-1998 cohorts (not just its mean —
    //      dq03's profile deltas can't see a variance or shape
    //      change)? Integer-exact: D·n1·n2 in BIGINTs over exact
    //      cents, the float ks one division at the end; the smallest
    //      attaining value is the deterministic tiebreak ----
    ("dq04_ks_drift", (s: SparkSession, d: String) => {
      ksDrift(
        Tables.orders(s, d).select(
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          (col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .as("pre98")),
        "cents", "pre98")
    }, Some("""
      WITH v AS (SELECT
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
          o_orderdate < TIMESTAMP '1998-01-01' AS g
        FROM orders),
      d AS (SELECT c,
          CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS nb
        FROM v GROUP BY c),
      t AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
                   CAST(sum(nb) AS BIGINT) AS n2 FROM d),
      cum AS (SELECT c,
          CAST(sum(na) OVER (ORDER BY c) AS BIGINT) AS ca,
          CAST(sum(nb) OVER (ORDER BY c) AS BIGINT) AS cb
        FROM d),
      diff AS (SELECT c,
          abs(ca * (SELECT n2 FROM t) - cb * (SELECT n1 FROM t)) AS dd
        FROM cum),
      m AS (SELECT max(dd) AS d_num FROM diff)
      SELECT (SELECT n1 FROM t) AS n1, (SELECT n2 FROM t) AS n2,
        m.d_num AS d_num,
        (SELECT min(c) FROM diff WHERE dd = m.d_num) AS at_c,
        CAST(m.d_num AS DOUBLE)
          / (CAST((SELECT n1 FROM t) AS DOUBLE)
             * CAST((SELECT n2 FROM t) AS DOUBLE)) AS ks
      FROM m""")),

    // ---- chi-squared categorical drift: did the PRIORITY MIX shift
    //      between the same cohorts dq04 compares on value? Exact
    //      integer contingency moments; each cell's chi2 one
    //      fixed-order double expression (no float total — a float
    //      sum is evaluation-order-dependent) ----
    ("dq05_chi2_drift", (s: SparkSession, d: String) => {
      chiSquaredDrift(
        Tables.orders(s, d).select(col("o_orderpriority").as("cat"),
          (col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .as("pre98")),
        "cat", "pre98")
        .orderBy("cat")
    }, Some("""
      WITH v AS (SELECT o_orderpriority AS cat,
          o_orderdate < TIMESTAMP '1998-01-01' AS g
        FROM orders),
      c AS (SELECT cat,
          CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS o1,
          CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS o2
        FROM v GROUP BY cat),
      t AS (SELECT CAST(sum(o1) AS BIGINT) AS n1,
                   CAST(sum(o2) AS BIGINT) AS n2 FROM c)
      SELECT cat, o1, o2,
        (o1 + o2) * t.n1 AS e1_num,
        (o1 + o2) * t.n2 AS e2_num,
        t.n1 + t.n2 AS n_total,
        round(
          CASE WHEN CAST((t.n1 + t.n2) * (o1 + o2) * t.n1 AS DOUBLE) > 0
            THEN CAST(o1 * (t.n1 + t.n2) - (o1 + o2) * t.n1 AS DOUBLE)
               * CAST(o1 * (t.n1 + t.n2) - (o1 + o2) * t.n1 AS DOUBLE)
               / CAST((t.n1 + t.n2) * (o1 + o2) * t.n1 AS DOUBLE)
          END +
          CASE WHEN CAST((t.n1 + t.n2) * (o1 + o2) * t.n2 AS DOUBLE) > 0
            THEN CAST(o2 * (t.n1 + t.n2) - (o1 + o2) * t.n2 AS DOUBLE)
               * CAST(o2 * (t.n1 + t.n2) - (o1 + o2) * t.n2 AS DOUBLE)
               / CAST((t.n1 + t.n2) * (o1 + o2) * t.n2 AS DOUBLE)
          END, 9) AS cell_chi2
      FROM c, t ORDER BY cat""")),

    // ---- PSI over the same cents/cohort pair dq04 KS-tests: 10
    //      fixed-width bins, add-one smoothing on a dense spine,
    //      per-bin (p−q)·ln(p/q) off exact integers, decimal total ----
    ("dq06_psi_drift", (s: SparkSession, d: String) => {
      psiDrift(
        Tables.orders(s, d).select(
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          (col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .as("pre98")),
        "cents", "pre98")
        .orderBy("bin")
    }, Some("""
      WITH v AS (SELECT
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
          o_orderdate < TIMESTAMP '1998-01-01' AS g
        FROM orders),
      d AS (SELECT c,
          CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS nb
        FROM v GROUP BY c),
      mm AS (SELECT min(c) AS cmin, max(c) AS cmax FROM d),
      occ AS (SELECT ((c - cmin) * 10) // (cmax - cmin + 1) AS bin,
          CAST(sum(na) AS BIGINT) AS o1, CAST(sum(nb) AS BIGINT) AS o2
        FROM d CROSS JOIN mm GROUP BY 1),
      cells AS (SELECT s.bin, coalesce(o1, 0) AS o1, coalesce(o2, 0) AS o2
        FROM (SELECT unnest(range(0, 10)) AS bin) s
        LEFT JOIN occ USING (bin)),
      t AS (SELECT CAST(sum(o1) AS BIGINT) AS n1,
                   CAST(sum(o2) AS BIGINT) AS n2 FROM cells),
      pb AS (SELECT bin, o1, o2,
          round((CAST((o1 + 1) * (n2 + 10) - (o2 + 1) * (n1 + 10) AS DOUBLE)
                 / (CAST(n1 + 10 AS DOUBLE) * CAST(n2 + 10 AS DOUBLE)))
              * ln(CAST((o1 + 1) * (n2 + 10) AS DOUBLE)
                   / CAST((o2 + 1) * (n1 + 10) AS DOUBLE)), 9) AS psi_bin
        FROM cells CROSS JOIN t)
      SELECT bin, o1, o2, psi_bin,
        round(CAST(sum(CAST(psi_bin AS DECIMAL(28,10))) OVER () AS DOUBLE), 9)
          AS psi_total
      FROM pb ORDER BY bin""")),

    // ---- Benford first-digit audit of order totals (in cents):
    //      string-exact digit bucketing, dense 1..9 spine, per-digit
    //      deviation + chi2 cell off exact integers ----
    ("dq07_benford", (s: SparkSession, d: String) => {
      benfordDigits(
        Tables.orders(s, d).select(
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents")),
        "cents")
        .orderBy("digit")
    }, Some("""
      WITH v AS (SELECT
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders),
      occ AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
            AS digit, count(*) AS n_obs
          FROM v WHERE c > 0 GROUP BY 1),
      cells AS (SELECT s.digit, coalesce(n_obs, 0) AS n_obs
        FROM (SELECT unnest(range(1, 10)) AS digit) s
        LEFT JOIN occ USING (digit)),
      t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM cells)
      SELECT digit, n_obs, n_total,
        round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9) AS exp_p,
        round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS obs_p,
        round((CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)
               - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
            * (CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)
               - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
            * CAST(n_total AS DOUBLE)
            / log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9) AS cell_chi2
      FROM cells CROSS JOIN t ORDER BY digit""")),

    // ---- FD audit on orders: the true key holds (0 violations),
    //      the false dependency is quantified exactly ----
    ("dq08_fd_audit", (s: SparkSession, d: String) => {
      fdAudit(Tables.orders(s, d), Seq(
        ("o_orderkey->o_custkey", "o_orderkey", "o_custkey"),
        ("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
        ("o_custkey->o_orderstatus", "o_custkey", "o_orderstatus")))
        .orderBy("fd")
    }, Some("""
      WITH f1 AS (SELECT o_orderkey AS d, count(DISTINCT o_custkey) AS nv
                  FROM orders GROUP BY 1),
      f2 AS (SELECT o_custkey AS d, count(DISTINCT o_orderpriority) AS nv
             FROM orders GROUP BY 1),
      f3 AS (SELECT o_custkey AS d, count(DISTINCT o_orderstatus) AS nv
             FROM orders GROUP BY 1),
      u AS (
        SELECT 'o_orderkey->o_custkey' AS fd, count(*) AS n_groups,
          CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_violating,
          CAST(max(nv) AS BIGINT) AS max_distinct FROM f1
        UNION ALL
        SELECT 'o_custkey->o_orderpriority', count(*),
          CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(max(nv) AS BIGINT) FROM f2
        UNION ALL
        SELECT 'o_custkey->o_orderstatus', count(*),
          CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(max(nv) AS BIGINT) FROM f3)
      SELECT fd, n_groups, n_violating, max_distinct FROM u ORDER BY fd""")),

    // ---- referential-integrity audit: orphan rates for every FK
    //      edge of the star schema in one constraint-sized report.
    //      Each edge is a LEFT join against the DISTINCT parent key —
    //      dims broadcast, the two fact-sized edges shuffle on the
    //      key, and the output is one row per edge regardless of
    //      data volume (the ingest-gate shape: alert when orphans
    //      appear, never materialize them) ----
    ("dq09_ref_integrity", (s: SparkSession, d: String) => {
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame =
        child.select(col(ck))
          .join(parent.select(col(pk)).distinct(),
            col(ck) === col(pk), "left")
          .agg(lit(name).as("fk"), count(lit(1)).as("n_rows"),
            count(when(col(pk).isNull && col(ck).isNotNull, 1))
              .as("n_orphans"),
            count(when(col(ck).isNull, 1)).as("n_null_fk"))
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          o, "o_orderkey")
        .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionAll(edge("orders.o_custkey->customer", o, "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .unionAll(edge("customer.c_nationkey->nation",
          Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"))
        .unionAll(edge("supplier.s_nationkey->nation",
          Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey"))
        .unionAll(edge("nation.n_regionkey->region",
          Tables.nation(s, d), "n_regionkey",
          Tables.region(s, d), "r_regionkey"))
        .orderBy("fk")
    }, Some("""
      WITH u AS (
        SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_rows,
          count(CASE WHEN o_orderkey IS NULL AND l_orderkey IS NOT NULL
                THEN 1 END) AS n_orphans,
          count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_null_fk
        FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders)
          p ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part', count(*),
          count(CASE WHEN p_partkey IS NULL AND l_partkey IS NOT NULL
                THEN 1 END),
          count(CASE WHEN l_partkey IS NULL THEN 1 END)
        FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part)
          p ON l_partkey = p_partkey
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', count(*),
          count(CASE WHEN s_suppkey IS NULL AND l_suppkey IS NOT NULL
                THEN 1 END),
          count(CASE WHEN l_suppkey IS NULL THEN 1 END)
        FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier)
          p ON l_suppkey = s_suppkey
        UNION ALL
        SELECT 'orders.o_custkey->customer', count(*),
          count(CASE WHEN c_custkey IS NULL AND o_custkey IS NOT NULL
                THEN 1 END),
          count(CASE WHEN o_custkey IS NULL THEN 1 END)
        FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer)
          p ON o_custkey = c_custkey
        UNION ALL
        SELECT 'customer.c_nationkey->nation', count(*),
          count(CASE WHEN n_nationkey IS NULL AND c_nationkey IS NOT NULL
                THEN 1 END),
          count(CASE WHEN c_nationkey IS NULL THEN 1 END)
        FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation)
          p ON c_nationkey = n_nationkey
        UNION ALL
        SELECT 'supplier.s_nationkey->nation', count(*),
          count(CASE WHEN n_nationkey IS NULL AND s_nationkey IS NOT NULL
                THEN 1 END),
          count(CASE WHEN s_nationkey IS NULL THEN 1 END)
        FROM supplier LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation)
          p ON s_nationkey = n_nationkey
        UNION ALL
        SELECT 'nation.n_regionkey->region', count(*),
          count(CASE WHEN r_regionkey IS NULL AND n_regionkey IS NOT NULL
                THEN 1 END),
          count(CASE WHEN n_regionkey IS NULL THEN 1 END)
        FROM nation LEFT JOIN (SELECT DISTINCT r_regionkey FROM region)
          p ON n_regionkey = r_regionkey)
      SELECT fk, n_rows, n_orphans, n_null_fk FROM u ORDER BY fk""")),

    // ---- Shannon-entropy profile of the categorical columns: how
    //      informative/skewed each dimension is (entropy ~0 = one
    //      value dominates; normalized ~1 = uniform) — the profiling
    //      number behind "is this column worth stratifying on".
    //      Per-value terms c·ln(c) are rounded at 9 and
    //      DECIMAL-summed (order-insensitive — dq05's no-float-total
    //      rule); H = ln(N) − S/N is ONE fixed-order double per
    //      column row ----
    ("dq10_entropy", (s: SparkSession, d: String) => {
      columnEntropy(Tables.orders(s, d), "o_orderstatus",
          "orders.o_orderstatus")
        .unionAll(columnEntropy(Tables.orders(s, d), "o_orderpriority",
          "orders.o_orderpriority"))
        .unionAll(columnEntropy(Tables.lineitem(s, d), "l_returnflag",
          "lineitem.l_returnflag"))
        .unionAll(columnEntropy(Tables.lineitem(s, d), "l_linestatus",
          "lineitem.l_linestatus"))
        .orderBy("col_name")
    }, Some {
      def one(table: String, c: String) = s"""
        SELECT '$table.$c' AS col_name, n_rows, n_distinct,
          round(ln(CAST(n_rows AS DOUBLE))
                - CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
            AS entropy_nats,
          round((ln(CAST(n_rows AS DOUBLE))
                 - CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE))
                / ln(CAST(n_distinct AS DOUBLE)), 6) AS normalized
        FROM (
          SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_distinct,
            sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)
                AS DECIMAL(28,9))) AS s
          FROM (SELECT $c AS v, count(*) AS c FROM $table GROUP BY 1))"""
      Seq(one("orders", "o_orderstatus"),
        one("orders", "o_orderpriority"),
        one("lineitem", "l_returnflag"),
        one("lineitem", "l_linestatus"))
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    })
  )

  /** One column's Shannon entropy off its exact value histogram:
    * H = ln(N) − (Σ c·ln c)/N in nats, plus H/ln(k) normalized to
    * [0,1]. The only value-sized stage is the partial-aggregable
    * histogram groupBy; the entropy itself aggregates histogram rows
    * with per-term rounding + decimal sums so no float total depends
    * on merge order. Assumes k ≥ 2 (a constant column's normalized
    * entropy is undefined — profile it with dq01 instead).
    */
  def columnEntropy(df: DataFrame, colName: String,
      label: String): DataFrame =
    df.select(col(colName).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_distinct"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")), 9)
          .cast(DecimalType(28, 9))).as("s"))
      .select(lit(label).as("col_name"),
        col("n_rows").cast("long").as("n_rows"), col("n_distinct"),
        round(log(col("n_rows").cast("double")) -
          col("s").cast("double") / col("n_rows").cast("double"), 6)
          .as("entropy_nats"),
        round((log(col("n_rows").cast("double")) -
          col("s").cast("double") / col("n_rows").cast("double")) /
          log(col("n_distinct").cast("double")), 6).as("normalized"))
}
