package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quality, Warehouse}

/** Constructed-frame semantics for the dq/wh families (the sf oracle
  * entries cover end-to-end parity).
  */
class WarehouseQualitySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("checkConstraints counts each violation class independently") {
    val df = Seq(
      (1L, Some(10L), 5.0),  // clean
      (1L, Some(10L), -1.0), // dup key + negative
      (2L, None, 3.0),       // null fk col (completeness, NOT fk violation)
      (3L, Some(99L), 0.0)   // fk orphan (99 not in parent)
    ).toDF("id", "fk", "amt")
    val parent = Seq(10L).toDF("pid")
    val m = Quality.checkConstraints(df, Some("id"), Seq("fk"),
      Seq("amt_nonneg" -> (col("amt") >= 0)),
      Seq(("fk_ref", "fk", parent, "pid")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m("id_unique") === ((1L, 0L)))     // 4 rows, 3 distinct ids
    assert(m("fk_complete") === ((1L, 0L)))   // one null fk
    assert(m("amt_nonneg") === ((1L, 0L)))    // one negative
    assert(m("fk_ref") === ((1L, 0L)))        // null fk is NOT an orphan
  }

  test("profile renders nulls and distincts per column") {
    val df = Seq((Some(1L), "a"), (Some(1L), "b"), (None, "b"))
      .toDF("k", "s")
    val out = Quality.profile(df,
      Seq("k" -> (_.cast("string")), "s" -> identity))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(out("k") === ((3L, 1L, 1L, "1", "1")))
    assert(out("s") === ((3L, 0L, 2L, "a", "b")))
  }

  test("scd2History numbers runs, closes intervals, flap reopens") {
    // key 1: A(t1) A(t2) B(t3) A(t4) -> 3 versions A[1,3) B[3,4) A[4,)
    val ch = Seq((1L, "A", 1L, 10L), (1L, "A", 2L, 11L),
      (1L, "B", 3L, 12L), (1L, "A", 4L, 13L))
      .toDF("k", "a", "t", "tie")
    val h = Warehouse.scd2History(ch, "k", "a", "t", "tie")
      .orderBy("version")
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    assert(h.toSeq === Seq(
      ("A", 1L, Some(3L), 1L), ("B", 3L, Some(4L), 2L),
      ("A", 4L, None, 3L)))
  }

  test("scd2History plans exactly one exchange for the window chain") {
    val orders = graft.sources.Tables.orders(spark, GraftTestSession.sf)
    val df = Warehouse.scd2History(orders, "o_custkey", "o_orderstatus",
      "o_orderdate", "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 keyed exchange, plan:\n$plan")
  }

  test("snapshotAt includes open rows and excludes future versions") {
    val ch = Seq((1L, "A", 1L, 1L), (1L, "B", 5L, 2L), (2L, "C", 9L, 3L))
      .toDF("k", "a", "t", "tie")
    val h = Warehouse.scd2History(ch, "k", "a", "t", "tie")
    // reuse the filter logic on long "timestamps" via a direct filter
    val at = 4L
    val snap = h.filter(col("eff_from") <= at &&
      (col("eff_to").isNull || col("eff_to") > at))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(snap.toSeq.sorted === Seq((1L, "A"))) // B starts at 5, C at 9
  }

  test("columnMoments: exact sums, corr ±1 on (anti)correlated columns, pairwise null deletion") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(4.0)),
      (Some(3.0), Some(6.0), None: Option[Double]),
      (None: Option[Double], Some(8.0), Some(2.0))
    ).toDF("a", "b", "c")
    val m = Quality.columnMoments(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(8)))).toMap
    // a-b: 3 complete rows, b = 2a exactly → corr 1
    assert(m(("a", "b")) === ((3L, 6.0, 1.0)))
    // a-c: rows 1,2 only (pairwise deletion) → perfect anticorr
    assert(m(("a", "c"))._1 === 2L && m(("a", "c"))._3 === -1.0)
    // sum_x of the a-c pair excludes a's value from the c-null row
    assert(m(("a", "c"))._2 === 3.0)
  }

  test("quantileBins: rank formula, tie split by id, no per-group sort of the corpus") {
    val df = Seq(
      (1L, "g", 10L), (2L, "g", 10L), (3L, "g", 20L), (4L, "g", 30L),
      (5L, "h", 7L)
    ).toDF("id", "grp", "s")
    val out = graft.operators.TextOps.quantileBins(df, "grp", "s", "id", 2)
    val got = out.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    // g: ranks by (s, id) = 1,2,3,4 → bins ((r-1)*2) div 4 + 1 = 1,1,2,2
    // (the score-10 tie splits deterministically by id)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    // skew shape: no window partitioned by the group alone — every
    // Sort/Window over the data is keyed by (grp, s); only the
    // histogram-sized cum window may key on grp
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("ntile"), plan)
  }

  test("zipfRankTerms: histogram-elected rank blocks, chunked explode, no unpartitioned window") {
    // two tie classes inside one log2 bucket (7, 6, 6, 4 all have
    // 3-bit frequencies) plus the hapax class in another bucket
    val freqs = Seq(7L, 6L, 6L, 4L, 1L, 1L, 1L, 1L, 1L).toDF("f")
    // chunk=2 forces the f=1 class (5 words) through 3 chunk rows
    val out = graft.operators.TextOps.zipfRankTerms(freqs, chunk = 2L)
    val got = out.collect()
      .map(r => (r.getAs[Long]("f"), r.getAs[Long]("r"))).toSet
    assert(got === Set((7L, 1L), (6L, 2L), (6L, 3L), (4L, 4L),
      (1L, 5L), (1L, 6L), (1L, 7L), (1L, 8L), (1L, 9L)))
    // the t27 gate: ranks may NOT come from a vocab-sized
    // row_number/sort — the only windows allowed are cumulative
    // counts over histogram rows PARTITIONED BY the log2(f) bucket.
    // In windowspecdefinition(...) partition columns come first; an
    // unpartitioned ordered window leads with a sort spec (ASC/DESC).
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number"), plan)
    val specs = "windowspecdefinition\\(([^,)]*)[,)]".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(specs.nonEmpty, plan)
    specs.foreach(s => assert(!s.contains(" ASC") && !s.contains(" DESC"),
      s"unpartitioned window spec: $s\n$plan"))
  }


  test("ksDrift: exact cross-multiplied statistic, smallest-attaining tiebreak, empty cohort -> null ks") {
    // cohort A = {1, 2}, cohort B = {3, 4}: fully separated, so the
    // max gap is at v=2: |2*2 - 0*2| = 4 -> KS = 4/(2*2) = 1.0
    val sep = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "g")
    val r1 = Quality.ksDrift(sep, "v", "g").collect().head
    assert(r1.getAs[Long]("n1") === 2L)
    assert(r1.getAs[Long]("n2") === 2L)
    assert(r1.getAs[Long]("d_num") === 4L)
    assert(r1.getAs[Long]("at_c") === 2L)
    assert(r1.getAs[Double]("ks") === 1.0)
    // identical cohorts: every prefix balances, d_num = 0, at_c = the
    // smallest value (deterministic tiebreak over ALL-attaining rows)
    val same = Seq((5L, true), (7L, true), (5L, false), (7L, false))
      .toDF("v", "g")
    val r2 = Quality.ksDrift(same, "v", "g").collect().head
    assert(r2.getAs[Long]("d_num") === 0L)
    assert(r2.getAs[Long]("at_c") === 5L)
    assert(r2.getAs[Double]("ks") === 0.0)
    // one empty cohort: the statistic is undefined -> null ks, no
    // ANSI divide-by-zero throw
    val empty = Seq((1L, true), (2L, true)).toDF("v", "g")
    val r3 = Quality.ksDrift(empty, "v", "g").collect().head
    assert(r3.getAs[Long]("n2") === 0L)
    assert(r3.isNullAt(r3.fieldIndex("ks")))
  }


  test("temporalJoin: boundary lands on the NEW version, open row catches the tail, equi-join plan") {
    val changes = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L),  // key 1: A@[10,20), B@[20,)
      (2L, "X", 15L, 3L)
    ).toDF("k", "attr", "ts", "tie")
    val hist = Warehouse.scd2History(changes, "k", "attr", "ts", "tie")
    val facts = Seq((100L, 1L, 10L), (101L, 1L, 19L), (102L, 1L, 20L),
      (103L, 1L, 99L), (104L, 2L, 14L))
      .toDF("fid", "k", "ts")
    val j = Warehouse.temporalJoin(facts, hist, "k", "ts")
      .select("fid", "attr", "version")
    val got = j.as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // fid 102 sits ON the change instant -> the NEW version (B);
    // fid 103 is after the last change -> the open row;
    // fid 104 predates key 2's first version -> no match (honest:
    // the dimension did not exist yet)
    assert(got === Seq((100L, "A", 1L), (101L, "A", 1L),
      (102L, "B", 2L), (103L, "B", 2L)))
    // the join must key-hash on k, not plan a cartesian/BNLJ
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"temporal join degenerated:\n$plan")
  }


  test("chiSquaredDrift: exact contingency moments, hand-checked 2x2, one-cohort null") {
    // cohort1 = 3A+1B, cohort2 = 1A+3B: each cell contributes
    // diff^2/den twice -> (3*8-4*4)^2/(8*4*4) * 2 = 64/128 * 2 = 1.0
    val v = (Seq.fill(3)(("A", true)) ++ Seq(("B", true)) ++
      Seq(("A", false)) ++ Seq.fill(3)(("B", false)))
      .toDF("cat", "g")
    val got = Quality.chiSquaredDrift(v, "cat", "g")
      .orderBy("cat").collect()
    assert(got.map(_.getAs[String]("cat")).toSeq === Seq("A", "B"))
    got.foreach { r =>
      assert(r.getAs[Long]("n_total") === 8L)
      assert(r.getAs[Long]("e1_num") === 16L)  // R*N1 = 4*4
      assert(r.getAs[Double]("cell_chi2") === 1.0)
    }
    // one empty cohort -> every cell's chi2 undefined (null), moments
    // still exact
    val one = Seq(("A", true), ("B", true)).toDF("cat", "g")
    val r2 = Quality.chiSquaredDrift(one, "cat", "g").orderBy("cat").collect()
    assert(r2.forall(_.isNullAt(r2.head.fieldIndex("cell_chi2"))))
    assert(r2.head.getAs[Long]("o1") === 1L)
  }

  test("allocateProRata: cents-exact per parent, largest remainder wins, deterministic ties") {
    // parent 1: T=100 over weights 1,1,1 -> base 33x3, residual 1 to
    // the smallest tie (all remainders equal) = line 1
    // parent 2: T=10 over weights 3,1 -> 7.5/2.5 -> base 7,2, residual
    // 1 to the larger remainder (line 1: rem 30%40=30 > line 2: 10)
    val kids = Seq(
      (1L, 1L, 1L, 100L), (1L, 2L, 1L, 100L), (1L, 3L, 1L, 100L),
      (2L, 1L, 3L, 10L), (2L, 2L, 1L, 10L)
    ).toDF("pk", "line", "w", "t")
    val got = graft.operators.Warehouse
      .allocateProRata(kids, "pk", "line", "w", "t")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(got === Map((1L, 1L) -> 34L, (1L, 2L) -> 33L, (1L, 3L) -> 33L,
      (2L, 1L) -> 8L, (2L, 2L) -> 2L))
    // invariant on sf data: every order's allocation sums to its total
    val li = graft.sources.Tables.lineitem(spark, GraftTestSession.sf)
      .selectExpr("l_orderkey", "CAST(l_linenumber AS BIGINT) AS line",
        "CAST(l_quantity AS BIGINT) AS w")
    val o = graft.sources.Tables.orders(spark, GraftTestSession.sf)
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS t")
    val leaks = graft.operators.Warehouse
      .allocateProRata(li.join(o, col("l_orderkey") === col("o_orderkey")),
        "l_orderkey", "line", "w", "t")
      .groupBy("l_orderkey", "t").agg(sum("alloc").as("s"))
      .filter(col("s") =!= col("t")).count()
    assert(leaks === 0L, "an order's allocated cents diverged from its total")
  }

  test("psiDrift: identical cohorts are exactly zero, dense spine, hand-checked shift, decimal total") {
    // identical cohorts: smoothed p == q in every bin -> psi_bin 0.0
    val same = (1L to 20L).flatMap(i => Seq((i, true), (i, false)))
      .toDF("c", "g")
    val s = Quality.psiDrift(same, "c", "g", bins = 4).orderBy("bin").collect()
    assert(s.length === 4)
    assert(s.forall(_.getAs[Double]("psi_bin") === 0.0))
    assert(s.forall(_.getAs[Double]("psi_total") === 0.0))
    // mass moved to the top bin; spine keeps all 4 bins present even
    // though cohort rows only occupy two of them
    val shifted = (Seq.fill(8)((1L, true)) ++ Seq.fill(8)((8L, false)))
      .toDF("c", "g")
    val g = Quality.psiDrift(shifted, "c", "g", bins = 4).orderBy("bin").collect()
    assert(g.length === 4)
    assert(g.map(r => (r.getAs[Long]("o1"), r.getAs[Long]("o2"))).toSeq ===
      Seq((8L, 0L), (0L, 0L), (0L, 0L), (0L, 8L)))
    // bin 0: p=(9)/12, q=1/12 -> (8/12)·ln(9) ; bin 3 symmetric; empty
    // middle bins contribute exactly 0 (p == q == 1/12)
    val exp = math.rint(8.0 / 12.0 * math.log(9.0) * 1e9) / 1e9
    assert(g(0).getAs[Double]("psi_bin") === exp)
    assert(g(3).getAs[Double]("psi_bin") === exp) // symmetric, PSI >= 0
    assert(g(1).getAs[Double]("psi_bin") === 0.0)
    val tot = math.rint(2 * exp * 1e9) / 1e9
    assert(g.forall(r => (r.getAs[Double]("psi_total") - tot).abs < 1e-9))
  }

  test("benfordDigits: string-exact first digit, non-positives dropped, dense spine") {
    val v = Seq(1L, 19L, 150L, 2L, 2000L, 9L, 0L, -7L).toDF("x")
    val got = Quality.benfordDigits(v, "x").orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // digits: 1 (from 1,19,150), 2 (from 2,2000), 9 (from 9); 0 and -7
    // excluded; N = 6; spine keeps digits 3..8 present with zero
    assert(got.map(_._1).toSeq === (1L to 9L))
    assert(got.map(_._2).toSeq === Seq(3L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(got.forall(_._3 === 6L))
  }

  test("snapshotDiff classifies I/U/D, drops unchanged, compares null-safely") {
    val old = Seq((1L, Some("A")), (2L, Some("B")), (3L, Some("C")),
      (5L, None: Option[String])).toDF("k", "v")
    val cur = Seq((1L, Some("A")), (2L, Some("X")), (4L, Some("D")),
      (5L, Some("E"))).toDF("k", "v")
    val got = Warehouse.snapshotDiff(old, cur, Seq("k"), Seq("v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(3), Option(r.getString(1)), Option(r.getString(2)))))
      .toMap
    // key 1 unchanged → absent; 2 updated; 3 deleted; 4 inserted;
    // 5 null→E must register as U (null-safe compare)
    assert(got === Map(
      2L -> (("U", Some("B"), Some("X"))),
      3L -> (("D", Some("C"), None)),
      4L -> (("I", None, Some("D"))),
      5L -> (("U", None, Some("E")))))
  }
}
