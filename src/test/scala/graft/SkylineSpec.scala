package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** Skyline guard behavior: the global single-task phase must only see
  * a bounded candidate set — correlated data folds down through extra
  * local rounds; anti-correlated data (near-linear skyline) must fail
  * loudly instead of funneling O(n) rows through one task.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("skyline2 recurses local rounds until candidates fit the global bound") {
    import spark.implicits._
    // correlated: (i, -i) — the single point (0, 0) dominates everything,
    // so every local fold collapses to one candidate per partition
    val corr = (0 until 20000).map(i => (i.toLong, i.toDouble, -i.toDouble))
      .toDF("id", "mn", "mx").repartition(16)
    val out = Skyline.skyline2(corr, "id", "mn", "mx", maxGlobalRows = 4)
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(0L))
  }

  test("skyline2 folds at parts<=2 instead of failing (few input partitions)") {
    import spark.implicits._
    // partition 0: a 50-point staircase (mutually non-dominated);
    // partition 1: the single point that dominates all of it. Phase 1
    // yields 51 candidates from only 2 partitions — the fold loop must
    // still run (repartition co-mingles dominator and staircase, each
    // round roughly halves) rather than aborting on parts<=2.
    val pts = (1 to 50).map(i => (i.toLong, i.toDouble, i.toDouble)) :+ ((0L, 0.0, 100.0))
    val df = spark.sparkContext.parallelize(pts, 2).toDF("id", "mn", "mx")
    val out = Skyline.skyline2(df, "id", "mn", "mx", maxGlobalRows = 10)
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(0L))
  }

  test("skyline2 throws on near-linear (anti-correlated) skylines") {
    import spark.implicits._
    // (i, i): all points mutually non-dominated — the skyline IS the
    // input, so no fold can shrink it below the bound
    val anti = (0 until 20000).map(i => (i.toLong, i.toDouble, i.toDouble))
      .toDF("id", "mn", "mx").repartition(16)
    val e = intercept[IllegalStateException] {
      Skyline.skyline2(anti, "id", "mn", "mx", maxGlobalRows = 1000)
    }
    assert(e.getMessage.contains("no longer shrinking"))
  }

  test("skyline2 matches the NOT EXISTS oracle on mixed data") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (i.toLong, (i * 7919 % 101).toDouble, (i * 104729 % 97).toDouble)
    }
    val df = rows.toDF("id", "mn", "mx").repartition(8)
    val got = Skyline.skyline2(df, "id", "mn", "mx")
      .collect().map(_.getLong(0)).toSet
    val brute = rows.filter { p =>
      !rows.exists(q => q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet
    assert(got === brute)
  }
}
