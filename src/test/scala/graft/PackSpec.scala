package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pack

/** Sequence packing: chunked (window-arithmetic) and greedy no-split
  * (per-shard fold) layouts. The DuckDB oracles cover exact parity at
  * sf0.01; these tests pin the structural invariants and the plan
  * shapes that make both scale.
  */
class PackSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  test("t12 chunked: offsets are the per-shard running sum cut at Cap") {
    val rows = Pack.packChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var start = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, startBin, off, endBin) =>
        assert(startBin === start / Pack.Cap, s"doc $id start_bin")
        assert(off === start % Pack.Cap, s"doc $id bin_offset")
        assert(endBin === (start + n - 1) / Pack.Cap, s"doc $id end_bin")
        assert(endBin >= startBin)
        start += n
      }
    }
  }

  test("t13 greedy: no bin over Cap unless a single oversize doc; bins contiguous") {
    val rows = Pack.packGreedy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._4)).foreach { case ((sh, bin), docs) =>
      val total = docs.map(_._3).sum
      assert(total <= Pack.Cap || docs.length == 1,
        s"shard $sh bin $bin holds $total tokens across ${docs.length} docs")
      // offsets inside a bin are the running fill in doc order
      var fill = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, _, off) =>
        assert(off === fill, s"doc $id offset"); fill += n
      }
    }
    rows.groupBy(_._2).foreach { case (sh, docs) =>
      val bins = docs.map(_._4).distinct.sorted
      assert(bins === (0L until bins.length.toLong), s"shard $sh bins not contiguous")
    }
  }

  test("t13 greedy: Spark fold equals an independent driver-side reference fold") {
    val got = Pack.packGreedy(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    val base = Pack.packChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = base.groupBy(_._2).iterator.flatMap { case (_, docs) =>
      var (bin, fill) = (0L, 0L)
      docs.sortBy(_._1).iterator.map { case (id, _, n) =>
        if (fill == 0L || fill + n <= Pack.Cap) fill += n
        else { bin += 1L; fill = n }
        id -> ((bin, fill - n))
      }
    }.toMap
    assert(got === want)
  }

  test("t12 plans as one window over the shard exchange (no join, no iteration)") {
    val df = Pack.packChunks(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit") ||
      df.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(!plan.contains("Join"), plan.take(1500))
  }

  test("t13 plans as one hash exchange on shard feeding the fold") {
    val df = Pack.packGreedy(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE repeats the pre-AQE plan below
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges === 1, plan.take(2000))
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"),
      plan.take(1500))
  }
}
