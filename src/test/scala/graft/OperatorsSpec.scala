package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Skew}

/** Semantics checks on constructed frames for the custom operators. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("asofJoin: latest right row at-or-before, nulls when none") {
    import spark.implicits._
    val left = Seq((1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 0L, "p0"), (2L, 7L, "p7"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 1L, "r1"), (1L, 7L, "r7"), (1L, 10L, "r10"))
      .toDF("k", "t", "rv")
    val got = AsOf.asofJoin(left, right, "k", "t", "t", Seq("rv"))
      .select("lv", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "p0" -> null, // before any right row
      "p5" -> "r1", // latest at-or-before 5
      "p10" -> "r10", // equal time counts (>=)
      "p7" -> null)) // key 2 has no right rows
  }

  test("saltedJoin equals plain equi-join") {
    import spark.implicits._
    // skewed fact: one hot key
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "v")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (6L, "d")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "k", 8).groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
