package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query plans and executes at sf0.001, and the
  * flagship entry returns rows. Value-level correctness is covered by
  * the DuckDB oracle (scripts/check.py, driver's t2 gate).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes") {
      val df = fn(spark, GraftTestSession.sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
