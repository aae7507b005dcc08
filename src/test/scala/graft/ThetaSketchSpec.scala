package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{thetaSketch, thetaEstimate, thetaIntersectEstimate}

/** Theta-sketch aggregate: below the sketch's nominal entries (4096)
  * the estimate is EXACT, so small-corpus assertions can be equality
  * checks; merge across partitions must be order-insensitive.
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("theta estimate is exact in exact mode; intersection works") {
    import spark.implicits._
    // 0..999 in one column, 500..1499 in the other → overlap 500
    val df = spark.range(1500).select(
      when(col("id") < 1000, col("id")).as("a"),
      when(col("id") >= 500, col("id")).as("b"))
    val row = df.agg(
      thetaSketch(col("a")).as("sa"), thetaSketch(col("b")).as("sb"))
      .select(thetaEstimate(col("sa")).as("ea"),
        thetaEstimate(col("sb")).as("eb"),
        thetaIntersectEstimate(col("sa"), col("sb")).as("ei"))
      .head()
    assert(row.getDouble(0) === 1000.0)
    assert(row.getDouble(1) === 1000.0)
    assert(row.getDouble(2) === 500.0)
  }

  test("theta merge across partitions stays within error bounds") {
    // 10k distinct > 4096 nominal entries → estimation mode: the
    // 32-way partial/merge path must land within the ~3% bound (and
    // deterministically: same input set → same retained hashes)
    val df = spark.range(0, 10000, 1, 32) // 32 partitions
    val est = df.agg(thetaEstimate(thetaSketch(col("id"))).as("e")).head().getDouble(0)
    assert(math.abs(est - 10000.0) <= 300.0, s"estimate $est off by >3%")
    val est2 = df.agg(thetaEstimate(thetaSketch(col("id"))).as("e")).head().getDouble(0)
    assert(est === est2, "estimate must be deterministic")
  }

  test("nulls are skipped like countDistinct") {
    val df = spark.range(100).select(when(col("id") % 2 === 0, col("id")).as("v"))
    val est = df.agg(thetaEstimate(thetaSketch(col("v"))).as("e")).head().getDouble(0)
    assert(est === 50.0)
  }
}
