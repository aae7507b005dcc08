package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: with a hot key dominating one side, the
  * runtime must split the skewed partition instead of running one
  * straggler task (the default 100 TB skew path; Skew.saltedJoin is
  * the static alternative, tested in OperatorsSpec).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("AQE splits skewed partitions in a sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 100k rows, ~60% on key 1
      val fact = spark.range(100000)
        .select(when(col("id") % 10 < 6, 1L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val dim = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = fact.join(dim, "k").groupBy().agg(count(lit(1)).as("n"))
      val n = j.collect().head.getLong(0)
      assert(n === 100000L)
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("skew=true") || plan.contains("skewed"), plan.take(4000))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
