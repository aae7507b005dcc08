package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Catalyst plays the role of keenwa's optimizer core
  * (reference: /root/reference/src/optimizer.rs:1, src/memo/mod.rs:1):
  * we declare logical plans with the DataFrame API and let Catalyst +
  * AQE do rule-based rewrite, cost-based join selection, and runtime
  * re-planning. This builder pins the confs that matter for that:
  * AQE (skew joins, partition coalescing), a shuffle-partition count
  * matched to local cores (scale knob: set ~= 2-3x cluster cores on a
  * real cluster), and UTC session time for oracle parity.
  */
object GraftSession {

  /** Pre-configured builder; callers may override master/memory. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // cost-based optimization — the reference's core concern
      // (/root/reference/src/optimizer.rs:1, src/cost/simple.rs:1):
      // harmless without statistics; once tables carry ANALYZE stats,
      // CostBasedJoinReorder re-associates inner joins by cost
      // (join commute/assoc ~ src/rules/transformation.rs:1; PlanSpec
      // asserts a deliberately bad join order gets flipped)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS); Spark reads it as a
      // nanos-since-epoch long (exact) and Tables.events derives the
      // micro-truncated timestamp column alongside the raw ns long.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
