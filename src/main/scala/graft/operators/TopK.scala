package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey
import graft.sources.Tables

/** Column-level API over the TopKPerKey custom operator (see
  * graft.plans.TopKPerKey for the physical design). Requires a
  * session with GraftExtensions (TopKStrategy injected).
  */
object TopK {
  type QFn = (SparkSession, String) => DataFrame

  /** Top `k` rows per `keys` group by (`ord` DESC, `tie` ASC).
    * Columns are named (resolved directly against the analyzed child —
    * Spark 4's lazy Column nodes don't resolve inside foreign plan
    * nodes). `ord` is cast to double; `tie` must be unique per key.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], ord: String, tie: String, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val child = GraftBridge.logicalPlan(df)
    def attr(n: String) = child.output.find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(s"no column $n in ${child.output.map(_.name)}"))
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(attr),
        Cast(attr(ord), DoubleType), Cast(attr(tie), LongType),
        k, child))
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // top-3 orders per customer — same semantics as the window
    // row_number formulation (q18) but via the bounded-heap operator
    ("tk01_topk_per_key", (s: SparkSession, d: String) => {
      topKPerKey(Tables.orders(s, d), Seq("o_custkey"),
        "o_totalprice", "o_orderkey", 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), desc("o_totalprice"), col("o_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, o_totalprice DESC, o_orderkey"""))
  )
}
