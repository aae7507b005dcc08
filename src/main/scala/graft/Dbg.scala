package graft
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.fnv64
object Dbg {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-20s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    val P = 2147483647L
    val docs = Tables.documents(spark, d).select(col("doc_id"), graft.operators.Dedup.shingles(col("text")).as("sh"))
    t("docs")(docs.count())
    val hashed = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), pmod(fnv64(col("shingle")), lit(P)).as("h"))
    t("hashed")(hashed.count())
    val r = new scala.util.Random(42)
    val params = Seq.fill(32)(((r.nextInt((P-1).toInt)+1).toLong, r.nextInt(P.toInt).toLong))
    val sigCols = params.zipWithIndex.map { case ((a,b), i) => min(pmod(col("h")*lit(a)+lit(b), lit(P))).as(s"s$i") }
    val sigs = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    t("sigs")(sigs.count())
    t("sigs2")(sigs.count())
    val full = graft.operators.Dedup.minhashPairs(Tables.documents(spark, d), 0.5)
    t("full")(full.count())
    t("full2")(full.count())
    spark.stop()
  }
}
