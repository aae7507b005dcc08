package graft
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.sources.Tables.embeddings(spark, sf)
      for ((m, k) <- Seq((8, 16), (16, 16), (16, 64)); np <- Seq(3); r <- Seq(50, 100)) {
        val adcShort = graft.operators.Similarity.ivfPqSearch(e, 0L, np, r, m, k)
        val probed = graft.operators.Similarity.ivfPqSearch(e, 0L, np, 1000000, m, k)
          .select(col("vec_id")).union(Seq(0L).toDF("vec_id"))
        val truthCell = graft.operators.Similarity.l2TopK(
          e.join(probed, "vec_id"), 0L, 10).select("vec_id")
        val n = adcShort.select("vec_id").join(truthCell, "vec_id", "left_semi").count()
        println(s"[probe] $sf m=$m k=$k nprobe=$np R=$r cell-truth10-in-shortlist=$n")
      }
    }
    spark.stop()
  }
}
