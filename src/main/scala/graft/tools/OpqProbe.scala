package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** Times s18_opq_recall's stages (gate corpus, rotation learn, plain
  * found-sum, rotated found-sum) so the r20 optimization targets the
  * real cost. Probe only, never a query path.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[probe] ---- pass $pass")
      val corpus = time("corpus+cache") {
        val c = Similarity.opqGateCorpus(spark).cache(); c.count(); c
      }
      val rot = time("rotation learn")(Similarity.opqParametricRotation(corpus, 8))
      val rotated = Similarity.rotateEmbeddings(corpus, rot)
      val f1 = time("foundSum plain")(Similarity.ivfPqRerankFoundSum(
        corpus, Seq(100L, 101L, 102L, 103L), 2, 30, 10, 8, 16))
      val f2 = time("foundSum rotated")(Similarity.ivfPqRerankFoundSum(
        rotated, Seq(100L, 101L, 102L, 103L), 2, 30, 10, 8, 16))
      println(s"[probe] found plain=$f1 opq=$f2")
      corpus.unpersist()
    }
    spark.stop()
  }
}
