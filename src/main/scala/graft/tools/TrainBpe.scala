package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** One-shot trainer for the committed BPE merge table
  * (src/main/resources/graft/bpe_merges.txt) behind the
  * [[graft.operators.TextOps.Tokenizer]] seam.
  *
  * Word frequencies come from the corpus via the same split the t08
  * vocab entry uses (single-space split, empties dropped); the greedy
  * merge loop itself is [[graft.operators.TextOps.Bpe.train]] so the
  * committed table is reproducible bit-for-bit:
  *
  *   sbt "runMain graft.tools.TrainBpe /root/testdata/sf0.01 160"
  *
  * The t09 oracle replays these merges as a DuckDB replace() chain
  * over marker-wrapped symbols (chr(31) sym chr(30)), so training
  * REFUSES corpora whose words contain those marker code points.
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(160)
    val out = args.lift(2).getOrElse("src/main/resources/graft/bpe_merges.txt")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val wc = graft.sources.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(wc.forall { case (w, _) => !w.exists(c => c == '\u001e' || c == '\u001f') },
      "corpus words collide with the oracle's chr(30)/chr(31) symbol markers")
    val merges = graft.operators.TextOps.Bpe.train(wc, nMerges)
    require(merges.nonEmpty, s"no mergeable pairs in $dir")
    Files.writeString(Paths.get(out),
      merges.map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n"))
    println(s"[trainbpe] ${merges.length} merges from ${wc.length} distinct words -> $out")
    spark.stop()
  }
}
