package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Decomposes d25/d26's wall time into stages (tokenize+cut, freq,
  * ranked regroup, prefix self-join candidates, verify) so the r20
  * optimization targets the real cost. Mirrors the private chain in
  * [[graft.operators.Dedup.setSimilarityJoin]] — probe only, never a
  * query path.
  *
  * Usage: runMain graft.tools.SetSimProbe <sfDir>
  */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val (num, den) = (3L, 5L)
    val documents = Tables.documents(spark, sfDir)
    val docRaw = time("tokenize+cut") {
      graft.operators.Cut(documents
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          expr("filter(split(trim(text), ' '), x -> x <> '')").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), expr(
          "array_distinct(transform(sequence(1, size(ws) - 2), " +
            "i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1])))").as("toks")))
    }
    val freq = docRaw.select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
    time("freq (noop)")(noop(freq))
    val ranked = docRaw
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"),
        explode(col("toks")).as("word"))
      .join(freq, "word")
      .groupBy(col("doc_id"), col("n"))
      .agg(array_sort(collect_list(struct(col("f"), col("word")))).as("fw"))
      .select(col("doc_id"), col("n"),
        expr("transform(fw, x -> x.word)").as("words"))
    val docs = time("ranked regroup+cut") {
      graft.operators.Cut(ranked.withColumn("pre", expr(
        s"slice(words, 1, cast(n - ((n * ${num}L + ${den}L - 1) div ${den}L) + 1 as int))")))
    }
    val preA = docs.select(col("doc_id").as("id_a"), col("n").as("na"),
      posexplode(col("pre")).as(Seq("pa", "word")))
    val preB = docs.select(col("doc_id").as("id_b"), col("n").as("nb"),
      posexplode(col("pre")).as(Seq("pb", "word")))
    val matches = preA.join(preB, "word").filter(col("id_a") < col("id_b"))
    println(s"[probe] raw prefix matches: ${time("count raw matches")(matches.count())}")
    val cand = matches
      .filter(least(col("na"), col("nb")) * den >=
        greatest(col("na"), col("nb")) * num)
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(min(lit(1L) + least(col("pa"), col("pb")) +
        least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1)).as("ub"))
      .filter(col("ub") * (den + num) >= (col("na") + col("nb")) * num)
    println(s"[probe] candidates after filters: ${time("cand count")(cand.count())}")
    val out = cand
      .join(docs.select(col("doc_id").as("id_a"), col("words").as("wa")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("words").as("wb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .filter(col("inter") * den >= (col("na") + col("nb") - col("inter")) * num)
    time("verify (noop)")(noop(out))
    time("END TO END repeat (noop)") {
      noop(graft.operators.Dedup.setSimilarityJoin(documents, num, den))
    }
    spark.stop()
  }
}
