package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Decomposition probe for er07_damerau's wall time (the r15–r17
  * variance entry): times the pipeline layer by layer at a given SF
  * so the pin note can say WHERE the seconds go instead of guessing —
  * the [[StreamPublishProbe]] discipline (decompose before
  * concluding). Layers:
  *   pairs     — block self-join + pair filter, count only (join
  *               machinery, no edit distances)
  *   lev       — + Spark's built-in levenshtein, keep <= 4
  *   dl        — + graft's damerauLevenshtein, keep <= 4
  *   dl+lev    — both kernels (er07's compute, no output sort)
  *   er07      — the full entry (adds the output orderBy)
  * Each layer runs `runs` times after one untimed warmup; noop sink
  * (Bench's full-evaluation discipline).
  */
object Er07Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(s: SparkSession): DataFrame = {
      val p = Tables.part(s, sfDir)
      val key = (n: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =>
        concat_ws("|", split(n, " ").getItem(1), t)
      val a = p.select(col("p_partkey").as("a_key"), col("p_name").as("a_name"),
        key(col("p_name"), col("p_type")).as("bk"))
      val b = p.select(col("p_partkey").as("b_key"), col("p_name").as("b_name"),
        key(col("p_name"), col("p_type")).as("bk"))
      a.join(b, Seq("bk")).filter(col("a_key") < col("b_key"))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val layers: Seq[(String, () => Unit)] = Seq(
      "pairs" -> (() => noop(pairs(spark))),
      "lev" -> (() => noop(pairs(spark)
        .withColumn("lev", levenshtein(col("a_name"), col("b_name")).cast("long"))
        .filter(col("lev") <= 4L))),
      "dl" -> (() => noop(pairs(spark)
        .withColumn("dl",
          graft.functions.damerauLevenshtein(col("a_name"), col("b_name")))
        .filter(col("dl") <= 4L))),
      "dl+lev" -> (() => noop(pairs(spark)
        .withColumn("dl",
          graft.functions.damerauLevenshtein(col("a_name"), col("b_name")))
        .withColumn("lev", levenshtein(col("a_name"), col("b_name")).cast("long"))
        .filter(col("dl") <= 4L))),
      "er07" -> (() => noop(
        graft.SparkEntry.queries("er07_damerau")(spark, sfDir))))
    // optional layer filter (comma list) — e.g. run er07 FIRST in a
    // fresh JVM to separate tier-up depth from steady state
    val pick = args.lift(2).map(_.split(",").map(_.trim).toSet)
    layers.filter(l => pick.forall(_(l._1))).foreach { case (name, f) =>
      f() // untimed warmup
      val ts = (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(250)
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[er07probe] $name%-8s ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
