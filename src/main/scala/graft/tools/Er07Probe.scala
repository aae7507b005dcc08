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
    // same CPU dial as Bench — a local[4] run of the CPU-parallel
    // kernels reads ~3x slow and would mislead the decomposition
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.Er
    type Feats = Seq[(String, (String => org.apache.spark.sql.Column,
      String => org.apache.spark.sql.Column) => org.apache.spark.sql.Column)]
    // er07's OWN stage machinery (Er.candidatePairs + partBlockKey),
    // so a change to the entry's blocking/feature layers cannot
    // silently decouple what this probe measures from what runs
    def layer(s: SparkSession, features: Feats,
        keep: org.apache.spark.sql.Column): DataFrame =
      Er.candidatePairs(Tables.part(s, sfDir), "p_partkey",
        ac => Er.partBlockKey(ac("p_name"), ac("p_type")), features, keep)
    val levF: Feats = Seq("lev" -> ((ac, bc) =>
      levenshtein(ac("p_name"), bc("p_name")).cast("long")))
    val dlF: Feats = Seq("dl" -> ((ac, bc) =>
      graft.functions.damerauLevenshtein(ac("p_name"), bc("p_name"))))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val layers: Seq[(String, () => Unit)] = Seq(
      "pairs" -> (() => noop(layer(spark, Seq.empty, lit(true)))),
      "lev" -> (() => noop(layer(spark, levF, col("lev") <= 4L))),
      "dl" -> (() => noop(layer(spark, dlF, col("dl") <= 4L))),
      "dl+lev" -> (() => noop(layer(spark, dlF ++ levF, col("dl") <= 4L))),
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
