package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Decomposition probe for m14_media_ingest's wall time — the suite's
  * most write-heavy entry (two bucketed store builds + dial + ingest
  * per execution), which the r18 judge's full run measured at 3.51×
  * pin while the SAME binary isolated-reran at 0.97×: disk-churn
  * sensitivity, er07's CPU-starvation story at the I/O layer. This
  * probe times the entry layer by layer (the [[Er07Probe]] /
  * [[StreamPublishProbe]] discipline: decompose before concluding) so
  * a recurrence can be attributed — decode vs store write vs classify
  * join vs append — in one run. Layers, each through m14's OWN stage
  * machinery:
  *   decode   — imageDHash over the corpus split (the mapPartitions
  *              decode walk), noop sink: pure compute, no writes
  *   store    — writeFingerprintStore of the corpus split (two
  *              bucketed saveAsTable writes + the dial): the
  *              disk-churn-sensitive half
  *   classify — the batch-vs-store probe join + min-aggregation, noop
  *              sink (store reused from the `store` layer): the
  *              read/join half, zero store-side exchange
  *   append   — appendToFingerprintStore of the batch's fingerprints
  *              (pure bucketed-append write cost; the store grows one
  *              file per bucket per run — the probe drops it after)
  *   m14      — the full entry (store rebuild + ingest, what Bench
  *              times ≈ decode + store + classify + append)
  * Expected shape on a quiet machine at sf0.1: store ≈ half the
  * entry, classify ≪ store; a wall spike that reproduces in `store`
  * but not `classify`/`decode` is disk churn, not a plan regression.
  */
object MediaIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.{MediaDedup, Multimodal}
    val isB =
      pmod(pmod(col("doc_id"), lit(1000003L)) * lit(427799L), lit(1000003L)) % 5 === 0
    def fps = Multimodal.imageDHash(spark, sfDir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // m14's classification frame WITHOUT the store rebuild or append —
    // isolates the probe join the bucketed layout exists for
    def classifyOnly(s: SparkSession): DataFrame = {
      val matches = MediaDedup
        .fingerprintPairsAgainstStore(s, "m14probe_store", fps.filter(isB), 6)
        .groupBy(col("batch_id")).agg(min(col("corpus_id")).as("match_id"))
      fps.filter(isB).select(col("doc_id"))
        .join(matches, col("doc_id") === col("batch_id"), "left")
        .select(col("doc_id"),
          when(col("match_id").isNotNull, "near").otherwise("unique")
            .as("status"),
          coalesce(col("match_id"), lit(-1L)).as("match_id"))
    }
    val layers: Seq[(String, () => Unit)] = Seq(
      "decode" -> (() => noop(fps.filter(!isB))),
      "store" -> (() => MediaDedup.writeFingerprintStore(spark,
        "m14probe_store", fps.filter(!isB), 6)),
      "classify" -> (() => noop(classifyOnly(spark))),
      "append" -> (() => MediaDedup.appendToFingerprintStore(spark,
        "m14probe_store", fps.filter(isB))),
      "m14" -> (() => noop(
        graft.SparkEntry.queries("m14_media_ingest")(spark, sfDir))))
    val pick = args.lift(2).map(_.split(",").map(_.trim).toSet)
    layers.filter(l => pick.forall(_(l._1))).foreach { case (name, f) =>
      f() // untimed warmup (also builds the store for later layers)
      val ts = (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(250)
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[m14probe] $name%-8s ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }
    Seq("_fpblocks", "_fps", "_fpdial", "_tombstones")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS m14probe_store$s"))
    spark.stop()
  }
}
