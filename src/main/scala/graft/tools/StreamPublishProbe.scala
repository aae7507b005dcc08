package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc decomposition of the EwmaStream publish dial: runs ONE leg
  * of Scale's ewmaPublishDial probe (disjoint key slices per batch)
  * with explicit knobs and prints EVERY batch's wall, so growth can
  * be attributed to the publish mode vs the fold cadence instead of
  * inferred from first6/last6 averages.
  *
  * usage: runMain graft.tools.StreamPublishProbe <sfDir> <nBatches>
  *          <full|incr[:pk]> <fold:<maxParts>|nofold>
  */
object StreamPublishProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nb = args.lift(1).map(_.toInt).getOrElse(48)
    val mode = args.lift(2).getOrElse("incr")
    val fold = args.lift(3).getOrElse("fold:4") match {
      case "nofold" => None
      case s => Some(s.stripPrefix("fold:").toInt)
    }
    val inc = mode.split(":") match {
      case Array("full") => None
      case Array("incr") => Some(256)
      case Array("incr", p) => Some(p.toInt)
    }
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-spp").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nKeys = 480
    val slice = nKeys / nb
    val evk = ev.select(
      pmod(col("user_id"), lit(nKeys.toLong)).as("uid_key"),
      col("ts_ns"),
      pmod(col("event_id"), lit(997L)).cast("double").as("value"))
    val land = s"$work/land"
    (0 until nb).foreach { i =>
      evk.filter(col("uid_key").between(i.toLong * slice,
          i.toLong * slice + slice - 1))
        .coalesce(1).write.mode("append").parquet(land)
    }
    val schema = spark.read.parquet(land).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(land)
    val q = graft.streaming.EwmaStream.start(s"$work/store", src,
      "uid_key", bucketNs = 3600L * 1000000000L, alphaDen = 10L,
      s"$work/out", s"$work/ckpt", fold, inc)
    try q.processAllAvailable() finally q.stop()
    q.recentProgress.toSeq.filter(_.numInputRows > 0)
      .sortBy(_.batchId)
      .foreach { p =>
        val d = Option(p.durationMs.get("triggerExecution"))
          .map(_.toLong).getOrElse(0L)
        println(f"[probe] mode=$mode fold=${fold.getOrElse(-1)} batch=${p.batchId}%3d ${d / 1000.0}%6.2f s")
      }
    println(s"[probe] published rows: " +
      graft.streaming.EwmaStream.readPublished(spark, s"$work/out").count())
    spark.stop()
    // events-sized landing + store per run — delete, don't leak /tmp
    val root = new org.apache.hadoop.fs.Path(work)
    root.getFileSystem(new org.apache.hadoop.conf.Configuration())
      .delete(root, true)
    ()
  }
}
