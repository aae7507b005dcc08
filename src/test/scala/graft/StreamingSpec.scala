package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, Events}

/** Streaming twins must agree with their batch-parity operators. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  /** The parquet file-stream source requires a directory: stage the
    * single events.parquet into a temp dir.
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly agg equals batch q32 result") {
    val stream = Events.hourlyAgg(Events.readStream(spark, streamDir))
    val q = stream.writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .select("hour_start", "event_type", "n", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q32_events_window")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stateful sessionize: emitted + open sessions match batch ss01") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf)
    val batchSessions = SparkEntry.queries("ss01_sessionize")(spark, sf).count()
    val nUsers = events.select("user_id").distinct().count()

    val streamed = Events.sessionize(
      Events.readStream(spark, streamDir)
        .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
          col("user_id"), col("event_type"), col("value")).as[Event],
      gapUs = 30L * 60 * 1000 * 1000)
    val q = streamed.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.table("sess_out").count()
    // single micro-batch: each user's final session is still open in
    // state, so emitted = total sessions - one open session per user
    assert(emitted === batchSessions - nUsers)
  }
}
