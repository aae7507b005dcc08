package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One event, micro-truncated epoch micros for state arithmetic. */
case class Event(event_id: Long, ts_us: Long, user_id: Long, event_type: String, value: Double)

/** Emitted closed session. */
case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Per-user open-session state. */
case class SessionState(start_us: Long, last_us: Long, n: Long)

/** Open-session state for [[Events.sessionizePaths]]: the bounded
  * event-type prefix rides along with the gap bookkeeping. */
case class PathState(start_us: Long, last_us: Long, n: Long,
  prefix: List[String])

/** A closed session's path emission. */
case class SessionPath(user_id: Long, start_us: Long, path: String,
  n_events: Long)

/** Structured Streaming pipelines over the events table.
  *
  * The batch-parity forms of these live in operators (q32 hourly
  * windows, ss01 sessionization); here the same logic runs as
  * incremental streams: file-source parquet → watermark → windowed
  * aggregation, and flatMapGroupsWithState for gap sessionization.
  * At scale the file source becomes Kafka; nothing else changes.
  */
object Events {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Parquet schema of the events table with `ts` of the given type —
    * the streaming source needs an explicit schema, and the on-disk ts
    * type has shipped as both TIMESTAMP(NANOS)-as-long and
    * TIMESTAMP(MICROS) (see [[graft.sources.Tables.events]]).
    */
  def schemaWith(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files (the
    * file source requires a directory; at scale this is the landing
    * path new files arrive in, or a Kafka source instead). The ts type
    * is probed ONCE at stream definition from files already in the
    * landing dir (a batch-read of the footer only — no data scan); an
    * empty dir defaults to the current µs-timestamp generation, and
    * the probed/defaulted choice is logged because a wrong guess
    * only surfaces when data lands. PRODUCTION streams over an
    * initially-EMPTY landing dir must pin the generation explicitly
    * via `tsType` (both generations have shipped — see
    * [[graft.sources.Tables.events]]): if the first files to arrive
    * are the TIMESTAMP(NANOS)-as-long generation while the schema
    * defaulted to µs, micro-batches fail or misread. Output contract
    * matches Tables.events: ts TIMESTAMP + ts_ns BIGINT.
    */
  def readStream(spark: SparkSession, dir: String,
      tsType: Option[org.apache.spark.sql.types.DataType] = None): DataFrame = {
    val resolved = tsType.getOrElse {
      val probed = scala.util.Try(spark.read.parquet(dir).schema("ts").dataType)
      log.info(s"Events.readStream($dir): ts type ${probed.toOption
        .map(t => s"probed as $t").getOrElse("defaulted to TimestampNTZType (empty landing dir)")}")
      probed.getOrElse(TimestampNTZType)
    }
    val stream = spark.readStream.schema(schemaWith(resolved)).parquet(dir)
    resolved match {
      case LongType =>
        stream.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        stream.withColumn("ts_ns",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Hourly tumbling-window counts+sums with a 2h watermark —
    * streaming twin of q32_events_window.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup: keep the first event per key, with state
    * bounded by the watermark (dropDuplicatesWithinWatermark evicts
    * key state once the watermark passes it — without the watermark
    * bound, dedup state grows without limit, which is the failure mode
    * of a naive streaming dedup at 100 TB/day). Streaming twin of the
    * d01 exact-dedup family for event streams.
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Gap-based sessionization via flatMapGroupsWithState — streaming
    * twin of ss01_sessionize. Emits closed sessions; open sessions
    * stay in state across micro-batches.
    */
  def sessionize(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var cur = state.getOption
      val out = Seq.newBuilder[Session]
      sorted.foreach { e =>
        cur match {
          case Some(st) if e.ts_us - st.last_us <= gapUs =>
            cur = Some(st.copy(last_us = e.ts_us, n = st.n + 1))
          case Some(st) =>
            out += Session(userId, st.start_us, st.last_us, st.n)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming twin of ss10's session paths: gap sessionization that
    * also carries each OPEN session's first-`prefixLen` event-type
    * prefix in state (O(P) strings + 3 longs per user — the ss10
    * bound, bot-proof by construction) and emits the finished path
    * when the session closes. A session spanning micro-batches emits
    * ONE path whose prefix crosses the batch boundary — state is the
    * bridge, exactly like [[sessionize]]'s open-session counts.
    */
  def sessionizePaths(events: Dataset[Event], gapUs: Long,
      prefixLen: Int): Dataset[SessionPath] = {
    import events.sparkSession.implicits._
    require(prefixLen >= 1, s"need prefixLen >= 1, got $prefixLen")
    def close(userId: Long, st: PathState): SessionPath =
      SessionPath(userId, st.start_us, st.prefix.mkString(">"), st.n)
    def fn(userId: Long, it: Iterator[Event],
        state: GroupState[PathState]): Iterator[SessionPath] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var cur = state.getOption
      val out = Seq.newBuilder[SessionPath]
      sorted.foreach { e =>
        cur match {
          case Some(st) if e.ts_us - st.last_us <= gapUs =>
            cur = Some(st.copy(last_us = e.ts_us, n = st.n + 1,
              prefix = if (st.prefix.length < prefixLen)
                st.prefix :+ e.event_type else st.prefix))
          case Some(st) =>
            out += close(userId, st)
            cur = Some(PathState(e.ts_us, e.ts_us, 1, List(e.event_type)))
          case None =>
            cur = Some(PathState(e.ts_us, e.ts_us, 1, List(e.event_type)))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
