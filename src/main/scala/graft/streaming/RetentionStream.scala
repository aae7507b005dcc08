package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming cohort retention — ss05's dashboard shape: the matrix is
  * re-published every micro-batch as new events arrive. State is the
  * COMPACT activity store of distinct (user_id, week) pairs (the
  * bot-proof collapse: bounded by users x weeks, never event volume),
  * not executor memory — the same store-resident pattern as
  * [[DedupStream]].
  *
  * Per micro-batch: collapse the batch to its user-weeks, anti-join
  * the store so only NEVER-SEEN pairs append (a replayed batch
  * appends nothing — the store self-heals, like the signature store),
  * then recompute the matrix FROM THE STORE and overwrite the output.
  * Recomputing from the store rather than applying deltas is what
  * makes a crash between the two writes harmless: the matrix is a
  * pure function of the store, so any replay converges to the same
  * output. Per-batch cost: batch collapse + one agg over the compact
  * store; the matrix itself is O(weeks²) rows.
  */
object RetentionStream {

  /** `eventStream` must carry (user_id, ts). Matrix lands at
    * `outPath` (full overwrite — it is cohort x offset, tiny);
    * activity pairs accumulate at `storePath`.
    */
  def start(storePath: String, eventStream: DataFrame,
      outPath: String, checkpoint: String): StreamingQuery =
    eventStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val pairs = graft.operators.Sessionize.activityWeeks(batch)
        val existing =
          try spark.read.parquet(storePath)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              pairs.schema)
          }
        pairs.join(existing, Seq("user_id", "week"), "left_anti")
          .write.mode("append").parquet(storePath)
        graft.operators.Sessionize
          .retentionFromWeeks(spark.read.parquet(storePath))
          .write.mode("overwrite").parquet(outPath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
