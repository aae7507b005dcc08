package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing — the step between a cleaned corpus and a
  * pretraining data loader: assign every document a position inside a
  * fixed-capacity token window ("bin"), per shard.
  *
  * Two standard layouts, both deterministic and oracle-checked:
  *
  *  - '''Chunked (t12)''': documents are concatenated in shard order
  *    and the stream is cut every CAP tokens (GPT-style packing; a doc
  *    may straddle bins). Pure window arithmetic: one cumulative sum
  *    per shard → `start div CAP` / `start mod CAP`. ONE shuffle (the
  *    shard window), no state, no iteration — at 100 TB this is a
  *    single hash exchange on the shard key and scales like any
  *    windowed agg.
  *  - '''Greedy no-split (t13)''': first-fit sequential — a doc never
  *    straddles bins; a new bin opens when the current one can't hold
  *    the next doc whole; an oversize doc (> CAP) occupies its own
  *    bin. This needs running state with reset, which no window
  *    expresses — per-shard sequential fold via mapPartitions after
  *    ONE hash repartition on the shard key. Parallelism unit = the
  *    shard: at scale, pick n_shards ≈ cluster tasks and each task
  *    streams its shard once (the same shape a parquet writer task
  *    has). The oracle replays the identical fold as a DuckDB
  *    recursive CTE stepping row-rank by row-rank within each shard.
  *
  * Token counts use the whitespace tokenizer with established oracle
  * parity (t03): `size(split(trim(text),'\s+'))` ↔
  * `len(regexp_split_to_array(trim(text),'\s+'))`.
  *
  * Reference has no packing surface (it is an optimizer); this is part
  * of the training-data pipeline layer (brief §"beyond the reference").
  */
object Pack {
  type QFn = (SparkSession, String) => DataFrame

  val Cap = 512L // tokens per bin (context window stand-in)
  val NShards = 8

  /** (doc_id, shard, n_tokens) base — shard is mod-based here so the
    * oracle can replay it; a production ingest would hash.
    */
  def tokenBase(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      (col("doc_id") % NShards).cast("bigint").as("shard"),
      size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tokens"))

  /** The chunk-assign stage over any (doc_id, shard, n_tokens) base —
    * reused by the end-to-end pipeline ([[Pipeline]]) on its filtered
    * doc set.
    */
  def chunkAssign(base: DataFrame): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start div $Cap").as("start_bin"),
        (col("start") % Cap).as("bin_offset"),
        expr(s"(start + n_tokens - 1) div $Cap").as("end_bin"))
  }

  /** Chunked packing: cut the per-shard concatenated token stream
    * every [[Cap]] tokens. start_bin/end_bin are the bins the doc's
    * first/last token land in; bin_offset is the position of the
    * first token inside start_bin.
    */
  def packChunks(s: SparkSession, d: String): DataFrame =
    chunkAssign(tokenBase(Tables.documents(s, d))).orderBy("doc_id")

  /** Greedy no-split packing: first-fit sequential fold per shard. */
  def packGreedy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tokenBase(Tables.documents(s, d))
      .repartition(NShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var shard = Long.MinValue
        var fill = 0L
        var bin = 0L
        it.map { case (id, sh, n) =>
          if (sh != shard) { shard = sh; bin = 0L; fill = n }
          else if (fill + n <= Cap) { fill += n }
          else { bin += 1L; fill = n }
          (id, sh, n, bin, fill - n)
        }
      }
      .toDF("doc_id", "shard", "n_tokens", "bin_id", "bin_offset")
      .orderBy("doc_id")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    ("t12_pack_chunks", (s: SparkSession, d: String) =>
      packChunks(s, d), Some(s"""
      WITH t AS (
        SELECT doc_id, CAST(doc_id % $NShards AS BIGINT) AS shard,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, shard, n_tokens,
          CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        FROM t)
      SELECT doc_id, shard, n_tokens,
        start // $Cap AS start_bin,
        start % $Cap AS bin_offset,
        (start + n_tokens - 1) // $Cap AS end_bin
      FROM c ORDER BY doc_id""")),

    // the oracle replays the identical first-fit fold: recursive CTE
    // stepping per-shard row rank, carrying (bin, fill) state
    ("t13_pack_greedy", (s: SparkSession, d: String) =>
      packGreedy(s, d), Some(s"""
      WITH RECURSIVE t AS (
        SELECT doc_id, CAST(doc_id % $NShards AS BIGINT) AS shard,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      r AS (
        SELECT t.*, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM t),
      pack AS (
        SELECT doc_id, shard, n_tokens, rn,
          CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
          CASE WHEN p.fill + r.n_tokens <= $Cap THEN p.bin_id ELSE p.bin_id + 1 END,
          CASE WHEN p.fill + r.n_tokens <= $Cap THEN p.fill + r.n_tokens ELSE r.n_tokens END
        FROM pack p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
      SELECT doc_id, shard, n_tokens, bin_id, fill - n_tokens AS bin_offset
      FROM pack ORDER BY doc_id"""))
  )
}
