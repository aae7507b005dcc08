package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end training-data pipeline: the library's operators composed
  * the way a real corpus run chains them —
  *
  *   raw docs → hard quality gate (t10 Gopher rules)
  *            → normalized exact-dedup keep-set (d15 semantics)
  *            → sequence packing into context windows (t12 chunked)
  *            → per-doc training manifest (doc → shard/bin/offset)
  *
  * Each stage is the SAME operator code the standalone entries run
  * ([[TextOps.gopherRules]], d15's normalization expression,
  * [[Pack.chunkAssign]]) — the entry proves they compose into one
  * Catalyst plan, and the oracle chains the standalone oracles' CTEs
  * verbatim, so the composition is bit-exact end to end.
  *
  * Shuffle budget at 100 TB: the gate is a pure codegen column map
  * fused into the single scan pass; the keep-set is ONE hash shuffle
  * (row_number over the normalized text, lowest doc_id kept — same
  * survivors as d15's groupBy(min), without the second scan and
  * semi-join a groupBy formulation costs); packing is ONE window
  * exchange on the shard key. Two shuffles, one scan, end to end. No
  * stage widens rows beyond (doc_id, text) and the manifest output is
  * 5 BIGINTs — nothing accumulates driver-side or fans out
  * quadratically.
  */
object Pipeline {
  type QFn = (SparkSession, String) => DataFrame

  /** d15's normalization: lowercase, strip non-alnum, collapse runs. */
  private val norm = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))

  def trainingManifest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // single-file parquet: spread the CPU-bound gate across cores
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)

    // stage 1 — hard quality gate (t10's gopherReason column, applied
    // inline so it fuses into the one scan pass)
    val kept = docs.filter(TextOps.gopherReason.isNull)

    // stage 2 — normalized exact-dedup keep-set (d15 semantics: lowest
    // doc_id survives per normalized form), as a window rank so the
    // text is scanned once and no join re-materializes it
    val uniq = kept
      .withColumn("rk", row_number().over(
        Window.partitionBy(norm).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .drop("rk")

    // stage 3 — chunked packing over the surviving docs (t12 stage)
    Pack.chunkAssign(Pack.tokenBase(uniq))
      .select("doc_id", "shard", "n_tokens", "start_bin", "bin_offset")
      .orderBy("doc_id")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // the oracle chains t10's gate CTEs, d15's normalization, and
    // t12's window arithmetic — the standalone oracles composed
    ("p01_pipeline", (s: SparkSession, d: String) =>
      trainingManifest(s, d), Some(s"""
      WITH f AS (SELECT doc_id, text,
                   list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
                 FROM documents),
      m AS (SELECT doc_id,
              CAST(len(ws) AS BIGINT) AS n,
              CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS sumlen,
              len(list_filter(ws, w -> w IN ('the','a','of','in','is'))) AS stopc,
              len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alphac,
              length(replace(text, ' ', '')) AS nonspace,
              length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS sym
            FROM f),
      gate AS (SELECT doc_id FROM m
               WHERE n BETWEEN 10 AND 100000
                 AND sumlen >= n * 3 AND sumlen <= n * 10
                 AND stopc >= 2 AND alphac * 5 >= n * 4
                 AND sym * 10 <= nonspace),
      kept AS (SELECT d.doc_id, d.text FROM documents d JOIN gate USING (doc_id)),
      nrm AS (SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                     ' +', ' ', 'g')) AS ntext
              FROM kept),
      keepers AS (SELECT min(doc_id) AS doc_id FROM nrm GROUP BY ntext),
      t AS (SELECT k.doc_id, CAST(k.doc_id % ${Pack.NShards} AS BIGINT) AS shard,
              CAST(len(regexp_split_to_array(trim(k.text), '\\s+')) AS BIGINT) AS n_tokens
            FROM kept k JOIN keepers USING (doc_id)),
      c AS (SELECT doc_id, shard, n_tokens,
              CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
            FROM t)
      SELECT doc_id, shard, n_tokens,
        start // ${Pack.Cap} AS start_bin,
        start % ${Pack.Cap} AS bin_offset
      FROM c ORDER BY doc_id"""))
  )
}
