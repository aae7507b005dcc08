package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.fnv64
import graft.functions.simhash64

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: nothing here is all-pairs. MinHash/LSH shuffles
  * O(docs x bands) band-key rows and verifies Jaccard only inside
  * buckets; SimHash blocks on 16-bit chunks (pigeonhole: hamming<=6
  * over 64 bits guarantees one of 4 chunks is exact); n-gram Jaccard
  * scores against a query document (linear); exact dedup is one
  * hash-shuffle groupBy.
  */
object Dedup {
  type QFn = (SparkSession, String) => DataFrame

  /** distinct word-trigram shingles of `text`. */
  def shingles(text: Column): Column = {
    val w = split(trim(text), " ")
    array_distinct(
      transform(sequence(lit(1), greatest(size(w) - 2, lit(1))),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
  }

  /** Universal-hash family h_i(x) = (a_i*x + b_i) mod p over Z_p,
    * p = 2^31-1. Inputs are first reduced mod p so every product fits
    * in 63 bits — Spark 4 is ANSI mode, wrap-around would throw.
    */
  private val MinhashP = 2147483647L
  private val minhashParams: Seq[(Long, Long)] = {
    val r = new scala.util.Random(42)
    Seq.fill(32)(((r.nextInt((MinhashP - 1).toInt) + 1).toLong, r.nextInt(MinhashP.toInt).toLong))
  }

  /** MinHash+LSH near-duplicate pairs over (doc_id, text).
    *
    * Pipeline: shingle → 32-way minhash signature (one partial-agg
    * groupBy) → 8 bands of 4 → self-join on band key (the only
    * all-to-all shuffle, O(docs x 8) rows) → exact Jaccard verify on
    * bucket-collided candidates only. At 100 TB the band join's key
    * space keeps buckets tiny; skewed buckets are handled by AQE.
    */
  def minhashPairs(documents: DataFrame, jaccardMin: Double): DataFrame = {
    val docs = documents.select(col("doc_id"), shingles(col("text")).as("sh"))
    val hashed = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), pmod(fnv64(col("shingle")), lit(MinhashP)).as("h"))
    val sigCols = minhashParams.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MinhashP))).as(s"s$i")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bands = (0 until 8).map { b =>
      sigs.select(col("doc_id"), lit(b).as("band"),
        xxhash64(col(s"s${4 * b}"), col(s"s${4 * b + 1}"), col(s"s${4 * b + 2}"), col(s"s${4 * b + 3}")).as("bkey"))
    }.reduce(_ unionAll _)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-duplicate pairs over (doc_id, text): block on each
    * 16-bit chunk of the 64-bit signature — pigeonhole guarantees any
    * pair within hamming<=maxHamming (<16) collides on some chunk.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int): DataFrame = {
    val docs = documents.select(col("doc_id"), simhash64(col("text")).as("sig"))
    val chunks = (0 until 4).map { c =>
      docs.select(col("doc_id"), col("sig"), lit(c).as("chunk_id"),
        shiftrightunsigned(col("sig"), 16 * c).bitwiseAND(lit(0xffffL)).as("chunk"))
    }.reduce(_ unionAll _)
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_id") === col("y.chunk_id") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming).distinct()
      .orderBy("id_a", "id_b")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // ---- exact dedup: hash groupBy on content ----
    ("d01_dedup_exact", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy("keep_id")
    }, Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_id""")),

    // ---- MinHash + LSH near-dup pairs (no SQL oracle: custom hash) ----
    ("d02_dedup_minhash", (s: SparkSession, d: String) =>
      minhashPairs(Tables.documents(s, d), 0.5), None),

    // ---- SimHash near-dup pairs (no SQL oracle: custom hash) ----
    ("d03_dedup_simhash", (s: SparkSession, d: String) =>
      simhashPairs(Tables.documents(s, d), 6), None),

    // ---- n-gram Jaccard similarity vs a query document ----
    ("d04_ngram_jaccard", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), shingles(col("text")).as("sh"))
      val q = docs.filter(col("doc_id") === 0).select(col("sh").as("qsh"))
      docs.crossJoin(broadcast(q))
        .select(col("doc_id"),
          (size(array_intersect(col("sh"), col("qsh"))).cast("double") /
            size(array_union(col("sh"), col("qsh")))).as("jaccard"))
        .filter(col("doc_id") =!= 0 && col("jaccard") > 0)
        .orderBy("doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
      tri0 AS (
        SELECT doc_id, ws,
          unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
        FROM w),
      tri AS (
        SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tg
        FROM tri0),
      q AS (SELECT tg FROM tri WHERE doc_id = 0),
      inter AS (SELECT t.doc_id, count(*) AS ni FROM tri t JOIN q USING (tg) GROUP BY 1),
      sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY 1),
      qn AS (SELECT count(*) AS nq FROM q)
      SELECT s.doc_id,
        CAST(coalesce(ni, 0) AS DOUBLE) / (n + nq - coalesce(ni, 0)) AS jaccard
      FROM sizes s LEFT JOIN inter i ON s.doc_id = i.doc_id, qn
      WHERE s.doc_id <> 0 AND coalesce(ni, 0) > 0
      ORDER BY s.doc_id""")),

    // ---- embedding-cosine near-dup, blocked on label ----
    ("d05_dedup_embedding", (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("id_b"), col("label"), col("embedding").as("eb"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.vectorCosine(col("ea"), col("eb")), 6).as("cos"))
        .filter(col("cos") >= 0.35)
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               unnest(a.embedding) AS x, unnest(b.embedding) AS y
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id),
      sums AS (
        SELECT id_a, id_b,
          sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
          sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
          sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        FROM p GROUP BY id_a, id_b)
      SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM sums WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.35
      ORDER BY id_a, id_b"""))
  )
}
