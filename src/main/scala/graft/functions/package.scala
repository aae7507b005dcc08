package graft

import org.apache.spark.sql.{Column, GraftBridge}

/** Typed Column wrappers over graft's native Catalyst expressions.
  * Usable on any session (no registry needed); the SQL names
  * (`graft_fnv64`, ...) are additionally injected by
  * [[graft.plans.GraftExtensions]].
  */
package object functions {
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def ex(c: Column) = GraftBridge.expression(c)

  /** FNV-1a 64-bit hash of a string column. */
  def fnv64(c: Column): Column = col(expr.Fnv64(ex(c)))

  /** SQL-portable positional polynomial document fingerprint. */
  def polyFingerprint(c: Column): Column = col(expr.PolyFingerprint(ex(c)))

  /** 64-bit SimHash over whitespace tokens. */
  def simhash64(c: Column): Column = col(expr.SimHash64(ex(c)))

  /** Distinct FNV-1a hashes of word n-gram shingles (single pass). */
  def shingleHashes(c: Column, n: Int = 3): Column = col(expr.ShingleHashes(ex(c), n))

  /** Banded edit distance: exact when ≤ bound, else bound+1 (capped).
    * O(len·bound) + early abandon vs the builtin's full lattice. */
  def boundedLevenshtein(a: Column, b: Column, bound: Int): Column =
    col(expr.BoundedLevenshtein(ex(a), ex(b), bound))

  /** Textbook Jaro-Winkler similarity of two string columns (double,
    * bit-identical to DuckDB's jaro_winkler_similarity). */
  def jaroWinkler(a: Column, b: Column): Column =
    col(expr.JaroWinkler(ex(a), ex(b)))

  /** True (unrestricted) Damerau-Levenshtein distance of two string
    * columns (bigint, bit-identical to DuckDB's
    * damerau_levenshtein). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    col(expr.DamerauLevenshtein(ex(a), ex(b)))

  /** Morton/Z-order code of two long columns (low 32 bits each). */
  def zorder(a: Column, b: Column): Column =
    col(expr.ZOrder(ex(a.cast("bigint")), ex(b.cast("bigint"))))

  /** Aggregate: 32-wide minhash signature over a long hash column. */
  def minhashSig(c: Column): Column =
    col(expr.MinHashSig(ex(c)).toAggregateExpression())

  /** Aggregate: theta sketch (compact bytes) over a long column. */
  def thetaSketch(c: Column): Column =
    col(expr.ThetaSketchAgg(ex(c)).toAggregateExpression())

  /** Aggregate: Misra-Gries heavy-hitter candidate set (array of
    * strings) over a string column, `cap` counters. */
  def mgSketch(c: Column, cap: Int): Column =
    col(expr.MisraGriesAgg(ex(c), cap).toAggregateExpression())

  /** Aggregate: Spark's bloom-filter sketch (serialized bytes) over a
    * LONG column. Partial blooms OR-merge map-side, so the build is
    * one tree-aggregated pass with no pre-shuffle; the result is a
    * fixed `numBits/8`-byte sidecar object regardless of input size.
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.functions.lit
    col(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      ex(c), ex(lit(expectedItems)), ex(lit(numBits))).toAggregateExpression())
  }

  /** Map-only membership probe of a driver-held serialized bloom over
    * a LONG column: the filter bytes ride the plan as a literal
    * (deserialized once, probe stays in codegen), so no join, shuffle,
    * or broadcast exchange appears in the plan. May return false
    * positives, never false negatives.
    */
  def bloomMightContain(bf: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.functions.lit
    col(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      ex(lit(bf)), ex(c)))
  }

  /** Distinct-count estimate of a theta-sketch column. */
  def thetaEstimate(c: Column): Column = col(expr.ThetaEstimate(ex(c)))

  /** Intersection-cardinality estimate of two theta-sketch columns. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    col(expr.ThetaIntersectEstimate(ex(a), ex(b)))

  /** Fused set-Jaccard of two long-hash-array columns (one merge pass). */
  def jaccardHashes(a: Column, b: Column): Column =
    col(expr.JaccardHashes(ex(a), ex(b)))

  /** Dot product of two float-array columns (double). */
  def vectorDot(a: Column, b: Column): Column = col(expr.VectorDot(ex(a), ex(b)))

  /** L2 norm of a float-array column (double). */
  def vectorNorm(a: Column): Column = col(expr.VectorNorm(ex(a)))

  /** Cosine similarity of two float-array columns (double). */
  def vectorCosine(a: Column, b: Column): Column = col(expr.VectorCosine(ex(a), ex(b)))

  /** Banded-LSH bucket keys (array of `tables` longs) of a
    * float-vector column — one codegen pass over all hyperplanes. */
  def lshBucketKeys(c: Column, tables: Int, bits: Int): Column =
    col(expr.LshBucketKeys(ex(c), tables, bits))

  /** `yyyy-MM-dd HH:mm:ss` (UTC) of a timestamp column — integer-math
    * kernel, bit-identical to date_format in a UTC session. */
  def fmtTimestamp(c: Column): Column = col(expr.FormatTimestamp(ex(c)))

  /** First index where two long-array columns agree (-1 if none). */
  def firstMatch(a: Column, b: Column): Column = col(expr.FirstMatch(ex(a), ex(b)))

  /** One-pass word-span surgery on a text column (d16):
    * struct(clean_text, n_words, n_removed). `starts`/`ends` are
    * sorted disjoint 1-based word-index bounds. */
  def spanCut(text: Column, starts: Column, ends: Column): Column =
    col(expr.SpanCut(ex(text), ex(starts), ex(ends)))

  /** PQ assignment of a float-vector column against a flattened
    * j-major codebook: struct(codes array<long>, recon_err double). */
  def pqAssign(c: Column, cb: Array[Double], m: Int, k: Int): Column =
    col(expr.PqAssign(ex(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(cb), m, k))

  /** Codes-only PQ assignment to m bytes (binary) — the stored-index
    * write kernel. */
  def pqCodes(c: Column, cb: Array[Double], m: Int, k: Int): Column =
    col(expr.PqCodes(ex(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(cb), m, k))

  /** ADC distance of stored byte codes; `slot` indexes the probed
    * cell's m×k block in the flat LUT table. */
  def adcDist(codes: Column, slot: Column, luts: Array[Double], m: Int, k: Int): Column =
    col(expr.AdcDist(ex(codes), ex(slot.cast("int")),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(luts), m, k))

  /** y = M·x against a row-major d×d matrix (OPQ rotation apply). */
  def matVec(c: Column, mat: Array[Double], d: Int): Column =
    col(expr.MatVec(ex(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(mat), d))
}
