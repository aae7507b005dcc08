package graft.operators

/** Reusable DuckDB SQL fragments that mirror graft's codegen hash
  * kernels bit-for-bit — wrapping 64-bit arithmetic expressed via
  * HUGEINT mod 2^64 — so custom-hash operators (simhash, minhash)
  * are held to the same exact-match oracle bar as plain SQL queries.
  *
  * ASCII corpora only: `unicode(substr(..))` reads code points while
  * the kernels read UTF-8 bytes — identical on ASCII (the gate
  * corpus is verified all-ASCII; non-ASCII text would need a byte-
  * level fold instead).
  */
object OracleSql {

  /** FNV-1a 64 of ASCII string expr `c`, as a DuckDB UBIGINT.
    * list_reduce folds (h XOR byte) * prime mod 2^64; the HUGEINT
    * widening keeps the 64x41-bit product exact before the mod. */
  def fnvU64(c: String): String = s"""
      list_reduce(
        list_prepend(CAST(14695981039346656037 AS UBIGINT),
          list_transform(range(1, length($c)+1),
            i -> CAST(unicode(substr($c, i, 1)) AS UBIGINT))),
        (h, b) -> CAST(CAST(xor(h, b) AS HUGEINT) * 1099511628211
                       % 18446744073709551616 AS UBIGINT))"""

  /** Two's-complement signed view of a UBIGINT expr — parity with the
    * Spark kernels' Long results. */
  def signed(c: String): String =
    s"""CAST(CAST($c AS HUGEINT) -
        CASE WHEN $c >= 9223372036854775808 THEN 18446744073709551616
             ELSE 0 END AS BIGINT)"""

  /** CTE chain `planes, dots, lshkeys` recomputing the banded-LSH
    * bucket keys of the embeddings table exactly as the
    * [[graft.functions.GraftVec.lshKeys]] kernel does: hash-derived
    * hyperplane components (two integer mix rounds, multiples of
    * 2^-11 — bit-exact in SQL), per-plane dot products, sign bits
    * packed per table. Compose with a `pairs` join on (tbl, bkey). */
  def lshKeysCtes(tables: Int, bits: Int): String = s"""
      planes AS (
        SELECT p, j, ((((xor(x1, x1 >> 16) * 73244475) % 4294967296) >> 21)
                      / 2048.0) - 0.5 AS hv
        FROM (
          SELECT p, j, (xor(x0, x0 >> 16) * 73244475) % 4294967296 AS x1
          FROM (SELECT pr.range AS p, jr.range AS j,
                  ((pr.range * 64 + jr.range) * 2654435761) % 4294967296 AS x0
                FROM range(${tables * bits}) pr, range(64) jr))),
      dots AS (
        SELECT e.vec_id, pl.p,
          sum(CAST(e.embedding[pl.j + 1] AS DOUBLE) * pl.hv) AS d
        FROM embeddings e, planes pl GROUP BY e.vec_id, pl.p),
      lshkeys AS (
        SELECT vec_id, p // $bits AS tbl,
          CAST(sum(CASE WHEN d > 0 THEN 1 << (p % $bits) ELSE 0 END) AS BIGINT) AS bkey
        FROM dots GROUP BY vec_id, p // $bits)"""

  /** The minhash universal-hash constants as a VALUES table
    * `(i, a, b)` with 0-based i — generated from the same arrays the
    * codegen kernel uses, so the oracle can recompute signatures. */
  def minhashConstsValues: String =
    graft.functions.GraftHash.minhashConsts.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
      .mkString("(VALUES ", ", ", ")")
}
