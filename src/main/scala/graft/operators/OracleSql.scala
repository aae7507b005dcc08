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

  /** The minhash universal-hash constants as a VALUES table
    * `(i, a, b)` with 0-based i — generated from the same arrays the
    * codegen kernel uses, so the oracle can recompute signatures. */
  def minhashConstsValues: String =
    graft.functions.GraftHash.minhashConsts.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
      .mkString("(VALUES ", ", ", ")")
}
