package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Functional checks for the hash-based near-dup pipelines on
  * constructed edge cases (the synthetic corpus has no near-dups, so
  * the sf queries exercise plumbing; these exercise detection).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hills near the old stone bridge"
  private val near = "the quick brown fox jumps over the lazy dog while snow falls on the quiet hills near the old stone bridge"
  private val far = "completely different words appear here with nothing shared at all between these two documents in any way whatsoever"

  test("minhashPairs finds near-duplicates, skips unrelated docs") {
    val pairs = Dedup.minhashPairs(docs(1L -> base, 2L -> near, 3L -> far), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("minhashPairs finds exact duplicates with jaccard 1.0") {
    val rows = Dedup.minhashPairs(docs(1L -> base, 2L -> base), 0.99).collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 1.0)
  }

  test("simhashPairs blocks+verifies within hamming radius") {
    val pairs = Dedup.simhashPairs(docs(1L -> base, 2L -> near, 3L -> far), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((2L, 3L)))
  }
}
