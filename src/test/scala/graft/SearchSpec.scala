package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Constructed-frame semantics + stored-index plan shape for the
  * inverted-index family (ix01/ix02 cover sf-data parity).
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c a b"),
    (2L, "b a  b"), // double space: positions stable, no phantom token
    (3L, "c c c"),
    (4L, "a a a")
  ).toDF("doc_id", "text")

  test("postings: raw-stream positions survive repeated separators") {
    val got = Search.postings(docs).filter(col("doc_id") === 2L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    // split of "b a  b" = [b, a, "", b] — empty dropped, pos 3 kept
    assert(got === Set(("b", 0L), ("a", 1L), ("b", 3L)))
  }

  test("conjunctiveSearch: ALL terms required, duplicates don't double-count") {
    val p = Search.postings(docs)
    assert(Search.conjunctiveSearch(p, Seq("a", "b")).collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(Search.conjunctiveSearch(p, Seq("a", "b", "c")).collect()
      .map(_.getLong(0)).toSet === Set(1L))
  }

  test("phraseSearch: anchor trick counts overlapping hits of a repeated-word phrase") {
    val p = Search.postings(docs)
    // "a a" in doc 4 ("a a a"): anchors 0 and 1 — overlapping hits
    assert(Search.phraseSearch(p, Seq("a", "a")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap === Map(4L -> 2L))
    // "a b" occurs twice in doc 1; doc 2's a..b gap (pos 1→3) is NOT
    // adjacent in the raw stream, so it must not match
    assert(Search.phraseSearch(p, Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap === Map(1L -> 2L))
  }

  test("stored postings: term lookup prunes buckets; store side of the query reads bucketed") {
    val path = Files.createTempDirectory("graft-postings").toString + "/ix"
    try {
      Search.writePostingsStore(docs, path, "b_postings", nBuckets = 8)
      val q = Search.conjunctiveSearch(
        spark.table("b_postings"), Seq("a", "b"))
      assert(q.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"), plan)
      // bucket pruning: the scan must read only the buckets 'a' and
      // 'b' hash to, not all 8
      val sel = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(plan)
      assert(sel.nonEmpty, s"no bucket pruning in plan:\n$plan")
      assert(sel.get.group(1).toInt <= 2, plan)
    } finally spark.sql("DROP TABLE IF EXISTS b_postings")
  }
}
