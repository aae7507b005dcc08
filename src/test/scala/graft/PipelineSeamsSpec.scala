package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DecodedRow, MediaCodec, MediaRow, Multimodal, TextOps}

/** The tokenizer/codec injection seams: a real BPE or media codec
  * drops in behind a trait whose open() runs once per partition —
  * these tests prove the plumbing (per-partition init count, schema,
  * parity with the default path) with fake implementations.
  */
class PipelineSeamsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  test("Tokenizer seam: injected tokenizer runs via mapPartitions, one open per partition") {
    val opens = spark.sparkContext.longAccumulator("tok_opens")
    val wsTok = new TextOps.Tokenizer {
      def open(): String => Long = {
        opens.add(1L) // stands in for loading merges/vocab
        s => s.split("\\s+").count(_.nonEmpty).toLong
      }
    }
    val docs = graft.sources.Tables.documents(spark, sf).repartition(4)
    val got = TextOps.tokenCounts(docs, wsTok)
    assert(got.columns.toSeq === Seq("doc_id", "n_tokens"))
    val sample = got.orderBy("doc_id").limit(3).collect()
    val expect = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("bigint").as("n"))
      .orderBy("doc_id").limit(3).collect()
    assert(sample.map(_.getLong(1)).toSeq === expect.map(_.getLong(1)).toSeq)
    assert(opens.value === 4L, s"expected one open() per partition, got ${opens.value}")
  }

  test("Tokenizer seam: default regex tokenizer plans as a codegen column (no lambda)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val plan = TextOps.tokenCounts(docs).queryExecution.optimizedPlan.toString
    // regexp_count rewrites to size(regexp_extract_all(..)) in Catalyst
    assert(plan.contains("regexp_count") || plan.contains("regexp_extract_all"),
      plan.take(2000))
    assert(!plan.contains("MapPartitions"), plan.take(2000))
  }

  test("Tokenizer seam: injected counter agrees with the default on the same pattern") {
    val reTok = new TextOps.Tokenizer {
      def open(): String => Long = {
        val p = java.util.regex.Pattern.compile(TextOps.RegexTokenizer.pattern)
        s => { val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n }
      }
    }
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = TextOps.tokenCounts(docs).orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val b = TextOps.tokenCounts(docs, reTok).orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }

  test("MediaCodec seam: injected codec replaces the stub decode") {
    val opens = spark.sparkContext.longAccumulator("codec_opens")
    val fixed = new MediaCodec {
      def open(): MediaRow => DecodedRow = {
        opens.add(1L) // stands in for native library init
        m => DecodedRow(m.doc_id, m.media_type, 1920L, 1080L, 1L)
      }
    }
    val out = Multimodal.decoded(spark, sf, fixed)
    assert(out.columns.toSeq ===
      Seq("doc_id", "media_type", "width", "height", "n_frames"))
    val rows = out.limit(5).collect()
    assert(rows.forall(r => r.getLong(2) == 1920L && r.getLong(3) == 1080L))
    assert(opens.value >= 1L)
  }
}
