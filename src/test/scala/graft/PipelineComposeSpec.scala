package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pack, Pipeline, TextOps}

/** p01: the composed pipeline must agree with its standalone stages. */
class PipelineComposeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  test("p01 manifest = gate-passing, dedup-surviving docs, chunk-packed") {
    val manifest = Pipeline.trainingManifest(spark, sf).collect()
    val ids = manifest.map(_.getLong(0)).toSet
    assert(ids.nonEmpty)

    // every manifest doc passes the standalone t10 gate
    val keep = TextOps.gopherRules(graft.sources.Tables.documents(spark, sf))
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keep))
    // something was actually filtered (the gate + dedup earn their keep)
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(ids.size < total)

    // packing invariant holds per shard over the SURVIVING doc set
    manifest.groupBy(_.getLong(1)).foreach { case (_, docs) =>
      var start = 0L
      docs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) === start / Pack.Cap, s"doc ${r.getLong(0)} start_bin")
        assert(r.getLong(4) === start % Pack.Cap, s"doc ${r.getLong(0)} bin_offset")
        start += r.getLong(2)
      }
    }
  }

  test("p02 five-stage pipeline: one AQE plan, bounded exchange budget") {
    val df = Pipeline.trainingManifestFull(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // ONE Catalyst plan end-to-end — no stage materializes an
    // intermediate (the five-stages-one-plan claim, evidenced)
    assert(plan.linesIterator.next().contains("AdaptiveSparkPlan"), plan)
    // exchange budget: the normalize-window partials (the dedup form
    // is recomputed per consuming branch), the per-source count agg,
    // decontamination's shingle stages, and the shard packing window —
    // a future stage that sneaks in an extra corpus shuffle breaks
    // this loudly. (At sf0.01 the count is 7; AQE may elide the
    // decontamination join entirely via empty-relation propagation
    // when nothing is contaminated.)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(hashEx <= 7, s"hash-exchange budget exceeded: $hashEx\n$plan")
    assert(rangeEx === 1, s"expected exactly the final ORDER BY exchange\n$plan")
    // small sides must stay broadcast — the corpus is never shuffled
    // against the rate table or the keep-sets
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("p01 dedup stage: no two manifest docs share a normalized form") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val ids = Pipeline.trainingManifest(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val normed = docs.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " ")).as("ntext"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val surviving = normed.filter { case (id, _) => ids.contains(id) }
    assert(surviving.map(_._2).distinct.length === surviving.length)
    // and each survivor is the lowest gate-passing id of its group
    val keep = TextOps.gopherRules(docs).filter(col("keep"))
      .collect().map(_.getLong(0)).toSet
    val lowestPerForm = normed.filter(n => keep.contains(n._1))
      .groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    assert(ids === lowestPerForm)
  }

  test("p03 retrieval: ranked chunks exist, exclude the query doc, and share query terms") {
    val fn = Pipeline.entries.find(_._1 == "p03_retrieval_pipeline").get._2
    val df = fn(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the query doc's own chunks never rank
    assert(rows.forall(_.getLong(0) != 0L))
    // scores are descending with the declared tiebreak
    val scores = rows.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    // retrieval sanity: the top-ranked chunk shares >= 1 term with
    // the query (doc 0's words) — resolved against the real chunker
    val docs = graft.sources.Tables.documents(spark, sf)
    val qWords = docs.filter(col("doc_id") === 0).select("text")
      .head().getString(0).trim.split(" ").filter(_.nonEmpty).toSet
    val top = rows.head
    val chunkText = TextOps.chunkOverlap(docs)
      .filter(col("doc_id") === top.getLong(0) &&
        col("chunk_id") === top.getLong(1))
      .select("chunk_text").head().getString(0)
    assert(chunkText.split(" ").exists(qWords.contains))
  }
}
