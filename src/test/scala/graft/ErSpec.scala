package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Er

/** Constructed-frame semantics for entity resolution (er01–er03 cover
  * sf-data parity end-to-end).
  */
class ErSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def recs = Seq(
    (1L, "acme corp", "x", 10L),
    (2L, "acme corpe", "x", 10L),  // 1↔2: dist 1, same block
    (3L, "acme corpes", "x", 30L), // chains to 2 (dist 1), far from 1 (dist 2)
    (4L, "zenith", "y", 10L),      // different block — never paired
    (5L, "acme labs", "x", 10L)    // same block, dist too far
  ).toDF("id", "name", "blk", "sz")

  private def pairs = Er.candidatePairs(recs, "id",
    ac => ac("blk"),
    Seq("name_dist" -> ((ac, bc) =>
        levenshtein(ac("name"), bc("name")).cast("long")),
      "sz_diff" -> ((ac, bc) => abs(ac("sz") - bc("sz")).cast("long"))),
    keep = col("name_dist") <= 2L)

  test("candidatePairs: block isolation, canonical order, feature filter") {
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 4 never appears (own block); 5 pruned by name_dist; 1-3 dist 2 kept
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L)))
    assert(pairs.collect().forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("candidatePairs plans a hash join on the block key, no cartesian") {
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("entityClusters: transitive closure labels with component min; singletons keep own id") {
    val edges = pairs.filter(col("name_dist") <= 1L) // 1-2, 2-3 (chain)
    val got = Er.entityClusters(recs, "id", edges)
      .select("id", "entity_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("golden-record election: min(struct) picks the min-key member's attrs") {
    val edges = pairs.filter(col("name_dist") <= 1L)
    val clustered = Er.entityClusters(recs, "id", edges)
    val got = clustered.groupBy(col("entity_id"))
      .agg(min(struct(col("id"), col("name"))).as("_c"),
        count(lit(1)).as("n"))
      .select(col("entity_id"), col("_c.name").as("canon"), col("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got(1L) === (("acme corp", 3L)))
    assert(got(4L) === (("zenith", 1L)))
  }
}
