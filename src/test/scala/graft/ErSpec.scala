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


  test("linkCatalogs: A-by-B pairs via per-side block keys, no a<b dedup, block isolation") {
    val a = Seq((1L, "acme corp", "x"), (2L, "beta inc", "y"))
      .toDF("id", "name", "blk")
    // B carries the block in a DIFFERENT field shape (prefixed) and
    // its own key space overlapping A's ids
    val b = Seq((1L, "acme corpe", "blk:x"), (7L, "acme co", "blk:x"),
        (8L, "gamma", "blk:z"))
      .toDF("vid", "vname", "vblk")
    val got = Er.linkCatalogs(a, "id", b, "vid",
      ac => ac("blk"),
      bc => regexp_replace(bc("vblk"), "^blk:", ""),
      Seq("d" -> ((ac, bc) =>
        levenshtein(ac("name"), bc("vname")).cast("long"))),
      keep = col("d") <= 2L)
      .orderBy("a_key", "b_key")
      .as[(Long, Long, Long)].collect().toSeq
    // a1 links BOTH x-block vendor rows (dist 1 and 2); b-key 1 here
    // is vendor id 1, not "self" — cross-catalog keys are unrelated.
    // beta/gamma blocks are isolated.
    assert(got === Seq((1L, 1L, 1L), (1L, 7L, 2L)))
  }

  test("entityClusters: transitive closure labels with component min; singletons keep own id") {
    val edges = pairs.filter(col("name_dist") <= 1L) // 1-2, 2-3 (chain)
    val got = Er.entityClusters(recs, "id", edges)
      .select("id", "entity_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  // ---- incremental entity store ----

  private def testSpec = Er.LinkSpec(
    keyCol = "id",
    blockKeys = Seq(ac => ac("blk")),
    features = Seq(
      "name_dist" -> ((ac, bc) =>
        levenshtein(ac("name"), bc("name")).cast("long")),
      "sz_diff" -> ((ac, bc) => abs(ac("sz") - bc("sz")).cast("long"))),
    keep = col("name_dist") <= 2L,
    isMatch = col("name_dist") <= 1L)

  private def dropStore(name: String): Unit =
    Seq("blocks", "labels", "remap").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))

  private def ingested(name: String, batch: org.apache.spark.sql.DataFrame) =
    Er.ingestBatch(spark, name, batch, testSpec)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("entity store: batch 2 resolves against batch 1's appended records") {
    try {
      Er.writeEntityStore(recs, "erstorea", testSpec, buckets = 4)
      // store entities: {1,2,3} -> 1 (chain), 4, 5 singletons
      val labs0 = Er.entityLabels(spark, "erstorea").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labs0 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
      // batch 1: 10 links to store record 5; 11 is brand new
      val b1 = ingested("erstorea", Seq(
        (10L, "acme labz", "x", 10L), (11L, "quark", "y", 5L))
        .toDF("id", "name", "blk", "sz"))
      assert(b1(10L) === (("matched", 5L, 5L)))
      assert(b1(11L) === (("unique", -1L, 11L)))
      // batch 2: 20 links to BATCH 1's record 11 — visible only
      // because ingest appended batch 1's blocks+labels to the store
      val b2 = ingested("erstorea", Seq((20L, "quarks", "y", 5L))
        .toDF("id", "name", "blk", "sz"))
      assert(b2(20L) === (("matched", 11L, 11L)))
      val labs = Er.entityLabels(spark, "erstorea").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labs(10L) === 5L && labs(11L) === 11L && labs(20L) === 11L)
    } finally dropStore("erstorea")
  }

  test("entity store: a bridging record merges two entities by remap rows only") {
    try {
      // A and B are dist 2 apart (candidates under keep, NOT matches)
      Er.writeEntityStore(Seq(
        (6L, "hello aa", "z", 1L), (7L, "hello bb", "z", 1L))
        .toDF("id", "name", "blk", "sz"), "erstoreb", testSpec, buckets = 4)
      // the batch record is dist 1 from BOTH -> bridges entity 6 and 7
      val b = ingested("erstoreb", Seq((30L, "hello ab", "z", 1L))
        .toDF("id", "name", "blk", "sz"))
      assert(b(30L) === (("matched", 6L, 6L)))
      val labs = Er.entityLabels(spark, "erstoreb").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labs === Map(6L -> 6L, 7L -> 6L, 30L -> 6L))
      // the merge landed as a remap row — the labels table still holds
      // 7's original root (never rewritten on ingest)
      val remap = spark.table("erstoreb_remap").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(remap === Map(7L -> 6L))
      val raw7 = spark.table("erstoreb_labels")
        .filter(col("rkey") === 7L).head.getLong(1)
      assert(raw7 === 7L)
      // compaction folds the remap in and empties it
      Er.compactEntityStore(spark, "erstoreb")
      assert(spark.table("erstoreb_remap").isEmpty)
      val labs2 = Er.entityLabels(spark, "erstoreb").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labs2 === labs)
    } finally dropStore("erstoreb")
  }

  test("entity store: replayed batch is idempotent (no self-match, no double append)") {
    try {
      Er.writeEntityStore(recs, "erstorec", testSpec, buckets = 4)
      val batch = Seq((10L, "acme labz", "x", 10L)).toDF("id", "name", "blk", "sz")
      val b1 = ingested("erstorec", batch)
      val nBlocks = spark.table("erstorec_blocks").count()
      val nLabels = spark.table("erstorec_labels").count()
      val b2 = ingested("erstorec", batch)
      assert(b2 === b1)
      assert(spark.table("erstorec_blocks").count() === nBlocks)
      assert(spark.table("erstorec_labels").count() === nLabels)
    } finally dropStore("erstorec")
  }

  test("entity store: batch block join reads the store with zero exchange") {
    try {
      Er.writeEntityStore(recs, "erstored", testSpec, buckets = 4)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val bb = Er.blockRows(
          Seq((10L, "acme labz", "x", 10L)).toDF("id", "name", "blk", "sz"),
          testSpec).select(col("skey"), col("id").as("b_id"))
        val j = bb.join(spark.table("erstored_blocks"), "skey")
        j.collect()
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        // the store-side subtree (below the SortMergeJoin, not in the
        // first child's ':' gutter) must scan bucketed, no Exchange —
        // the bucketed store write IS its shuffle; only the batch
        // side shuffles
        val storeSide = plan.linesIterator
          .dropWhile(!_.contains("SortMergeJoin")).drop(1)
          .filterNot(_.trim.startsWith(":")).mkString("\n")
        assert(storeSide.contains("Bucketed: true"), plan)
        assert(!storeSide.contains("Exchange"),
          s"store side must not re-shuffle:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally dropStore("erstored")
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
