package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics over edge DataFrames — the family next
  * to [[Dedup.connectedComponents]]'s label propagation. PageRank is
  * the canonical member: influence scoring over the near-dup /
  * citation / link graph a curation pipeline builds anyway (rank
  * duplicates' canonical docs, find hub documents feeding many
  * near-dups).
  *
  * Reference anchor: keenwa models iterative/recursive computation
  * via its logical operator enum (src/operators/relational/logical/
  * mod.rs); graft expresses each ROUND as a declarative join+agg plan
  * and lets Catalyst optimize the round body.
  */
object Graph {
  type QFn = (SparkSession, String) => DataFrame

  /** Ranks are scaled BIGINTs in units of 1e-12 — float-free. */
  val RankScale = 1000000000000L

  /** Fixed-iteration PageRank on a DIRECTED edge list (src, dst) —
    * pass both directions for an undirected graph. Nodes = edge
    * endpoints. The simplified propagation variant (dangling mass not
    * redistributed): r'(v) = (1−d)/n + d·Σ_{u→v} r(u)/deg(u), with
    * d = dampingNum/dampingDen.
    *
    * DETERMINISM: ranks are INTEGERS in 1e-12 units; each round's
    * contribution is `r*dampingNum div (deg*dampingDen)` — floor
    * division on positives, summed exactly. ZERO float operations in
    * the whole fixpoint chain, so it replays bit-identically on any
    * engine (the oracle unrolls the same rounds in SQL). Headroom:
    * r ≤ 1e12, ×85 ≈ 8.5e13 ≪ 2^63 — ANSI-safe.
    *
    * SCALE: each round is one join of edges against the (node, rank)
    * frame plus a partial-aggregable groupBy(dst) — cost ∝ edges per
    * round, never n². Fixed `iters` keeps the plan finite; for deep
    * chains cut lineage with localCheckpoint every ~10 rounds (the
    * [[Dedup.connectedComponents]] cadence).
    */
  def pageRank(edges: DataFrame, iters: Int,
      dampingNum: Long = 85L, dampingDen: Long = 100L): DataFrame = {
    // lineage cuts, CC's cadence: without them every round would
    // re-execute the caller's edge-generation chain (for pr01 that is
    // the whole LSH pair pass — iters× the cost) and r's plan would
    // grow one join+agg deeper per round
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val e = cut(edges.select(col("src"), col("dst")))
    val deg = cut(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nodes = cut(e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct())
    // n is ONE driver-side scalar (a count, not data) — the teleport
    // constant needs it as a literal so each round stays one plan
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge set")
    val teleport = RankScale * (dampingDen - dampingNum) / (dampingDen * n)
    var r = nodes.select(col("id"), lit(RankScale / n).as("r"))
    (1 to iters).foreach { i =>
      val inflow = e.join(r, e("src") === r("id"))
        .join(deg, "src")
        .select(col("dst"),
          expr(s"(r * $dampingNum) div (deg * $dampingDen)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      r = nodes.join(inflow, nodes("id") === inflow("dst"), "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("inflow"), lit(0L))).as("r"))
      if (i % 4 == 0 && i < iters) r = cut(r)
    }
    r
  }

  /** Personalized PageRank: teleport mass restarts ONLY at `sources`
    * (an (id) DataFrame ⊆ edge endpoints) — the random surfer keeps
    * returning to the seed set, so rank measures proximity TO the
    * seeds (retrieval expansion, related-doc discovery, hard-negative
    * neighborhoods). Same integer-exact arithmetic as [[pageRank]]:
    * r'(v) = [v∈S]·(1−d)/|S| + d·Σ_{u→v} r(u)/deg(u), ranks in
    * 1e-12 units, zero float ops.
    */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame, iters: Int,
      dampingNum: Long = 85L, dampingDen: Long = 100L): DataFrame = {
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val e = cut(edges.select(col("src"), col("dst")))
    val deg = cut(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val src = cut(sources.select(col("id")).distinct())
    val nodes = cut(e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .join(src.select(col("id"), lit(true).as("is_src")), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_src"), lit(false)).as("is_src")))
    val nS = src.count()
    require(nS > 0, "personalizedPageRank needs a non-empty source set")
    val teleport = RankScale * (dampingDen - dampingNum) / (dampingDen * nS)
    var r = nodes.select(col("id"),
      when(col("is_src"), lit(RankScale / nS)).otherwise(lit(0L)).as("r"))
    (1 to iters).foreach { i =>
      val inflow = e.join(r, e("src") === r("id"))
        .join(deg, "src")
        .select(col("dst"),
          expr(s"(r * $dampingNum) div (deg * $dampingDen)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      r = nodes.join(inflow, nodes("id") === inflow("dst"), "left")
        .select(col("id"),
          (when(col("is_src"), lit(teleport)).otherwise(lit(0L))
            + coalesce(col("inflow"), lit(0L))).as("r"))
      if (i % 4 == 0 && i < iters) r = cut(r)
    }
    r
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // ---- PageRank over the embedding near-dup graph (d05's verified
    //      LSH edge generator, symmetrized): influence of each doc in
    //      its duplication neighborhood. Oracle rebuilds the EXHAUSTIVE
    //      truth edge set and unrolls the same 8 integer rounds ----
    ("pr01_pagerank", (s: SparkSession, d: String) => {
      val pairs = Similarity.nearDupPairs(Tables.embeddings(s, d), 0.35)
        .select(col("id_a"), col("id_b"))
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      pageRank(edges, 8)
        .select(col("id"), col("r").as("rank_e12"))
        .orderBy("id")
    }, Some {
      val rounds = (1 to 8).map { i =>
        s"""r$i AS (
          SELECT nd.id, tp.t + coalesce(s.inflow, 0) AS r
          FROM nodes nd CROSS JOIN tp
          LEFT JOIN (
            SELECT e.dst,
              CAST(sum((r.r * 85) // (deg.deg * 100)) AS BIGINT) AS inflow
            FROM edges e JOIN r${i - 1} r ON r.id = e.src
                 JOIN deg ON deg.src = e.src
            GROUP BY e.dst) s ON s.dst = nd.id)"""
      }.mkString(",\n")
      s"""
      WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               unnest(a.embedding) AS x, unnest(b.embedding) AS y
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
      sums AS (
        SELECT id_a, id_b,
          sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
          sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nrm_a,
          sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nrm_b
        FROM p GROUP BY id_a, id_b),
      tpairs AS (SELECT id_a, id_b FROM sums
                 WHERE round(dot / (sqrt(nrm_a) * sqrt(nrm_b)), 6) >= 0.35),
      edges AS (SELECT id_a AS src, id_b AS dst FROM tpairs
                UNION ALL SELECT id_b, id_a FROM tpairs),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      nodes AS (SELECT DISTINCT src AS id FROM edges
                UNION SELECT DISTINCT dst FROM edges),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      tp AS (SELECT (1000000000000 * 15) // (100 * n) AS t FROM nn),
      r0 AS (SELECT id, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
      $rounds
      SELECT id, CAST(r AS BIGINT) AS rank_e12 FROM r8 ORDER BY id"""
    }),

    // ---- personalized PageRank from the 10 smallest-id nodes of the
    //      near-dup graph: proximity to the seed set. Same exhaustive
    //      truth edges; teleport restarts only at seeds ----
    ("pr02_personalized_pr", (s: SparkSession, d: String) => {
      val pairs = Similarity.nearDupPairs(Tables.embeddings(s, d), 0.35)
        .select(col("id_a"), col("id_b"))
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val seeds = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .distinct().orderBy("id").limit(10)
      personalizedPageRank(edges, seeds, 8)
        .select(col("id"), col("r").as("rank_e12"))
        .orderBy("id")
    }, Some {
      val rounds = (1 to 8).map { i =>
        s"""r$i AS (
          SELECT nd.id,
            (CASE WHEN sd.id IS NOT NULL THEN tpv.t ELSE 0 END)
              + coalesce(s.inflow, 0) AS r
          FROM nodes nd CROSS JOIN tpv
          LEFT JOIN seeds sd ON sd.id = nd.id
          LEFT JOIN (
            SELECT e.dst,
              CAST(sum((r.r * 85) // (deg.deg * 100)) AS BIGINT) AS inflow
            FROM edges e JOIN r${i - 1} r ON r.id = e.src
                 JOIN deg ON deg.src = e.src
            GROUP BY e.dst) s ON s.dst = nd.id)"""
      }.mkString(",\n")
      s"""
      WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               unnest(a.embedding) AS x, unnest(b.embedding) AS y
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
      sums AS (
        SELECT id_a, id_b,
          sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
          sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nrm_a,
          sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nrm_b
        FROM p GROUP BY id_a, id_b),
      tpairs AS (SELECT id_a, id_b FROM sums
                 WHERE round(dot / (sqrt(nrm_a) * sqrt(nrm_b)), 6) >= 0.35),
      edges AS (SELECT id_a AS src, id_b AS dst FROM tpairs
                UNION ALL SELECT id_b, id_a FROM tpairs),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      nodes AS (SELECT DISTINCT src AS id FROM edges
                UNION SELECT DISTINCT dst FROM edges),
      seeds AS (SELECT id FROM nodes ORDER BY id LIMIT 10),
      ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seeds),
      tpv AS (SELECT (1000000000000 * 15) // (100 * n) AS t FROM ns),
      r0 AS (SELECT nd.id,
               CASE WHEN sd.id IS NOT NULL THEN 1000000000000 // ns.n
                    ELSE 0 END AS r
             FROM nodes nd CROSS JOIN ns
             LEFT JOIN seeds sd ON sd.id = nd.id),
      $rounds
      SELECT id, CAST(r AS BIGINT) AS rank_e12 FROM r8 ORDER BY id"""
    })
  )
}
