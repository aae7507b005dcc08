package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Per-round lineage cut shared by every iterative operator here:
    * a reliable checkpoint when a checkpoint dir is configured (an
    * executor loss at 100 TB replays one round, not all), else
    * memory-only localCheckpoint (the local-harness default) — the
    * repo-wide [[Cut]] helper. */
  private def cut(df: DataFrame): DataFrame = Cut(df)

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
    val e0 = cut(edges.select(col("src"), col("dst")))
    // out-degree attached to the edge rows ONCE — deg(src) is loop
    // invariant, so materializing (src, dst, deg) here removes one
    // join (and its exchange) from EVERY round's inflow plan
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = cut(e0.join(deg, "src"))
    val nodes = cut(e0.select(col("src").as("id"))
      .unionAll(e0.select(col("dst").as("id"))).distinct())
    // n is ONE driver-side scalar (a count, not data) — the teleport
    // constant needs it as a literal so each round stays one plan
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge set")
    val teleport = RankScale * (dampingDen - dampingNum) / (dampingDen * n)
    var r = nodes.select(col("id"), lit(RankScale / n).as("r"))
    (1 to iters).foreach { i =>
      val inflow = e.join(r, e("src") === r("id"))
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
    val e0 = cut(edges.select(col("src"), col("dst")))
    // deg attached to the edges once — pageRank's loop-invariant hoist
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = cut(e0.join(deg, "src"))
    val src = cut(sources.select(col("id")).distinct())
    val nodes = cut(e0.select(col("src").as("id"))
      .unionAll(e0.select(col("dst").as("id"))).distinct()
      .join(src.select(col("id"), lit(true).as("is_src")), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_src"), lit(false)).as("is_src")))
    val nS = src.count()
    require(nS > 0, "personalizedPageRank needs a non-empty source set")
    val teleport = RankScale * (dampingDen - dampingNum) / (dampingDen * nS)
    var r = nodes.select(col("id"),
      when(col("is_src"), lit(RankScale / nS)).otherwise(lit(0L)).as("r"))
    (1 to iters).foreach { i =>
      val inflow = e.join(r, e("src") === r("id"))
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

  /** Per-vertex triangle counts on an UNDIRECTED graph given as
    * canonical distinct edges (id_a < id_b) — the clustering/cohesion
    * primitive (community density, spam-ring detection, co-purchase
    * cliques).
    *
    * SCALE: the classic degree-ordered orientation (Cohen 2009; the
    * MapReduce triangle standard): every edge points from its lower
    * (deg, id) endpoint to the higher, which bounds each vertex's
    * out-degree by O(√m) REGARDLESS of how skewed the raw degree
    * distribution is — a celebrity node's million neighbors generate
    * wedges at its neighbors, not at it. Wedge generation is a
    * self-join of the oriented edges on src (Σ outdeg² ≤ m^1.5 total,
    * vs Σ deg² unbounded for the naive orientation), and the close
    * check is one semi-join back against the oriented edge set — the
    * orientation is a total order, so a wedge's closing edge can only
    * be oriented v→w. No all-pairs stage anywhere.
    *
    * DETERMINISM: counting only — no floats, no RNG; the (deg, id)
    * struct comparison is a total order, so the oriented edge set is
    * replay-exact.
    */
  def trianglesPerVertex(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = pairs
      .join(deg.select(col("id").as("id_a"), col("deg").as("deg_a")),
        Seq("id_a"))
      .join(deg.select(col("id").as("id_b"), col("deg").as("deg_b")),
        Seq("id_b"))
    val aFirst =
      struct(col("deg_a"), col("id_a")) < struct(col("deg_b"), col("id_b"))
    val oriented = withDeg.select(
      when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
      when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"),
      when(aFirst, col("deg_b")).otherwise(col("deg_a")).as("deg_dst"))
    val wedges = oriented.select(col("src"), col("dst").as("v"),
        col("deg_dst").as("dv"))
      .join(oriented.select(col("src"), col("dst").as("w"),
        col("deg_dst").as("dw")), Seq("src"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val tris = wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
      .select(col("src").as("u"), col("v"), col("w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Deterministic synchronous label propagation (community
    * detection; Raghavan et al. 2007 made replay-exact): labels start
    * as node ids; each round every node adopts the label most
    * frequent among its neighbors, ties to the SMALLEST label — so a
    * fixed round count produces the identical labeling on any engine
    * (no RNG, no async order dependence; sync LPA may oscillate on
    * bipartite cores, which a fixed `iters` makes harmless for
    * determinism).
    *
    * SCALE: each round = one edges⋈labels join + one partial-
    * aggregable (node, label) count + one argmax groupBy (`max_by`
    * over the unique (count, −label) struct — no per-node sort).
    * Cost ∝ edges per round; lineage cuts every 4 rounds (the
    * [[pageRank]] cadence) keep the plan finite.
    *
    * `pairs`: canonical undirected edges (id_a < id_b).
    */
  def labelPropagation(pairs: DataFrame, iters: Int): DataFrame = {
    // (r19 plan audit: NO pre-partitioning by src here — the cut's
    // LogicalRDD does not carry outputPartitioning under AQE, so a
    // repartition before it is a pure extra shuffle; the per-round
    // edges⋈labels join instead broadcasts the edge side and AQE
    // REUSES that broadcast across rounds — see plans/r19 lp01)
    val e = cut(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var l = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    (1 to iters).foreach { i =>
      l = e.join(l, e("src") === l("id"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max_by(col("label"),
          struct(col("c"), (lit(0L) - col("label")).as("nl"))).as("label"))
        .select(col("dst").as("id"), col("label"))
      if (i % 4 == 0 && i < iters) l = cut(l)
    }
    l
  }

  /** Multi-source BFS: exact shortest hop counts from `sources` on a
    * DIRECTED edge list (src, dst) — pass both directions for an
    * undirected graph. Returns (id, dist) for every node reachable
    * within `maxHops`; unreachable-within-cap nodes are absent (the
    * cap makes the answer finite and replay-exact — every reported
    * dist ≤ maxHops is the TRUE shortest distance, because BFS
    * discovers nodes in distance order).
    *
    * SCALE: frontier-based — round h joins ONLY the current frontier
    * against edges (cost ∝ frontier out-degree, not graph size) and
    * anti-joins the visited set (keyed, visited-sized). O(diameter)
    * rounds. `probeEvery` batches the early-exit probes the same way
    * [[Dedup.connectedComponents]]'s convergenceCheckEvery does:
    * probe the frontier's emptiness only every k-th round, trading at
    * most k−1 no-op rounds past the true fixpoint (expanding an EMPTY
    * frontier moves nothing — dists are identical by construction)
    * for k× fewer driver job barriers. The right dial in the
    * local/many-round regime where per-round data cost is negligible
    * next to driver job latency; at 100 TB per-round DATA dominates
    * and k = 1 (the default) is right. The hop CAP bounds the loop
    * either way — a blind tail can never spin. Lineage cut per round
    * keeps the plan flat. Integer-only — bit-identical on any engine.
    */
  def shortestHops(edges: DataFrame, sources: DataFrame,
      maxHops: Int, probeEvery: Int = 1): DataFrame = {
    require(probeEvery >= 1, s"need probeEvery >= 1, got $probeEvery")
    val e = cut(edges.select(col("src"), col("dst")))
    // visited = the ACCUMULATED LIST of per-round frontier frames,
    // each already materialized by its own cut: unionAll over them is
    // a free concatenation of checkpointed scans, so the anti-join
    // reads the same rows WITHOUT re-materializing the whole visited
    // set every round (the old cut(visited ∪ frontier) rewrote
    // O(rounds × visited) rows over the loop — quadratic in rounds)
    var frontier = cut(sources.select(col("id")).distinct()
      .withColumn("dist", lit(0L)))
    var frames = List(frontier)
    def visited = frames.reduce(_ unionAll _)
    var h = 0
    var done = false
    while (h < maxHops && !done) {
      done = h % probeEvery == 0 && frontier.isEmpty
      if (!done) {
        h += 1
        frontier = cut(frontier
          .join(e, frontier("id") === e("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .withColumn("dist", lit(h.toLong)))
        frames = frontier :: frames
      }
    }
    visited
  }

  /** Sampled harmonic centrality: H(v) = Σ_s 1/d(s,v) over a seed
    * SAMPLE s (s ≠ v, unreachable contributes 0) — the
    * closeness-family centrality that stays well-defined on
    * disconnected graphs, estimated from k sources the way any
    * 100 TB graph must (exact all-pairs BFS is O(V·E)). Per-source
    * distances come from a seed-labeled multi-source BFS: ONE
    * frontier frame carries (seed, id) so all seeds expand in the
    * same per-round join, not k sequential BFS runs.
    *
    * Engine-exact arithmetic: the inverse distance is the INTEGER
    * ⌊10⁹/d⌋ (floor-div replays bit-identically; no float reciprocal
    * sum), summed as BIGINT; the output scales back by one double
    * division by a constant.
    *
    * SCALE: per-round cost = frontier out-degree × live seeds, same
    * budget as [[shortestHops]] with a ≤k fan-out factor; visited
    * anti-join keyed (seed, id). `probeEvery` batches the early-exit
    * probes exactly as in [[shortestHops]] (empty-frontier rounds are
    * no-ops, the hop cap bounds any blind tail; default 1 = probe
    * every round, the 100 TB setting). Lineage cut per round
    * (reliable checkpoint when a dir is configured — Graph.cut).
    */
  def harmonicCentrality(pairs: DataFrame, sources: DataFrame,
      maxHops: Int, probeEvery: Int = 1): DataFrame = {
    require(probeEvery >= 1, s"need probeEvery >= 1, got $probeEvery")
    val e = cut(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // accumulated cut-frame list — shortestHops' visited discipline
    var frontier = cut(sources.select(col("id").as("seed")).distinct()
      .select(col("seed"), col("seed").as("id"), lit(0L).as("dist")))
    var frames = List(frontier)
    def visited = frames.reduce(_ unionAll _)
    var h = 0
    var done = false
    while (h < maxHops && !done) {
      done = h % probeEvery == 0 && frontier.isEmpty
      if (!done) {
        h += 1
        frontier = cut(frontier
          .join(e, frontier("id") === e("src"))
          .select(col("seed"), col("dst").as("id")).distinct()
          .join(visited, Seq("seed", "id"), "left_anti")
          .withColumn("dist", lit(h.toLong)))
        frames = frontier :: frames
      }
    }
    visited.filter(col("dist") > 0)
      .select(col("id"), expr("1000000000L div dist").as("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_reached"), sum(col("w")).as("ws"))
      .select(col("id"), col("n_reached"),
        round(col("ws").cast("double") / lit(1e9), 9).as("harmonic"))
  }

  /** k-core: the maximal subgraph where every vertex keeps degree ≥ k
    * — the classic cohesion filter (spam/bot rings, dense co-purchase
    * neighborhoods) and the cheap preconditioner before expensive
    * per-vertex analytics. Iterative peeling: drop all vertices with
    * current degree < k, repeat to fixpoint (the result is
    * order-independent, so synchronous rounds are replay-exact).
    * Returns surviving (id, deg) with deg = the vertex's IN-CORE
    * degree.
    *
    * SCALE: each round is one partial-aggregable degree count + two
    * semi-join filters over the CURRENT edge set, which only shrinks;
    * rounds ≤ the peel depth (data-dependent; throws loudly past
    * `maxIter`). The convergence PROBE consumes one iteration, so an
    * oracle unrolling N peel rounds needs `maxIter = N + 1` (N peels
    * + 1 detecting round). Lineage cut per round.
    */
  def kCore(pairs: DataFrame, k: Long, maxIter: Int): DataFrame = {
    var e = cut(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // cut: the degree frame is read twice (convergence probe + the
      // keep filter) — without it the groupBy re-executes per reader
      val deg = cut(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
      val weak = deg.filter(col("deg") < k)
      converged = weak.isEmpty
      if (!converged) {
        val keep = deg.filter(col("deg") >= k).select(col("src"))
        e = cut(e.join(keep, Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi"))
      }
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIter rounds — raise maxIter " +
          "(and the oracle's unroll depth with it)")
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
  }

  /** Co-purchase edge list from an order-lines table: part pairs
    * sharing an order, kept at `minSupport`+ co-occurrences. Pairs are
    * generated BASKET-LOCALLY: one groupBy(order) collects each
    * order's items (baskets are format-bounded — a handful of lines —
    * so the explode is quadratic only in basket size) and the
    * in-basket position-pair explode replaces the order-keyed
    * SELF-JOIN of the lines table (r19: two lineitem-sized exchanges +
    * a sort-merge join collapse into ONE exchange + a generator; the
    * emitted pair MULTISET is identical — every unordered row pair
    * with distinct items, counted with multiplicity — so the support
    * counts match the oracle's join formulation bit-for-bit). The
    * support groupBy partial-aggregates map-side.
    */
  def copurchaseEdges(lines: DataFrame, minSupport: Long,
      orderCol: String = "l_orderkey", itemCol: String = "l_partkey")
      : DataFrame = {
    val baskets = lines
      .groupBy(col(orderCol).as("_o"))
      .agg(collect_list(col(itemCol)).as("ps"))
      .filter(size(col("ps")) > 1)
    baskets
      .select(posexplode(col("ps")).as(Seq("i", "x")), col("ps"))
      .select(col("x"), explode(slice(col("ps"), col("i") + 2,
        size(col("ps")))).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("id_a"), col("id_b"))
  }

  /** Local clustering coefficient per vertex: cc_v =
    * 2·tri_v / (deg_v·(deg_v − 1)) — how close each node's
    * neighborhood is to a clique, THE per-node cohesion metric next
    * to the raw triangle count. Exact integers (tri_v from
    * [[trianglesPerVertex]], deg_v one groupBy) with the float cc a
    * single fixed-order rounded division; deg 1 nodes have no
    * defined coefficient → null; triangle-free nodes are an honest
    * 0, NOT absent (left join from the degree table, which covers
    * every vertex).
    *
    * SCALE: the triangle budget (degree-ordered wedge join) + one
    * edge-sized degree groupBy + a vertex-sized left join.
    */
  def clusteringCoefficient(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    deg.join(trianglesPerVertex(pairs), Seq("id"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .select(col("id"), col("deg"), col("n_tri"),
        when(col("deg") >= 2L,
          round((col("n_tri") * 2L).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double"), 6))
          .as("cc"))
  }

  /** Degree assortativity: the Pearson correlation of endpoint
    * degrees over the symmetrized edge list (Newman 2002) — positive
    * when hubs attach to hubs, negative for hub-and-spoke topologies.
    * THE one-number summary a graph pipeline gates on before running
    * hub-sensitive algorithms (tr03's celebrity cap, pr01's skew).
    *
    * All five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are sums
    * of exact integers accumulated as DECIMAL(38,0), so the final r
    * is one fixed-order double expression off exact inputs — the
    * cor01 discipline.
    *
    * SCALE: one edge-sized degree groupBy + two equi joins to land
    * degrees on endpoints + ONE partial-aggregable global aggregate.
    * Nothing is vertex-quadratic; the output is a single row.
    */
  def degreeAssortativity(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val dx = deg.select(col("src").as("x"), col("deg").as("dx"))
    val dy = deg.select(col("src").as("y"), col("deg").as("dy"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    sym.join(dx, col("src") === col("x"))
      .join(dy, col("dst") === col("y"))
      .agg(count(lit(1)).as("m"),
        sum(dec(col("dx"))).as("sx"), sum(dec(col("dy"))).as("sy"),
        sum(dec(col("dx") * col("dy"))).as("sxy"),
        sum(dec(col("dx") * col("dx"))).as("sxx"),
        sum(dec(col("dy") * col("dy"))).as("syy"),
        max(col("dx")).as("md"))
      .select((col("m") / lit(2)).cast("long").as("n_edges"),
        col("md").cast("long").as("max_deg"),
        // A regular graph has zero degree variance — the denominator
        // is 0 and r is undefined. Spark 4 ANSI throws DIVIDE_BY_ZERO
        // even for doubles, so the degenerate case is gated to NULL.
        round(try_divide(
          (dec(col("m")) * col("sxy") - col("sx") * col("sy"))
            .cast("double"),
          sqrt((dec(col("m")) * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
            (dec(col("m")) * col("syy") - col("sy") * col("sy"))
              .cast("double"))), 6).as("assortativity"))
  }

  /** Common-neighbor link recommendation ("customers who bought X's
    * neighbors also bought…"): for every vertex, the top-k NON-adjacent
    * vertices ranked by shared-neighbor count — the classic
    * link-prediction score (Liben-Nowell & Kleinberg 2003), and the
    * friend-of-friend recommender production graphs actually serve.
    *
    * Plan: symmetrize once, self-join on the wedge CENTER (one
    * center-keyed shuffle — Σ deg(v)² wedge rows, the honest cost of
    * common-neighbor counting), canonicalize endpoints u<w so each
    * unordered pair aggregates once, one (u,w) groupBy, then drop
    * already-adjacent pairs with a left anti join against the edge
    * list (same canonical order — equi keys, no inequality join) and
    * mirror to both directions for per-vertex top-k (rank by count
    * desc, partner id tiebreak).
    *
    * SCALE: Σ deg(v)² is inherent to the score; the remedies are the
    * support threshold already applied by [[copurchaseEdges]] and a
    * degree cap on centers (drop celebrity hubs — they recommend
    * everything to everyone and are noise in this score anyway);
    * `maxCenterDeg` applies it. All joins equi-keyed; the wedge
    * groupBy is partial-aggregable (count).
    */
  def commonNeighborRecs(pairs: DataFrame, k: Int,
      maxCenterDeg: Long = Long.MaxValue): DataFrame = {
    val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    // the celebrity cap is a no-op at MaxValue — skip its degree
    // groupBy + semi-join (one exchange each) instead of running a
    // filter every center passes
    val viaCenter = if (maxCenterDeg == Long.MaxValue)
      sym.select(col("b").as("v"), col("a").as("u"))
    else {
      val centerDeg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("dv"))
        .filter(col("dv") <= maxCenterDeg).select(col("v"))
      sym.select(col("b").as("v"), col("a").as("u"))
        .join(centerDeg, Seq("v"), "left_semi")
    }
    val cn = viaCenter
      .join(viaCenter.select(col("v"), col("u").as("w")), Seq("v"))
      .filter(col("u") < col("w"))
      .groupBy(col("u"), col("w")).agg(count(lit(1)).as("cn"))
      .join(pairs.select(col("id_a").as("u"), col("id_b").as("w")),
        Seq("u", "w"), "left_anti")
    val directed = cn.select(col("u").as("id"), col("w").as("rec"), col("cn"))
      .unionAll(cn.select(col("w").as("id"), col("u").as("rec"), col("cn")))
    rankTopK(directed, "cn", k)
  }

  /** Shared top-k tail of the link-prediction scores: the bounded-heap
    * TopKPerKey operator selects each id's k best (score DESC, rec ASC
    * — a total order, rec is unique per id) so only k rows per key per
    * partition cross the exchange, then the rank window runs over the
    * ≤ k·|ids| SURVIVORS. Selecting a prefix of the same total order
    * and ranking it is row-for-row identical to ranking everything and
    * filtering rank ≤ k (the prior formulation), without the full
    * candidate frame ever sorting through one window exchange.
    */
  private def rankTopK(directed: DataFrame, score: String, k: Int): DataFrame =
    TopK.topKPerKey(directed, Seq("id"), score, "rec", k)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("id"))
        .orderBy(col(score).desc, col("rec"))))
      .select(col("id"), col("rank").cast("bigint").as("rank"),
        col("rec"), col(score))

  /** Adamic–Adar link prediction: [[commonNeighborRecs]] with each
    * shared neighbor weighted 1/ln(deg) — a rare mutual friend says
    * more than a hub everyone knows. Each wedge's weight is the
    * center's round(1/ln(deg_v), 9) cast to DECIMAL(18,9) so the
    * per-pair SUM is exact regardless of merge order (a raw double
    * sum would be order-dependent — the §4 rule applied to a graph
    * score); the final score is the decimal rounded back to 6. deg-1
    * centers produce no wedges, so ln(1)=0 never divides.
    * Same wedge economics and celebrity cap as tr03.
    */
  def adamicAdarRecs(pairs: DataFrame, k: Int,
      maxCenterDeg: Long = Long.MaxValue): DataFrame = {
    val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    // dv >= 2: a degree-1 center can't host a wedge anyway, and
    // filtering BEFORE the weight keeps 1/ln(1) = Infinity out of the
    // decimal cast (ANSI would surface it even though the u<w join
    // discards those rows)
    val centerDeg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("dv"))
      .filter(col("dv") <= maxCenterDeg && col("dv") >= 2L)
    val viaCenter = sym.select(col("b").as("v"), col("a").as("u"))
      .join(centerDeg, Seq("v"))
      .withColumn("wv", round(lit(1.0) /
        log(col("dv").cast("double")), 9).cast(DecimalType(18, 9)))
    val aa = viaCenter
      .join(viaCenter.select(col("v"), col("u").as("w")), Seq("v"))
      .filter(col("u") < col("w"))
      .groupBy(col("u"), col("w")).agg(sum(col("wv")).as("aad"))
      .join(pairs.select(col("id_a").as("u"), col("id_b").as("w")),
        Seq("u", "w"), "left_anti")
      .withColumn("aa", round(col("aad").cast("double"), 6))
    val directed = aa.select(col("u").as("id"), col("w").as("rec"), col("aa"))
      .unionAll(aa.select(col("w").as("id"), col("u").as("rec"), col("aa")))
    rankTopK(directed, "aa", k)
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
    }),

    // ---- per-part triangle counts on the "bought together at least
    //      twice" co-purchase graph: exact edges (no LSH), degree-
    //      ordered wedge join. Oracle replays the canonical-id
    //      3-way join — same triangle set, different join order ----
    ("tr01_triangles", (s: SparkSession, d: String) => {
      trianglesPerVertex(copurchaseEdges(Tables.lineitem(s, d), 2L))
        .orderBy("id")
    }, Some("""
      WITH e AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      tri AS (
        SELECT e1.id_a AS u, e1.id_b AS v, e2.id_b AS w
        FROM e e1
        JOIN e e2 ON e2.id_a = e1.id_a AND e1.id_b < e2.id_b
        JOIN e e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b)
      SELECT id, count(*) AS n_tri FROM (
        SELECT u AS id FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri)
      GROUP BY id ORDER BY id""")),

    // ---- local clustering coefficient on the same co-purchase
    //      graph: every vertex (triangle-free ones an honest 0,
    //      degree-1 ones null), cc one rounded division off exact
    //      integers ----
    ("tr02_clustering_coeff", (s: SparkSession, d: String) => {
      clusteringCoefficient(copurchaseEdges(Tables.lineitem(s, d), 2L))
        .orderBy("id")
    }, Some("""
      WITH e AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT id, count(*) AS deg FROM (
          SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e)
        GROUP BY id),
      tri AS (
        SELECT e1.id_a AS u, e1.id_b AS v, e2.id_b AS w
        FROM e e1
        JOIN e e2 ON e2.id_a = e1.id_a AND e1.id_b < e2.id_b
        JOIN e e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b),
      nt AS (SELECT id, count(*) AS n_tri FROM (
          SELECT u AS id FROM tri
          UNION ALL SELECT v FROM tri
          UNION ALL SELECT w FROM tri)
        GROUP BY id)
      SELECT d.id, d.deg, coalesce(nt.n_tri, 0) AS n_tri,
        CASE WHEN d.deg >= 2
          THEN round(CAST(coalesce(nt.n_tri, 0) * 2 AS DOUBLE)
                     / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6)
        END AS cc
      FROM deg d LEFT JOIN nt USING (id)
      ORDER BY d.id""")),

    // ---- friend-of-friend recommendations on the co-purchase graph:
    //      top-3 non-adjacent partners by common-neighbor count ----
    ("tr03_common_neighbors", (s: SparkSession, d: String) => {
      commonNeighborRecs(copurchaseEdges(Tables.lineitem(s, d), 2L), 3)
        .orderBy("id", "rank")
    }, Some("""
      WITH e AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT id_a AS a, id_b AS b FROM e
              UNION ALL SELECT id_b, id_a FROM e),
      cn AS (
        SELECT s1.a AS u, s2.a AS w, count(*) AS cn
        FROM sym s1 JOIN sym s2 ON s1.b = s2.b AND s1.a < s2.a
        GROUP BY 1, 2),
      nonadj AS (
        SELECT u, w, cn FROM cn
        WHERE NOT EXISTS (SELECT 1 FROM e
          WHERE e.id_a = cn.u AND e.id_b = cn.w)),
      directed AS (
        SELECT u AS id, w AS rec, cn FROM nonadj
        UNION ALL SELECT w, u, cn FROM nonadj),
      ranked AS (
        SELECT id, rec, cn, CAST(row_number() OVER (
          PARTITION BY id ORDER BY cn DESC, rec) AS BIGINT) AS rank
        FROM directed)
      SELECT id, rank, rec, cn FROM ranked WHERE rank <= 3
      ORDER BY id, rank""")),

    // ---- Adamic-Adar variant of tr03: rare shared neighbors count
    //      more; per-wedge 1/ln(deg) weights decimal-summed exact ----
    ("tr04_adamic_adar", (s: SparkSession, d: String) => {
      adamicAdarRecs(copurchaseEdges(Tables.lineitem(s, d), 2L), 3)
        .orderBy("id", "rank")
    }, Some("""
      WITH e AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT id_a AS a, id_b AS b FROM e
              UNION ALL SELECT id_b, id_a FROM e),
      deg AS (SELECT a AS v, count(*) AS dv FROM sym GROUP BY 1),
      via AS (SELECT s.b AS v, s.a AS u,
                CAST(round(1.0 / ln(CAST(d.dv AS DOUBLE)), 9)
                  AS DECIMAL(18,9)) AS wv
              FROM sym s JOIN deg d ON d.v = s.b),
      aa AS (
        SELECT v1.u AS u, v2.u AS w,
          round(CAST(sum(v1.wv) AS DOUBLE), 6) AS aa
        FROM via v1 JOIN via v2 ON v1.v = v2.v AND v1.u < v2.u
        GROUP BY 1, 2),
      nonadj AS (
        SELECT u, w, aa FROM aa
        WHERE NOT EXISTS (SELECT 1 FROM e
          WHERE e.id_a = aa.u AND e.id_b = aa.w)),
      directed AS (
        SELECT u AS id, w AS rec, aa FROM nonadj
        UNION ALL SELECT w, u, aa FROM nonadj),
      ranked AS (
        SELECT id, rec, aa, CAST(row_number() OVER (
          PARTITION BY id ORDER BY aa DESC, rec) AS BIGINT) AS rank
        FROM directed)
      SELECT id, rank, rec, aa FROM ranked WHERE rank <= 3
      ORDER BY id, rank""")),

    // ---- degree assortativity of the co-purchase graph: Pearson r
    //      of endpoint degrees, five exact-integer sufficient stats,
    //      one fixed-order double at the end ----
    ("tr05_assortativity", (s: SparkSession, d: String) => {
      degreeAssortativity(copurchaseEdges(Tables.lineitem(s, d), 2L))
    }, Some("""
      WITH e AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT id_a AS a, id_b AS b FROM e
              UNION ALL SELECT id_b, id_a FROM e),
      deg AS (SELECT a AS v, count(*) AS deg FROM sym GROUP BY 1),
      j AS (SELECT dx.deg AS dx, dy.deg AS dy
            FROM sym s JOIN deg dx ON dx.v = s.a
            JOIN deg dy ON dy.v = s.b),
      agg AS (SELECT count(*) AS m,
        CAST(sum(dx) AS DECIMAL(38,0)) AS sx,
        CAST(sum(dy) AS DECIMAL(38,0)) AS sy,
        CAST(sum(dx * dy) AS DECIMAL(38,0)) AS sxy,
        CAST(sum(dx * dx) AS DECIMAL(38,0)) AS sxx,
        CAST(sum(dy * dy) AS DECIMAL(38,0)) AS syy,
        max(dx) AS md FROM j)
      SELECT CAST(m / 2 AS BIGINT) AS n_edges,
        CAST(md AS BIGINT) AS max_deg,
        round(CAST(m * sxy - sx * sy AS DOUBLE) /
          sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *
               CAST(m * syy - sy * sy AS DOUBLE)), 6) AS assortativity
      FROM agg""")),

    // ---- communities on the same co-purchase graph: 6 synchronous
    //      LPA rounds, ties to the smallest label; oracle unrolls the
    //      identical rounds (argmax via row_number) ----
    ("lp01_label_propagation", (s: SparkSession, d: String) => {
      labelPropagation(copurchaseEdges(Tables.lineitem(s, d), 2L), 6)
        .orderBy("id")
    }, Some {
      val rounds = (1 to 6).map { i =>
        s"""c$i AS (SELECT e.dst AS id, l.label, count(*) AS c
             FROM edges e JOIN l${i - 1} l ON l.id = e.src GROUP BY 1, 2),
           l$i AS (SELECT id, label FROM (
             SELECT id, label, row_number() OVER (PARTITION BY id
               ORDER BY c DESC, label) AS rn FROM c$i) WHERE rn = 1)"""
      }.mkString(",\n")
      s"""
      WITH p AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM p
                UNION ALL SELECT id_b, id_a FROM p),
      l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
      $rounds
      SELECT id, label FROM l6 ORDER BY id"""
    }),

    // ---- multi-source BFS on the co-purchase graph: exact hop
    //      distance from the 5 smallest part ids, capped at 8 hops.
    //      Oracle = DuckDB recursive CTE (UNION-deduped (id, d)
    //      states, depth-capped); Spark = frontier expansion ----
    ("bfs01_shortest_hops", (s: SparkSession, d: String) => {
      val pairs = copurchaseEdges(Tables.lineitem(s, d), 2L)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val seeds = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .distinct().orderBy("id").limit(5)
      shortestHops(edges, seeds, 8).orderBy("id")
    }, Some("""
      WITH RECURSIVE
      p AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM p
                UNION ALL SELECT id_b, id_a FROM p),
      -- inside a WITH RECURSIVE, DuckDB 1.0 evaluates a plain UNION
      -- between non-recursive CTE legs as bag union — dedup must be
      -- an explicit DISTINCT over UNION ALL here
      nodes AS (SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
      seeds AS (SELECT id FROM (
        SELECT id, row_number() OVER (ORDER BY id) AS rn FROM nodes)
        WHERE rn <= 5),
      walk(id, d) AS (
        SELECT id, 0 FROM seeds
        UNION
        SELECT e.dst, w.d + 1 FROM walk w
        JOIN edges e ON e.src = w.id WHERE w.d < 8),
      sp AS (SELECT id, min(d) AS dist FROM walk GROUP BY id)
      SELECT id, CAST(dist AS BIGINT) AS dist FROM sp ORDER BY id""")),

    // ---- sampled harmonic centrality from bfs01's 5 seeds: ONE
    //      seed-labeled multi-source BFS (all seeds expand in the
    //      same per-round join), inverse distances as exact integer
    //      ⌊10⁹/d⌋ BIGINT sums, one constant double division out ----
    ("hc01_harmonic_centrality", (s: SparkSession, d: String) => {
      val pairs = copurchaseEdges(Tables.lineitem(s, d), 2L)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val seeds = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .distinct().orderBy("id").limit(5)
      harmonicCentrality(pairs, seeds, 8).orderBy("id")
    }, Some("""
      WITH RECURSIVE
      p AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM p
                UNION ALL SELECT id_b, id_a FROM p),
      nodes AS (SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
      seeds AS (SELECT id FROM (
        SELECT id, row_number() OVER (ORDER BY id) AS rn FROM nodes)
        WHERE rn <= 5),
      walk(seed, id, d) AS (
        SELECT id, id, 0 FROM seeds
        UNION
        SELECT w.seed, e.dst, w.d + 1 FROM walk w
        JOIN edges e ON e.src = w.id WHERE w.d < 8),
      sp AS (SELECT seed, id, min(d) AS dist FROM walk GROUP BY 1, 2)
      SELECT id, count(*) AS n_reached,
        round(CAST(CAST(sum(1000000000 // dist) AS BIGINT) AS DOUBLE)
          / 1e9, 9) AS harmonic
      FROM sp WHERE dist > 0 GROUP BY 1 ORDER BY id""")),

    // ---- 3-core of the co-purchase graph: peel-to-fixpoint, peel
    //      depth ≤ 12 (probed: 8 at sf0.01, 2 at sf0.1); maxIter 13 =
    //      12 peels + the detecting round. Spark throws past the
    //      budget so a deeper graph fails loudly, never silently
    //      diverges from the oracle's 12 unrolled no-op-padded
    //      rounds ----
    ("kc01_kcore", (s: SparkSession, d: String) => {
      kCore(copurchaseEdges(Tables.lineitem(s, d), 2L), 3L, 13)
        .orderBy("id")
    }, Some {
      // e{i-1} is referenced TWICE per round (degree count + edge
      // filter): MATERIALIZED stops DuckDB inlining the chain into
      // 2^12 scans of lineitem ("Too many open files" without it)
      val rounds = (1 to 12).map { i =>
        s"""d$i AS (SELECT src, count(*) AS deg FROM e${i - 1} GROUP BY src),
           s$i AS (SELECT src FROM d$i WHERE deg >= 3),
           e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
                   JOIN s$i a ON a.src = e.src
                   JOIN s$i b ON b.src = e.dst)"""
      }.mkString(",\n")
      s"""
      WITH p AS (
        SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      e0 AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
             UNION ALL SELECT id_b, id_a FROM p),
      $rounds
      SELECT src AS id, count(*) AS deg FROM e12
      GROUP BY src ORDER BY id"""
    })
  )
}
