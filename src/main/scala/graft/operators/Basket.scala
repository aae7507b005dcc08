package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Market-basket analytics over an order-lines table: association
  * rules (support/confidence/lift) and item-item Jaccard
  * recommendations — the co-occurrence statistics a curation pipeline
  * computes over (document, entity) pairs just as a retailer does
  * over (order, part).
  *
  * Reference anchor: plain relational composition (joins + aggs, the
  * reference's logical/mod.rs surface) — the value is the SCALE
  * shape, not novel operators.
  *
  * SCALE: everything derives from the distinct (basket, item) frame:
  * the pair self-join is quadratic ONLY in basket size (bounded by
  * the order format); supports partial-aggregate map-side; the
  * per-item stats joined back are item-sized (broadcast at dim
  * scale); the only driver-side scalar is the basket count (one
  * count, not data — the q20 stats-singleton pattern). Top-k
  * neighbors run on the TopKPerKey bounded heap, so the final
  * exchange carries ≤ k rows per item, never the full pair list.
  *
  * DETERMINISM: supports are exact integers; confidence/lift/Jaccard
  * are ONE double division (+ round 6dp) from integer inputs — the
  * §4-blessed float pattern — and every ordering ties break on item
  * id.
  */
object Basket {
  type QFn = (SparkSession, String) => DataFrame

  /** Distinct (basket, item) pairs — the base frame. */
  def basketItems(lines: DataFrame, basketCol: String = "l_orderkey",
      itemCol: String = "l_partkey"): DataFrame =
    lines.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()

  /** Canonical item-pair supports (#baskets containing both) at
    * `minSupport`+, with per-item basket counts joined on. */
  def pairSupports(items: DataFrame, minSupport: Long): DataFrame = {
    // basket-local pair generation (Graph.copurchaseEdges' r19 shape):
    // one groupBy(basket) + an in-basket position-pair explode replace
    // the basket-keyed SELF-JOIN of the items frame — two item-sized
    // exchanges + a sort-merge join become one exchange + a generator.
    // `items` is distinct per basket, so each unordered pair appears
    // exactly once per basket in both formulations.
    val pairs = items
      .groupBy(col("basket")).agg(collect_list(col("item")).as("ps"))
      .filter(size(col("ps")) > 1)
      .select(posexplode(col("ps")).as(Seq("i", "x")), col("ps"))
      .select(col("x"), explode(slice(col("ps"), col("i") + 2,
        size(col("ps")))).as("y"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
    val supp = items.groupBy(col("item")).agg(count(lit(1)).as("supp"))
    pairs
      .join(supp.select(col("item").as("id_a"), col("supp").as("supp_a")),
        Seq("id_a"))
      .join(supp.select(col("item").as("id_b"), col("supp").as("supp_b")),
        Seq("id_b"))
  }

  /** Association rules a→b AND b→a from the canonical pairs:
    * confidence = supp_ab/supp_a, lift = supp_ab·N/(supp_a·supp_b)
    * (N = total baskets, a 1-row broadcast stat). Integer supports,
    * one rounded division each.
    */
  def associationRules(lines: DataFrame, minSupport: Long,
      basketCol: String = "l_orderkey", itemCol: String = "l_partkey")
      : DataFrame = {
    val items = basketItems(lines, basketCol, itemCol)
    val n = items.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val p = pairSupports(items, minSupport)
    // both rule directions from one pair row
    val rules = p.select(explode(array(
      struct(col("id_a").as("antecedent"), col("id_b").as("consequent"),
        col("supp_ab"), col("supp_a").as("supp_ante"),
        col("supp_b").as("supp_cons")),
      struct(col("id_b").as("antecedent"), col("id_a").as("consequent"),
        col("supp_ab"), col("supp_b").as("supp_ante"),
        col("supp_a").as("supp_cons")))).as("r"))
      .select(col("r.*"))
    rules.crossJoin(broadcast(n)) // 1-row stats singleton (q20 pattern)
      .select(col("antecedent"), col("consequent"), col("supp_ab"),
        col("supp_ante"), col("supp_cons"),
        round(col("supp_ab").cast("double") / col("supp_ante"), 6)
          .as("confidence"),
        round((col("supp_ab") * col("n_baskets")).cast("double") /
          (col("supp_ante") * col("supp_cons")), 6).as("lift"))
  }

  /** Top-`k` Jaccard neighbors per item among pairs at `minSupport`+
    * co-occurrence: J = supp_ab/(supp_a+supp_b−supp_ab). Symmetrized
    * from one pair row; per-item top-k on the TopKPerKey bounded
    * heap (≤ k rows per item cross the exchange).
    */
  def itemJaccardTopK(lines: DataFrame, minSupport: Long, k: Int,
      basketCol: String = "l_orderkey", itemCol: String = "l_partkey")
      : DataFrame = {
    val p = pairSupports(basketItems(lines, basketCol, itemCol), minSupport)
      .select(col("id_a"), col("id_b"),
        round(col("supp_ab").cast("double") /
          (col("supp_a") + col("supp_b") - col("supp_ab")), 6).as("jac"))
    val sym = p.select(explode(array(
      struct(col("id_a").as("item"), col("id_b").as("neighbor"), col("jac")),
      struct(col("id_b").as("item"), col("id_a").as("neighbor"), col("jac"))))
      .as("r")).select(col("r.*"))
    // heap ranks ord DESC with the unique neighbor-id tiebreak ASC
    TopK.topKPerKey(sym, Seq("item"), "jac", "neighbor", k)
      .select(col("item"), col("neighbor"), col("jac"))
  }

  /** SEQUENTIAL association rules over event sessions: "sessions
    * that do A eventually do B" with A strictly BEFORE B — ar01's
    * support/confidence/lift where order matters (the upsell /
    * next-step rule a product team acts on, vs ss09's
    * adjacent-transition matrix). "A before B in the session" ⇔
    * min over A events < max over B events in the total (ts, id)
    * order — so one (session, type) aggregate of two endpoint
    * structs replaces any event-level pair join; the rule join is
    * quadratic only in DISTINCT TYPES per session (category-bounded).
    * Exact session counts; confidence = n_ab/n_a and lift =
    * n_ab·N/(n_a·n_b) one rounded division each.
    */
  def sequentialRules(sessions: DataFrame, minSupport: Long): DataFrame = {
    val spark = sessions.sparkSession
    val perType = sessions
      .groupBy(col("user_id"), col("session_id"), col("event_type"))
      .agg(min(struct(col("ts_ns"), col("eid"))).as("mn"),
        max(struct(col("ts_ns"), col("eid"))).as("mx"))
    val nSess = perType.select(col("user_id"), col("session_id")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeSupport = perType
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val a = perType.select(col("user_id"), col("session_id"),
      col("event_type").as("antecedent"), col("mn"))
    val b = perType.select(col("user_id"), col("session_id"),
      col("event_type").as("consequent"), col("mx"))
    val pairSupport = a.join(b, Seq("user_id", "session_id"))
      .filter(col("antecedent") =!= col("consequent") &&
        col("mn") < col("mx"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairSupport
      .join(typeSupport.select(col("event_type").as("antecedent"),
        col("n_t").as("n_a")), Seq("antecedent"))
      .join(typeSupport.select(col("event_type").as("consequent"),
        col("n_t").as("n_b")), Seq("consequent"))
      .crossJoin(broadcast(nSess))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_sessions"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("n_sessions").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // ---- sequential rules over event sessions: A strictly before
    //      B, session-level counts; the oracle asserts the same
    //      pairs from an event-level strict-order exists-join (the
    //      endpoint-struct trick must be equivalent) ----
    ("ar02_sequential_rules", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))
        .withColumn("eid", col("event_id"))
      sequentialRules(Sessionize.sessionized(ev,
        keepCols = Seq("event_type", "eid")), 5L)
        .orderBy("antecedent", "consequent")
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                   (epoch_ns(ts) // 1000) * 1000 AS tns FROM events),
      l AS (SELECT user_id, event_id, event_type, tns,
              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS p
            FROM e),
      f AS (SELECT user_id, event_id, event_type, tns,
              CASE WHEN p IS NULL OR tns - p > 1800000000000
                THEN 1 ELSE 0 END AS is_new
            FROM l),
      sess AS (SELECT user_id, event_id, event_type, tns,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f),
      st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
      ns AS (SELECT count(*) AS n_sessions FROM
               (SELECT DISTINCT user_id, session_id FROM sess)),
      ts AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY 1),
      ab AS (SELECT antecedent, consequent, count(*) AS n_ab FROM (
               SELECT DISTINCT a.user_id, a.session_id,
                 a.event_type AS antecedent, b.event_type AS consequent
               FROM sess a JOIN sess b
                 ON a.user_id = b.user_id AND a.session_id = b.session_id
                AND a.event_type <> b.event_type
                AND (a.tns < b.tns
                     OR (a.tns = b.tns AND a.event_id < b.event_id)))
             GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT ab.antecedent, ab.consequent, ab.n_ab,
        ta.n_t AS n_a, tb.n_t AS n_b, ns.n_sessions,
        round(CAST(ab.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE), 6)
          AS confidence,
        round(CAST(ab.n_ab AS DOUBLE) * CAST(ns.n_sessions AS DOUBLE)
              / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)), 6)
          AS lift
      FROM ab
      JOIN ts ta ON ta.event_type = ab.antecedent
      JOIN ts tb ON tb.event_type = ab.consequent
      CROSS JOIN ns
      ORDER BY antecedent, consequent""")),

    // ---- association rules at support >= 3 on the order/part
    //      baskets ----
    ("ar01_assoc_rules", (s: SparkSession, d: String) => {
      associationRules(Tables.lineitem(s, d), 3L)
        .orderBy("antecedent", "consequent")
    }, Some("""
      WITH bi AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
                  FROM lineitem),
      n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
            FROM bi),
      supp AS (SELECT item, count(*) AS supp FROM bi GROUP BY 1),
      p AS (SELECT a.item AS id_a, b.item AS id_b, count(*) AS supp_ab
            FROM bi a JOIN bi b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2 HAVING count(*) >= 3),
      pj AS (SELECT p.id_a, p.id_b, p.supp_ab,
               sa.supp AS supp_a, sb.supp AS supp_b
             FROM p JOIN supp sa ON sa.item = p.id_a
                    JOIN supp sb ON sb.item = p.id_b),
      r AS (SELECT id_a AS antecedent, id_b AS consequent, supp_ab,
              supp_a AS supp_ante, supp_b AS supp_cons FROM pj
            UNION ALL
            SELECT id_b, id_a, supp_ab, supp_b, supp_a FROM pj)
      SELECT antecedent, consequent, supp_ab, supp_ante, supp_cons,
        round(CAST(supp_ab AS DOUBLE) / supp_ante, 6) AS confidence,
        round(CAST(supp_ab * n_baskets AS DOUBLE) /
          (supp_ante * supp_cons), 6) AS lift
      FROM r CROSS JOIN n
      ORDER BY antecedent, consequent""")),

    // ---- top-3 Jaccard neighbors per part at co-support >= 2 ----
    ("rec01_item_jaccard", (s: SparkSession, d: String) => {
      itemJaccardTopK(Tables.lineitem(s, d), 2L, 3)
        .orderBy(col("item"), col("jac").desc, col("neighbor"))
    }, Some("""
      WITH bi AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
                  FROM lineitem),
      supp AS (SELECT item, count(*) AS supp FROM bi GROUP BY 1),
      p AS (SELECT a.item AS id_a, b.item AS id_b, count(*) AS supp_ab
            FROM bi a JOIN bi b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2 HAVING count(*) >= 2),
      pj AS (SELECT p.id_a, p.id_b,
               round(CAST(p.supp_ab AS DOUBLE) /
                 (sa.supp + sb.supp - p.supp_ab), 6) AS jac
             FROM p JOIN supp sa ON sa.item = p.id_a
                    JOIN supp sb ON sb.item = p.id_b),
      sym AS (SELECT id_a AS item, id_b AS neighbor, jac FROM pj
              UNION ALL SELECT id_b, id_a, jac FROM pj),
      rk AS (SELECT item, neighbor, jac,
               row_number() OVER (PARTITION BY item
                 ORDER BY jac DESC, neighbor) AS rn
             FROM sym)
      SELECT item, neighbor, jac FROM rk WHERE rn <= 3
      ORDER BY item, jac DESC, neighbor""")),

    // ---- first-order Markov transition matrix over user event
    //      streams: P(next = b | current = a) from consecutive-pair
    //      counts — the next-event model behind session simulation,
    //      anomalous-flow detection and "users who did A go on to B"
    //      product analytics. One per-user lag window (ss01's
    //      exchange; ss05 bot caveat applies to a pathological user's
    //      single sort task) + a partial-aggregable (src, dst)
    //      groupBy; probabilities one rounded division off exact
    //      counts ----
    ("ar03_transitions", (s: SparkSession, d: String) => {
      transitionMatrix(Tables.events(s, d)
        .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000")))
        .orderBy("src", "dst")
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                   (epoch_ns(ts) // 1000) * 1000 AS tns FROM events),
      l AS (SELECT user_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY tns, event_id) AS prev
            FROM e),
      p AS (SELECT prev AS src, event_type AS dst, count(*) AS n
            FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
      o AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_out FROM p GROUP BY 1)
      SELECT p.src, p.dst, p.n, o.n_out,
        round(CAST(p.n AS DOUBLE) / CAST(o.n_out AS DOUBLE), 6) AS prob
      FROM p JOIN o USING (src)
      ORDER BY src, dst"""))
  )

  /** First-order Markov transitions: consecutive (prev → cur) pairs
    * per user in exact (ts, id) order, rolled to (src, dst) counts
    * and row-normalized — P(next | current) with every probability
    * ONE rounded division off exact BIGINT counts (each src row sums
    * to ~1 up to rounding; the counts themselves are the exact
    * artifact). SCALE: the lag window rides the user exchange
    * (event-sized, same budget as ss01); everything after is
    * type-cardinality² rows.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    transitionsFromCounts(events
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n")))
  }

  /** The normalization half of [[transitionMatrix]] over
    * PRE-AGGREGATED (src, dst, n) pair counts (unique per (src,
    * dst)) — shared with the streaming twin
    * ([[graft.streaming.TransitionStream]]), whose store already
    * holds merged pair counts. */
  def transitionsFromCounts(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.select(col("src"), col("dst"), col("n"))
    val outs = pairs.groupBy(col("src")).agg(sum(col("n")).as("n_out"))
    pairs.join(outs, Seq("src"))
      .select(col("src"), col("dst"), col("n"), col("n_out"),
        round(col("n").cast("double") / col("n_out").cast("double"), 6)
          .as("prob"))
  }
}
