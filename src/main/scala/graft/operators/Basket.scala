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
    val a = items.select(col("basket"), col("item").as("id_a"))
    val b = items.select(col("basket"), col("item").as("id_b"))
    val pairs = a.join(b, Seq("basket")).filter(col("id_a") < col("id_b"))
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

  val entries: Seq[(String, QFn, Option[String])] = Seq(
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
      ORDER BY item, jac DESC, neighbor"""))
  )
}
