package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Warehouse dimension maintenance: SCD Type-2 history build from a
  * change log, and point-in-time snapshot reconstruction over that
  * history — the two halves of "what did this dimension look like
  * when the model was trained?", which a reproducible training
  * pipeline needs as much as any BI stack.
  *
  * Reference anchor: keenwa's MERGE/upsert surface (q63) covers the
  * current-state table; SCD2 is the temporal companion the reference
  * models via plain relational operators (logical/mod.rs) — windows +
  * filters here, no bespoke runtime.
  *
  * SCALE: ONE (key) exchange total. The change-detection lag window,
  * the post-filter version numbering, and the interval close (lead)
  * all share the same (key) partitioning and (ts, tie) sort order, so
  * Catalyst plans one shuffle + one sort and streams the three window
  * functions over it; the filter between them preserves both
  * properties. Snapshot reconstruction is a map-only filter over the
  * history — no join, no shuffle.
  */
object Warehouse {
  type QFn = (SparkSession, String) => DataFrame

  /** SCD2 history from a change log: one row per (key, run of equal
    * `attrCol` values in (tsCol, tieCol) order) with
    * `eff_from`/`eff_to` interval bounds (eff_to null = current) and
    * a per-key `version` ordinal. `tieCol` must make the per-key
    * order total — determinism rides on it. `attrCol` is assumed
    * non-null (a null attr would merge into the preceding run).
    */
  def scd2History(changes: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol),
        lag(col(attrCol), 1).over(w).as("_prev"))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("eff_from"),
        lead(col(tsCol), 1).over(w).as("eff_to"),
        row_number().over(w).cast("bigint").as("version"))
  }

  /** The dimension as of instant `at`: map-only interval filter over
    * [[scd2History]] output (eff_from ≤ at < eff_to, open current
    * rows included). */
  def snapshotAt(history: DataFrame, at: java.sql.Timestamp): DataFrame =
    history.filter(col("eff_from") <= lit(at) &&
      (col("eff_to").isNull || col("eff_to") > lit(at)))

  /** Temporal (point-in-time) join: each fact row joined to the ONE
    * dimension version valid at its event time — eff_from ≤ ts <
    * eff_to, the open current row catching everything after the last
    * change. "Which status/tier/price-list did this order see?" is
    * THE reproducibility question for training on warehouse facts;
    * joining facts to the CURRENT dimension silently leaks the
    * future.
    *
    * SCALE: an EQUI-join on the dimension key with the interval test
    * as a residual — one key-hashed exchange, never an unbounded
    * range join, because the version intervals already partition
    * per key (each fact passes the residual for exactly one of its
    * key's handful of versions). History side is version-sized, not
    * fact-sized — broadcast when dim-sized.
    */
  def temporalJoin(facts: DataFrame, history: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val hCols = col(keyCol).as("_hk") +: col("eff_from") +:
      col("eff_to") +: history.columns.filter(c =>
        c != keyCol && c != "eff_from" && c != "eff_to").toSeq.map(col)
    val h = history.select(hCols: _*)
    facts.join(h,
      facts(keyCol) === h("_hk") &&
        col("eff_from") <= facts(tsCol) &&
        (col("eff_to").isNull || facts(tsCol) < col("eff_to")))
      .drop("_hk")
  }

  /** CDC snapshot diff: classify every key of two keyed snapshots as
    * inserted ('I': key only in `cur`), deleted ('D': key only in
    * `old`), or updated ('U': key in both with ANY `cmpCols` value
    * changed, null-safely) — unchanged keys are dropped. Output:
    * keys, `change_type`, and `old_`/`new_`-prefixed copies of each
    * compared column.
    *
    * SCALE: ONE full-outer join hashed on the key — both sides
    * snapshot-sized (≪ the fact table they were derived from), the
    * change filter map-only on top of it. This is the incremental-
    * load primitive: at 100 TB you diff two bounded dimension
    * snapshots, never the fact history.
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame, keyCols: Seq[String],
      cmpCols: Seq[String]): DataFrame = {
    val o = old.select(keyCols.map(col) ++
      cmpCols.map(c => col(c).as(s"old_$c")): _*)
    val n = cur.select(keyCols.map(col) ++
      cmpCols.map(c => col(c).as(s"new_$c")): _*)
    // presence flags survive the outer join (a missing side's key
    // columns are null-merged by the USING join, so they can't be
    // the presence test themselves)
    val j = o.withColumn("_in_old", lit(true))
      .join(n.withColumn("_in_new", lit(true)), keyCols, "full_outer")
    val changed = cmpCols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    j.withColumn("change_type",
        when(col("_in_old").isNull, lit("I"))
          .when(col("_in_new").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("change_type").isNotNull)
      .drop("_in_old", "_in_new")
  }

  /** RFM customer segmentation: recency (days since last order, vs
    * the dataset's max date), frequency (order count), monetary
    * (exact decimal spend, surfaced as DOUBLE per §4) — each
    * discretized into `n` quantile bins via
    * [[TextOps.quantileBins]]'s histogram ranking, combined into one
    * `rfm_code` (r·100 + f·10 + m). Bin 1 = smallest value: most
    * recent / fewest orders / lowest spend.
    *
    * SCALE: ONE fact-table groupBy(customer) + a 1-row max-date
    * broadcast; the three binning passes run over the CUSTOMER frame
    * (≪ facts) with histogram-sized windows — no global sort, no
    * single-partition ntile. Binning keys on the double-cast
    * monetary (not the decimal) so rank order is engine-identical.
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      amtCol: String, n: Int): DataFrame = {
    val per = orders.groupBy(col(custCol)).agg(
      max(col(dateCol)).as("_last"),
      count(lit(1)).as("frequency"),
      sum(col(amtCol).cast("decimal(18,2)")).cast("decimal(38,2)")
        .cast("double").as("monetary"))
    val mx = orders.agg(max(col(dateCol)).as("_mx"))
    val rfm = per.crossJoin(broadcast(mx))
      .select(col(custCol),
        datediff(col("_mx"), col("_last")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
      .withColumn("_g", lit(0))
    def bin(df: DataFrame, score: String, out: String) =
      TextOps.quantileBins(df, "_g", score, custCol, n)
        .withColumnRenamed("bin", out)
    val binned = bin(bin(bin(rfm, "recency_days", "r_bin"),
      "frequency", "f_bin"), "monetary", "m_bin")
    binned.select(col(custCol), col("recency_days"), col("frequency"),
      col("monetary"), col("r_bin"), col("f_bin"), col("m_bin"),
      (col("r_bin") * 100L + col("f_bin") * 10L + col("m_bin"))
        .as("rfm_code"))
  }

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"
  private def ordersHistory(s: SparkSession, d: String): DataFrame =
    scd2History(Tables.orders(s, d), "o_custkey", "o_orderstatus",
      "o_orderdate", "o_orderkey")

  private val historySql = """
      l AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
              lag(o_orderstatus) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS prev
            FROM orders),
      ch AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
             FROM l WHERE prev IS NULL OR prev <> o_orderstatus),
      v AS (SELECT o_custkey, o_orderstatus, o_orderdate AS eff_from,
              lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS eff_to,
              CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
            FROM ch)"""

  /** Pro-rata money allocation with largest-remainder (Hamilton)
    * rounding — spread each parent's integer-cents `totalCol` across
    * its children ∝ `weightCol` so the allocated cents sum EXACTLY to
    * the parent total (the invariant every finance/billing pipeline
    * must hold; naive per-row rounding leaks ±cents per parent).
    * base_i = (T·w_i) div W; the residual R = T − Σ base (0 ≤ R <
    * children) goes +1 cent to the R largest remainders (T·w_i mod W),
    * `tieCol` breaking remainder ties. ALL integer arithmetic.
    *
    * SCALE: one (parent) exchange; the remainder rank and the
    * residual sum are two window functions over the SAME (parent)
    * partitioning — child groups are order-sized (tiny), parent
    * cardinality carries the parallelism. Requires T·w to fit a long
    * (cents × quantity — ceilings above any real invoice).
    */
  def allocateProRata(children: DataFrame, parentCol: String,
      tieCol: String, weightCol: String, totalCol: String): DataFrame = {
    val grp = Window.partitionBy(col(parentCol))
    val byRem = Window.partitionBy(col(parentCol))
      .orderBy(col("rem").desc, col(tieCol))
    children
      .withColumn("w_sum", sum(col(weightCol)).over(grp))
      .withColumn("base",
        expr(s"($totalCol * $weightCol) div w_sum"))
      .withColumn("rem",
        expr(s"($totalCol * $weightCol) % w_sum"))
      .withColumn("residual", col(totalCol) - sum(col("base")).over(grp))
      .withColumn("extra",
        when(row_number().over(byRem) <= col("residual"), 1L).otherwise(0L))
      .withColumn("alloc", col("base") + col("extra"))
      .drop("w_sum", "base", "rem", "residual", "extra")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // ---- SCD2 history of each customer's order-status attribute ----
    ("wh01_scd2_history", (s: SparkSession, d: String) => {
      ordersHistory(s, d)
        .select(col("o_custkey"), col("o_orderstatus"),
          date_format(col("eff_from"), TsFmt).as("eff_from"),
          date_format(col("eff_to"), TsFmt).as("eff_to"), col("version"),
          when(col("eff_to").isNull, 1L).otherwise(0L).as("is_current"))
        .orderBy("o_custkey", "version")
    }, Some(s"""
      WITH $historySql
      SELECT o_custkey, o_orderstatus,
        strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS eff_from,
        strftime(eff_to, '%Y-%m-%d %H:%M:%S') AS eff_to, version,
        CAST(CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
          AS is_current
      FROM v ORDER BY o_custkey, version""")),

    // ---- point-in-time snapshot: every customer's status as of
    //      1998-06-15 — map-only filter over the history ----
    ("wh02_scd2_snapshot", (s: SparkSession, d: String) => {
      snapshotAt(ordersHistory(s, d),
        java.sql.Timestamp.valueOf("1998-06-15 00:00:00"))
        .select(col("o_custkey"), col("o_orderstatus"),
          date_format(col("eff_from"), TsFmt).as("eff_from"), col("version"))
        .orderBy("o_custkey")
    }, Some(s"""
      WITH $historySql
      SELECT o_custkey, o_orderstatus,
        strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS eff_from, version
      FROM v
      WHERE eff_from <= TIMESTAMP '1998-06-15 00:00:00'
        AND (eff_to IS NULL OR eff_to > TIMESTAMP '1998-06-15 00:00:00')
      ORDER BY o_custkey"""))
    ,

    // ---- CDC diff of two point-in-time snapshots (1997-01-01 vs
    //      1999-01-01): who appeared, whose status moved. version is
    //      compared too so A→B→A round-trips still surface as 'U'.
    //      ONE snapshot-sized full-outer join ----
    ("cdc01_snapshot_diff", (s: SparkSession, d: String) => {
      val h = ordersHistory(s, d)
      def snap(at: String) =
        snapshotAt(h, java.sql.Timestamp.valueOf(at))
          .select(col("o_custkey"), col("o_orderstatus"), col("version"))
      snapshotDiff(snap("1997-01-01 00:00:00"), snap("1999-01-01 00:00:00"),
        Seq("o_custkey"), Seq("o_orderstatus", "version"))
        .select(col("o_custkey"), col("change_type"),
          col("old_o_orderstatus"), col("new_o_orderstatus"),
          col("old_version"), col("new_version"))
        .orderBy("o_custkey")
    }, Some(s"""
      WITH $historySql,
      s1 AS (SELECT o_custkey, o_orderstatus, version FROM v
             WHERE eff_from <= TIMESTAMP '1997-01-01 00:00:00'
               AND (eff_to IS NULL OR eff_to > TIMESTAMP '1997-01-01 00:00:00')),
      s2 AS (SELECT o_custkey, o_orderstatus, version FROM v
             WHERE eff_from <= TIMESTAMP '1999-01-01 00:00:00'
               AND (eff_to IS NULL OR eff_to > TIMESTAMP '1999-01-01 00:00:00')),
      j AS (SELECT coalesce(s1.o_custkey, s2.o_custkey) AS o_custkey,
              CASE WHEN s1.o_custkey IS NULL THEN 'I'
                   WHEN s2.o_custkey IS NULL THEN 'D'
                   WHEN s1.o_orderstatus IS DISTINCT FROM s2.o_orderstatus
                     OR s1.version IS DISTINCT FROM s2.version THEN 'U'
              END AS change_type,
              s1.o_orderstatus AS old_o_orderstatus,
              s2.o_orderstatus AS new_o_orderstatus,
              s1.version AS old_version, s2.version AS new_version
            FROM s1 FULL JOIN s2 ON s1.o_custkey = s2.o_custkey)
      SELECT * FROM j WHERE change_type IS NOT NULL ORDER BY o_custkey""")),

    // ---- temporal join: every order matched to the customer-status
    //      VERSION valid at its own order date (not the current one —
    //      joining facts to the live dimension leaks the future).
    //      Equi-join on the key, interval test as residual ----
    ("wh03_temporal_join", (s: SparkSession, d: String) => {
      val facts = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      temporalJoin(facts, ordersHistory(s, d), "o_custkey", "o_orderdate")
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), TsFmt).as("order_ts"),
          col("o_orderstatus").as("status_then"), col("version"))
        .orderBy("o_orderkey")
    }, Some(s"""
      WITH $historySql
      SELECT o.o_orderkey, o.o_custkey,
        strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
        v.o_orderstatus AS status_then, v.version
      FROM orders o JOIN v
        ON o.o_custkey = v.o_custkey
       AND v.eff_from <= o.o_orderdate
       AND (v.eff_to IS NULL OR o.o_orderdate < v.eff_to)
      ORDER BY o.o_orderkey""")),

    // ---- largest-remainder allocation: order totals spread across
    //      line items ∝ quantity, cents-exact per order; the oracle
    //      replays the floor-div/remainder-rank arithmetic ----
    ("wh04_allocation", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        col("l_quantity").cast("bigint").as("qty"))
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("total_cents"))
      allocateProRata(
        li.join(o, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey"),
        "l_orderkey", "l_linenumber", "qty", "total_cents")
        .select(col("l_orderkey"), col("l_linenumber"), col("qty"),
          col("total_cents"), col("alloc").as("alloc_cents"))
        .orderBy("l_orderkey", "l_linenumber")
    }, Some("""
      WITH li AS (
        SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
          CAST(l.l_quantity AS BIGINT) AS qty,
          CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS total_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      base AS (
        SELECT *, CAST(sum(qty) OVER (PARTITION BY l_orderkey) AS BIGINT)
            AS w_sum
        FROM li),
      calc AS (
        SELECT l_orderkey, l_linenumber, qty, total_cents,
          (total_cents * qty) // w_sum AS b,
          (total_cents * qty) % w_sum AS rem
        FROM base),
      ranked AS (
        SELECT *,
          CAST(total_cents - sum(b) OVER (PARTITION BY l_orderkey)
            AS BIGINT) AS residual,
          row_number() OVER (PARTITION BY l_orderkey
            ORDER BY rem DESC, l_linenumber) AS rn
        FROM calc)
      SELECT l_orderkey, l_linenumber, qty, total_cents,
        b + CASE WHEN rn <= residual THEN 1 ELSE 0 END AS alloc_cents
      FROM ranked ORDER BY l_orderkey, l_linenumber""")),

    // ---- RFM segments: per-customer recency/frequency/monetary,
    //      each quintile-binned by t22's histogram ranks. Oracle
    //      replays the identical rank formula with row_number ----
    ("rfm01_segments", (s: SparkSession, d: String) => {
      rfmSegments(Tables.orders(s, d), "o_custkey", "o_orderdate",
        "o_totalprice", 5)
        .orderBy("o_custkey")
    }, Some("""
      WITH per AS (
        SELECT o_custkey,
          date_diff('day', CAST(max(o_orderdate) AS DATE),
            (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
            AS recency_days,
          count(*) AS frequency,
          CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            AS DECIMAL(38,2)) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey),
      ranked AS (
        SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
          frequency, monetary,
          row_number() OVER (ORDER BY recency_days, o_custkey) AS rr,
          row_number() OVER (ORDER BY frequency, o_custkey) AS rf,
          row_number() OVER (ORDER BY monetary, o_custkey) AS rm,
          count(*) OVER () AS c
        FROM per)
      SELECT o_custkey, recency_days, frequency, monetary,
        ((CAST(rr - 1 AS BIGINT) * 5) // c) + 1 AS r_bin,
        ((CAST(rf - 1 AS BIGINT) * 5) // c) + 1 AS f_bin,
        ((CAST(rm - 1 AS BIGINT) * 5) // c) + 1 AS m_bin,
        (((CAST(rr - 1 AS BIGINT) * 5) // c) + 1) * 100
          + (((CAST(rf - 1 AS BIGINT) * 5) // c) + 1) * 10
          + (((CAST(rm - 1 AS BIGINT) * 5) // c) + 1) AS rfm_code
      FROM ranked ORDER BY o_custkey""")),

    // ---- clamped running inventory balance per part: restocks (R)
    //      add, issues subtract, stock can't go negative — the clamp
    //      max(0, bal+δ) is NON-associative, so no window/prefix-sum
    //      can express it; it's the ts08 fold discipline on a
    //      warehouse ledger. All integer; shortfall (unfillable
    //      demand) accumulates exactly. Oracle replays the identical
    //      fold as a depth-49 recursive CTE over per-key
    //      row_number chains ----
    ("wh05_inventory_balance", (s: SparkSession, d: String) => {
      val moves = Tables.lineitem(s, d).select(
        col("l_partkey").as("k"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("o1"),
        col("l_orderkey").as("o2"),
        col("l_linenumber").cast("long").as("o3"),
        when(col("l_returnflag") === "R", col("l_quantity"))
          .otherwise(-col("l_quantity")).cast("long").as("delta"))
      clampedRunningBalance(moves)
        .select(col("k").as("l_partkey"), col("n_moves"),
          col("final_balance"), col("total_shortfall"))
        .orderBy("l_partkey")
    }, Some("""
      WITH RECURSIVE m AS MATERIALIZED (
        SELECT l_partkey AS k,
          CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT)
               ELSE -CAST(l_quantity AS BIGINT) END AS delta,
          row_number() OVER (PARTITION BY l_partkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        FROM lineitem),
      c AS (SELECT k, count(*) AS n FROM m GROUP BY 1),
      f(k, rn, bal, short) AS (
        SELECT k, rn, greatest(delta, 0), greatest(-delta, 0)
        FROM m WHERE rn = 1
        UNION ALL
        SELECT m.k, m.rn, greatest(f.bal + m.delta, 0),
          f.short + greatest(-(f.bal + m.delta), 0)
        FROM f JOIN m ON m.k = f.k AND m.rn = f.rn + 1)
      SELECT f.k AS l_partkey, c.n AS n_moves,
        CAST(f.bal AS BIGINT) AS final_balance,
        CAST(f.short AS BIGINT) AS total_shortfall
      FROM f JOIN c ON c.k = f.k AND f.rn = c.n
      ORDER BY l_partkey""")),

    // ---- FIFO cost of goods: issues consume restock layers oldest-
    //      first. The textbook implementation is a per-key queue fold
    //      — but FIFO has a CLOSED FORM: layer l (cumulative restock
    //      interval (cum−qty, cum]) is consumed exactly
    //      clamp(issued − (cum−qty), 0, qty) units, so one running
    //      sum over restock rows + a per-part issue total replaces
    //      the queue entirely. Layer cost pro-rated by integer
    //      floor-div (cents·consumed div qty) — deterministic on both
    //      engines. Parts with ≥1 restock layer reported ----
    ("wh06_fifo_cogs", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
      val issues = li.filter(col("l_returnflag") =!= "R")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("issued"))
      val layers = li.filter(col("l_returnflag") === "R")
        .select(col("l_partkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("o1"),
          col("l_orderkey").as("o2"),
          col("l_linenumber").cast("long").as("o3"),
          col("l_quantity").cast("long").as("qty"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
      fifoCogs(layers, issues).orderBy("l_partkey")
    }, Some("""
      WITH iss AS (SELECT l_partkey,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS issued
            FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1),
      lay AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT) AS cents,
              sum(CAST(l_quantity AS BIGINT)) OVER (
                PARTITION BY l_partkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM lineitem WHERE l_returnflag = 'R'),
      c AS (SELECT l.l_partkey, l.qty, l.cents,
              coalesce(i.issued, 0) AS issued,
              greatest(0, least(l.qty,
                coalesce(i.issued, 0) - (l.cum - l.qty))) AS consumed
            FROM lay l LEFT JOIN iss i USING (l_partkey))
      SELECT l_partkey, count(*) AS n_layers,
        CAST(sum(qty) AS BIGINT) AS restocked,
        CAST(max(issued) AS BIGINT) AS issued,
        CAST(sum(consumed) AS BIGINT) AS consumed,
        CAST(sum((cents * consumed) // qty) AS BIGINT) AS cogs_cents,
        round(CAST(CAST(sum((cents * consumed) // qty) AS BIGINT)
          AS DOUBLE) / 100.0, 2) AS cogs,
        CAST(greatest(0, max(issued) - CAST(sum(qty) AS BIGINT))
          AS BIGINT) AS unfilled
      FROM c GROUP BY 1 ORDER BY 1"""))
  )

  /** FIFO closed form: layer l (cumulative-restock interval
    * (cum−qty, cum]) is consumed exactly clamp(issued − (cum−qty),
    * 0, qty) units — one running sum over restock rows + the per-key
    * issue total replaces the per-key queue fold a naive FIFO would
    * need (OperatorsSpec proves queue parity on a hand ledger).
    * `layers` must carry (l_partkey, o1, o2, o3, qty, cents) with
    * (o1,o2,o3) totally ordering each key's layers; `issues`
    * (l_partkey, issued). Cost pro-rates by integer floor-div —
    * deterministic on both engines. */
  def fifoCogs(layers: DataFrame, issues: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("o1"), col("o2"), col("o3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    layers
      .withColumn("cum", sum(col("qty")).over(w))
      .join(issues, Seq("l_partkey"), "left")
      .withColumn("issued", coalesce(col("issued"), lit(0L)))
      .withColumn("consumed", greatest(lit(0L),
        least(col("qty"), col("issued") - (col("cum") - col("qty")))))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_layers"),
        sum(col("qty")).as("restocked"),
        max(col("issued")).as("issued"),
        sum(col("consumed")).as("consumed"),
        sum(expr("(cents * consumed) div qty")).as("cogs_cents"))
      .select(col("l_partkey"), col("n_layers"), col("restocked"),
        col("issued"), col("consumed"), col("cogs_cents"),
        round(col("cogs_cents").cast("double") / lit(100.0), 2)
          .as("cogs"),
        greatest(lit(0L), col("issued") - col("restocked"))
          .as("unfilled"))
  }

  /** The clamp fold: per key in (o1, o2, o3) order, balance_t =
    * max(0, balance_{t-1} + delta_t) starting from 0, with the
    * clamped amount accumulating as shortfall. NON-associative (the
    * clamp's position matters), so it runs as the ts08 discipline:
    * repartition(key) + sortWithinPartitions + one mapPartitions
    * fold whose state is 3 longs, emitting ONE summary row per key.
    *
    * SCALE: one (key) exchange; partition length = a part's movement
    * count (ledger-bounded, not corpus-bounded); output key-sized.
    * `moves` must carry (k, o1, o2, o3, delta) with (o1,o2,o3)
    * totally ordering each key's rows.
    */
  def clampedRunningBalance(moves: DataFrame): DataFrame = {
    val spark = moves.sparkSession
    import spark.implicits._
    moves.select(col("k"), col("o1"), col("o2"), col("o3"), col("delta"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"), col("o3"))
      .as[(Long, Long, Long, Long, Long)]
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[(Long, Long, Long, Long)] {
          def hasNext: Boolean = b.hasNext
          def next(): (Long, Long, Long, Long) = {
            val k = b.head._1
            var n = 0L; var bal = 0L; var short = 0L
            while (b.hasNext && b.head._1 == k) {
              val d = b.next()._5
              n += 1
              val s = bal + d
              if (s < 0L) { short -= s; bal = 0L } else bal = s
            }
            (k, n, bal, short)
          }
        }
      }
      .toDF("k", "n_moves", "final_balance", "total_shortfall")
  }
}
