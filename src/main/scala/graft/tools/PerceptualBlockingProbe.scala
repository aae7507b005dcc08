package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Planted-entropy probe for the perceptual hamming join's blocking
  * floor (m09/m11): n docs with uniform-pseudorandom 64-bit
  * fingerprints and NO true dups — every candidate the blocking
  * emits is pure structural cost. The count is Σ b(b−1)/2 over
  * (key-index, key value) buckets, exactly what the equi join emits
  * pre-distinct, computed off the bucket-size aggregation so the
  * probe measures the floor itself rather than join machinery.
  *
  * The single-8-bit-chunk layout replaced in r18 pins a floor of
  * ≈ n²/64 REGARDLESS of true-duplicate structure (8 indexes × 2⁸
  * values → expected bucket n/256). The shipped schemes' floors fall
  * with key entropy instead: 28·C(n,2)/2¹⁶ ≈ n²/4681 for the 2-of-8
  * chunk-pair keys (m09's hamming ≤ 6 tier) and
  * C(n,2)·(2·2⁻²¹ + 2⁻²²) ≈ n²/1.68M for the 21/21/22-bit chunks
  * (m11's ≤ 2 tier). Two n values exhibit the quadratic shape; the
  * `n²-divisor` column is n²/candidates — constant per scheme, and
  * the SURVEY §5 evidence number.
  */
object PerceptualBlockingProbe {

  def run(spark: SparkSession, ns: Seq[Long]): Unit = {
    for (pn <- ns) {
      val h = spark.range(pn).select(col("id").as("doc_id"),
          xxhash64(col("id"), lit("hi")).bitwiseAND(lit(0xffffffffL))
            .as("hash_hi"),
          xxhash64(col("id"), lit("lo")).bitwiseAND(lit(0xffffffffL))
            .as("hash_lo"))
        .localCheckpoint(true)
      def cands(keys: DataFrame): Long =
        keys.groupBy(col("j"), col("bk")).agg(count(lit(1)).as("b"))
          .agg(coalesce(sum(expr("b * (b - 1) div 2")), lit(0L)))
          .collect()(0).getLong(0)
      // the replaced single-chunk layout, inlined here for comparison
      // only — no production path blocks this way anymore
      val legacyKeys = h.select(col("doc_id"), posexplode(array(
        (0 until 8).map { j =>
          if (j < 4) shiftright(col("hash_lo"), 8 * j).bitwiseAND(lit(0xffL))
          else shiftright(col("hash_hi"), 8 * (j - 4)).bitwiseAND(lit(0xffL))
        }: _*)).as(Seq("j", "bk")))
      val half = pn.toDouble * (pn - 1) / 2
      val rows = Seq(
        ("single8 (replaced)", cands(legacyKeys), 8 * half / 256),
        ("pairs16 (h<=6)",
          cands(graft.operators.Multimodal.hammingBlockKeys(h, 6)),
          28 * half / 65536),
        ("chunks21 (h<=2)",
          cands(graft.operators.Multimodal.hammingBlockKeys(h, 2)),
          half * (2.0 / (1 << 21) + 1.0 / (1 << 22))))
      rows.foreach { case (nm, got, pred) =>
        println(f"[scale] perceptualBlocking n=$pn%,d $nm%-20s " +
          f"candidates=$got%,d predicted=${pred.toLong}%,d " +
          f"(n²-divisor ${pn.toDouble * pn / math.max(got, 1)}%,.0f)")
      }
    }
  }

  /** The same report over a REAL corpus's fingerprints — the numbers
    * the SURVEY §5 m09/m11 rows quote (candidates vs all-pairs on the
    * actual sf data, per scheme). */
  def corpus(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Multimodal
    Seq(
      ("image h<=6", Multimodal.imageDHash(spark, sfDir), 6),
      ("audio h<=2", Multimodal.audioFingerprint(spark, sfDir), 2))
      .foreach { case (nm, h, maxH) =>
        val r = Multimodal.hammingBlockingReport(h, maxH).collect()(0)
        val keys = Multimodal.hammingBlockKeys(h.localCheckpoint(true), maxH)
        val a = keys.select(col("doc_id").as("ida"), col("j"), col("bk"))
        val b = keys.select(col("doc_id").as("idb"), col("j"), col("bk"))
        val dist = a.join(b, Seq("j", "bk")).filter(col("ida") < col("idb"))
          .select("ida", "idb").distinct().count()
        println(f"[scale] corpusBlocking $nm%-12s n=${r.getLong(0)}%,d " +
          f"buckets=${r.getLong(1)}%,d hottest=${r.getLong(2)}%,d " +
          f"joinRows=${r.getLong(3)}%,d distinctCands=$dist%,d " +
          f"allPairs=${r.getLong(4)}%,d " +
          f"(${dist * 100.0 / r.getLong(4)}%.2f%% of all-pairs to verify)")
      }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("corpus"))
      corpus(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
    else run(spark,
      if (args.isEmpty) Seq(100000L, 400000L) else args.toSeq.map(_.toLong))
    spark.stop()
  }
}
