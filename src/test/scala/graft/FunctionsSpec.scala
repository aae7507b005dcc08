package graft
// (MisraGries guarantee test added at the bottom of this spec)

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("fnv64 matches published FNV-1a test vectors") {
    import spark.implicits._
    val got = Seq("a", "abc", "").toDF("s")
      .select(fnv64(col("s"))).as[Long].collect()
    assert(got(0) === 0xaf63dc4c8601ec8cL)
    assert(got(1) === 0xe71fa2190541574bL)
    assert(got(2) === 0xcbf29ce484222325L) // offset basis for empty input
  }

  test("vector dot/norm/cosine on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val Array(dot, na, cos) = df.select(
      vectorDot(col("a"), col("b")),
      vectorNorm(col("a")),
      vectorCosine(col("a"), col("b"))).as[(Double, Double, Double)].collect().map(t => t).flatMap(t => Seq(t._1, t._2, t._3))
    assert(dot === 32.0)
    assert(math.abs(na - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(cos - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("polyFingerprint is stable and space-run insensitive") {
    import spark.implicits._
    val got = Seq("the quick fox", "the  quick   fox", " the quick fox ")
      .toDF("s").select(polyFingerprint(col("s"))).as[Long].collect()
    assert(got.distinct.length === 1) // empty words skipped, 1-based index
  }

  test("simhash64: identical text → identical sig; near text → small hamming") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val sigs = Seq(base, base, near, far).toDF("s")
      .select(simhash64(col("s"))).as[Long].collect()
    assert(sigs(0) === sigs(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(2)) < ham(sigs(0), sigs(3)))
  }

  test("fused jaccard (via FuseJaccard rule) matches set semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, array_union, size => asize}
    val df = Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("a", "b")
    val v = df.select((asize(array_intersect(col("a"), col("b"))).cast("double") /
      asize(array_union(col("a"), col("b")))).as("j")).as[Double].head()
    assert(v === 0.5)
  }

  test("minhashSig aggregate: identical sets → identical signatures") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 30L), (2L, 20L), (2L, 10L), // same set, different order
      (3L, 99L)).toDF("g", "h")
    val sigs = df.groupBy(col("g")).agg(minhashSig(col("h")).as("sig"))
      .orderBy("g").as[(Long, Seq[Long])].collect()
    assert(sigs(0)._2 === sigs(1)._2) // order-insensitive
    assert(sigs(0)._2 !== sigs(2)._2)
    assert(sigs(0)._2.length === 32)
  }

  test("SqlMatrix.subst: prefix-colliding table names substitute longest-first") {
    // part vs partsupp: naive in-order replace would mangle
    // "$partsupp" into "v_partsupp"-broken text via the "$part" pass
    val got = graft.operators.SqlMatrix.subst(
      "SELECT * FROM $partsupp JOIN $part ON $part.k = $partsupp.k",
      Seq("part", "partsupp"), "v_")
    assert(got ===
      "SELECT * FROM v_partsupp JOIN v_part ON v_part.k = v_partsupp.k")
    // oracle side (empty prefix) is the identity on names
    assert(graft.operators.SqlMatrix.subst(
      "$part $partsupp", Seq("part", "partsupp"), "") === "part partsupp")
  }

  test("SQL names are registered via GraftExtensions") {
    val r = spark.sql("SELECT graft_fnv64('abc') AS h, graft_dot(array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect().head
    assert(r.getLong(0) === 0xe71fa2190541574bL)
    assert(r.getDouble(1) === 11.0)
  }

  test("mgSketch: retention guarantee holds under many partitions and skew") {
    import spark.implicits._
    val cap = 16
    // 3 true heavy hitters drowned in a long tail: hh0 2000, hh1 1200,
    // hh2 800 of N = 4000 + 6000 tail = 10000 → threshold N/17 ≈ 588.
    // tail words each appear ~6 times (far below). 32 partitions force
    // per-partition buffers + a deep merge tree.
    val rows =
      Seq.fill(2000)("hh0") ++ Seq.fill(1200)("hh1") ++ Seq.fill(800)("hh2") ++
        (0 until 6000).map(i => s"tail${i % 1000}")
    val df = rows.toDF("w").repartition(32)
    val cands = df.agg(mgSketch(col("w"), cap)).collect()
      .head.getSeq[String](0).toSet
    assert(cands.size <= cap)
    assert(Set("hh0", "hh1", "hh2").subsetOf(cands),
      s"heavy hitters missing from $cands")
  }
}
