package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftHash, GraftVec}

/** Property tests for the byte-level kernels against naive reference
  * implementations (catches word-boundary, empty-input, and unicode
  * edge cases the corpus never exercises).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  /** raw-scalacheck sampling (no scalatestplus bridge in the deps) */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach(_ => g.sample.foreach(f))
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 200).foreach(_ => for (a <- ga.sample; b <- gb.sample) f(a, b))

  private val wordGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("héllo", "wörld", "日本語", "données", ""))
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(12, wordGen)
    seps <- Gen.listOfN(12, Gen.oneOf(" ", "  ", "   "))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private def naiveShingles(s: String, n: Int): Set[Long] = {
    val words = s.split(" +").filter(_.nonEmpty)
    if (words.isEmpty) Set.empty
    else {
      val grams =
        if (words.length <= n) Seq(words.mkString(" "))
        else words.sliding(n).map(_.mkString(" ")).toSeq
      grams.map(g => GraftHash.fnv64(g.getBytes("UTF-8"))).toSet
    }
  }

  test("shingleHashes matches the naive split/sliding implementation") {
    forAll(textGen) { s =>
      val got = GraftHash.shingleHashes(UTF8String.fromString(s), 3).toLongArray().toSet
      assert(got === naiveShingles(s, 3))
    }
  }

  test("shingleHashes is whitespace-run and edge-space insensitive") {
    forAll(textGen) { s =>
      val a = GraftHash.shingleHashes(UTF8String.fromString(s), 3).toLongArray().toSet
      val b = GraftHash.shingleHashes(UTF8String.fromString("  " + s.replace(" ", "  ") + " "), 3)
        .toLongArray().toSet
      assert(a === b)
    }
  }

  test("jaccardLongs equals naive set jaccard") {
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.toArray)
    forAll2(arrGen, arrGen) { (a, b) =>
      val got = GraftVec.jaccardLongs(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b))
      val (sa, sb) = (a.toSet, b.toSet)
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(got === expected)
    }
  }

  test("minhashUpdate is order-insensitive and monotone") {
    val setGen = Gen.nonEmptyListOf(Gen.long).map(_.distinct)
    forAll(setGen) { xs =>
      val b1 = Array.fill(GraftHash.MinhashN)(Long.MaxValue)
      val b2 = Array.fill(GraftHash.MinhashN)(Long.MaxValue)
      xs.foreach(GraftHash.minhashUpdate(b1, _))
      scala.util.Random.shuffle(xs).foreach(GraftHash.minhashUpdate(b2, _))
      assert(b1.toSeq === b2.toSeq)
      // superset can only lower signature values
      val b3 = b1.clone()
      GraftHash.minhashUpdate(b3, 12345L)
      assert(b3.zip(b1).forall { case (s, o) => s <= o })
    }
  }

  test("simhash64 of identical byte content is stable; empty is zero-ish") {
    forAll(textGen) { s =>
      val a = GraftHash.simhash64(UTF8String.fromString(s))
      val b = GraftHash.simhash64(UTF8String.fromString(s))
      assert(a === b)
    }
    assert(GraftHash.simhash64(UTF8String.fromString("")) === 0L)
  }

  test("fnv64 byte-iterating kernel equals byte-array form") {
    forAll(textGen) { s =>
      assert(GraftHash.fnv64(UTF8String.fromString(s)) ===
        GraftHash.fnv64(s.getBytes("UTF-8")))
    }
  }

  test("kernels are BYTE-level on UTF-8 multibyte text (documented contract)") {
    // Contract: graft's hash kernels read UTF-8 BYTES, never code
    // points — correct and deterministic for any input. Only the
    // DuckDB ORACLE (OracleSql.fnvU64's unicode(substr(..)) fold) is
    // ASCII-bound, which the gate corpus satisfies; non-ASCII parity
    // would need a byte-level fold on the oracle side.
    val multi = Seq("héllo wörld déjà", "日本語 テスト 文字列", "mixé ascii and ünïcode",
      "a é 日", "naïve café entrée")
    for (s <- multi) {
      val u = UTF8String.fromString(s)
      // fnv64 over the whole string equals the byte-array fold
      assert(GraftHash.fnv64(u) === GraftHash.fnv64(s.getBytes("UTF-8")))
      // shingles equal the naive byte-level reference (multibyte words
      // hash by their UTF-8 bytes, not their code points)
      assert(GraftHash.shingleHashes(u, 3).toLongArray().toSet === naiveShingles(s, 3))
      // stable across identical byte content
      assert(GraftHash.simhash64(u) === GraftHash.simhash64(UTF8String.fromString(s)))
      assert(GraftHash.polyFingerprint(u) ===
        GraftHash.polyFingerprint(UTF8String.fromString(s)))
    }
  }

  test("fmtTimestamp equals java.time UTC formatting across years 1..9999") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    // full domain incl. pre-1970, leap days, century non-leap years
    val microsGen = Gen.chooseNum(
      java.time.Instant.parse("0001-01-01T00:00:00Z").getEpochSecond * 1000000L,
      java.time.Instant.parse("9999-12-31T23:59:59Z").getEpochSecond * 1000000L)
    forAll(microsGen, n = 2000) { us =>
      val expected = fmt.format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L)))
      assert(GraftHash.fmtTimestamp(us).toString === expected, s"micros=$us")
    }
    // fixed edges: epoch, leap day, 2100 non-leap, sub-second floor
    for (s <- Seq("1970-01-01T00:00:00Z", "2000-02-29T23:59:59Z",
        "2100-02-28T12:34:56Z", "1969-12-31T23:59:59Z")) {
      val us = java.time.Instant.parse(s).getEpochSecond * 1000000L + 999999L
      assert(GraftHash.fmtTimestamp(us).toString ===
        fmt.format(java.time.Instant.parse(s)))
    }
  }

  test("pqAssign/pqAssignD match a naive argmin reference (ties to smallest j)") {
    val ad = org.apache.spark.sql.catalyst.util.ArrayData
    val (m, k, dim) = (4, 8, 16)
    val sub = dim / m
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-64, 63).map(_ / 16.0))
    val cbGen = Gen.listOfN(k * dim, Gen.chooseNum(-64, 63).map(_ / 16.0))
    def naive(v: Array[Double], cb: Array[Double]): (Seq[Long], Double) = {
      val per = (0 until m).map { s =>
        (0 until k).map { j =>
          val d = (0 until sub).map { t =>
            val x = v(s * sub + t) - cb(j * dim + s * sub + t); x * x
          }.sum
          (d, j.toLong)
        }.minBy(p => (p._1, p._2)) // smallest distance, then smallest j
      }
      (per.map(_._2), per.map(_._1).sum)
    }
    forAll2(vecGen, cbGen) { (vl, cbl) =>
      val v = vl.toArray
      val cb = cbl.toArray
      val (wantCodes, wantErr) = naive(v, cb)
      val gotD = GraftVec.pqAssignD(ad.toArrayData(v), cb, m, k)
      assert(gotD.getArray(0).toLongArray().toSeq === wantCodes)
      assert(math.abs(gotD.getDouble(1) - wantErr) < 1e-12)
      val gotF = GraftVec.pqAssign(ad.toArrayData(v.map(_.toFloat)), cb, m, k)
      // /16.0 grid values are float-exact, so the float path agrees too
      assert(gotF.getArray(0).toLongArray().toSeq === wantCodes)
    }
  }

  test("boundedLevenshtein equals min(full Levenshtein, bound+1) incl. cap and band edges") {
    def full(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val sGen = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString)
      .flatMap(s => Gen.choose(0, s.length).map(s.take))
    forAll2(sGen, sGen) { (s, t) =>
      for (bound <- 0 to 6) {
        val want = math.min(full(s, t), bound + 1).toLong
        val got = GraftHash.boundedLevenshtein(
          UTF8String.fromString(s), UTF8String.fromString(t), bound)
        assert(got === want, s"s=$s t=$t bound=$bound")
      }
    }
    // deterministic edges: empty strings, length-gap fast path
    assert(GraftHash.boundedLevenshtein(
      UTF8String.fromString(""), UTF8String.fromString("abc"), 2) === 3L)
    assert(GraftHash.boundedLevenshtein(
      UTF8String.fromString(""), UTF8String.fromString(""), 0) === 0L)
    assert(GraftHash.boundedLevenshtein(
      UTF8String.fromString("abcdefgh"), UTF8String.fromString("a"), 3) === 4L)
  }

  test("jaroWinkler matches DuckDB jaro_winkler_similarity goldens bit-for-bit") {
    // golden values queried from duckdb 1.x `jaro_winkler_similarity`
    val goldens = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("CRANE", "TRACE", 0.7333333333333334),
      ("forest green Metallic", "forest metallic green", 0.9209523809523809),
      ("é-aé", "e-ae", 0.611111111111111),
      ("abc", "", 0.0),
      ("", "", 0.0), // DuckDB scores any empty side 0, even "" vs ""
      ("a", "a", 1.0))
    goldens.foreach { case (a, b, want) =>
      val got = GraftHash.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got === want, s"a=$a b=$b")
    }
  }

  test("jaroWinkler invariants: symmetric, [0,1], identity, disjoint-alphabet zero") {
    val sGen = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString)
      .flatMap(s => Gen.choose(0, s.length).map(s.take))
    forAll2(sGen, sGen) { (s, t) =>
      val st = GraftHash.jaroWinkler(
        UTF8String.fromString(s), UTF8String.fromString(t))
      val ts = GraftHash.jaroWinkler(
        UTF8String.fromString(t), UTF8String.fromString(s))
      assert(st === ts, s"symmetry s=$s t=$t")
      assert(st >= 0.0 && st <= 1.0, s"range s=$s t=$t got=$st")
      if (s.nonEmpty)
        assert(GraftHash.jaroWinkler(
          UTF8String.fromString(s), UTF8String.fromString(s)) === 1.0)
    }
    // no common BYTES -> no matches -> 0 (ASCII alphabets so the
    // byte-disjointness is by construction; 'é' would share its UTF-8
    // lead byte with other Latin-1 letters)
    val aGen = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      .suchThat(_.nonEmpty)
    val bGen = Gen.listOfN(8, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
      .suchThat(_.nonEmpty)
    forAll2(aGen, bGen) { (s, t) =>
      assert(GraftHash.jaroWinkler(
        UTF8String.fromString(s), UTF8String.fromString(t)) === 0.0)
    }
  }

  test("damerauLevenshtein matches DuckDB damerau_levenshtein goldens (TRUE variant)") {
    // golden values queried from duckdb 1.x `damerau_levenshtein`;
    // ("CA","ABC",2) pins the TRUE/unrestricted variant (OSA = 3),
    // ("aé","éa",2) pins the UTF-8 byte domain (code-point DL = 1)
    val goldens = Seq(
      ("CA", "ABC", 2L), ("ab", "ba", 1L), ("abcdef", "abdcfe", 2L),
      ("kitten", "sitting", 3L), ("MARTHA", "MARHTA", 1L),
      ("", "ab", 2L), ("aé", "éa", 2L), ("a cat", "an act", 2L),
      ("xyxyxy", "yxyxyx", 2L), ("bdaaa", "abaad", 3L),
      ("abadaa", "ada", 3L), ("abc", "bacbab", 4L),
      ("aaabd", "dcddccbb", 7L), ("acd", "dcaad", 3L),
      ("cb", "daacccd", 6L), ("daacdaacd", "dcad", 5L),
      ("badab", "bbdd", 3L))
    goldens.foreach { case (a, b, want) =>
      assert(GraftHash.damerauLevenshtein(
        UTF8String.fromString(a), UTF8String.fromString(b)) === want,
        s"a=$a b=$b")
      assert(GraftHash.damerauLevenshtein(
        UTF8String.fromString(b), UTF8String.fromString(a)) === want,
        s"swapped a=$a b=$b")
    }
  }

  test("damerauLevenshtein invariants: identity, length gap, <= levenshtein, swap=1") {
    val sGen = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
      .flatMap(s => Gen.choose(0, s.length).map(s.take))
    forAll2(sGen, sGen) { (s, t) =>
      val dl = GraftHash.damerauLevenshtein(
        UTF8String.fromString(s), UTF8String.fromString(t))
      assert(GraftHash.damerauLevenshtein(
        UTF8String.fromString(s), UTF8String.fromString(s)) === 0L)
      assert(dl >= math.abs(s.length - t.length).toLong)
      assert(dl <= math.max(s.length, t.length).toLong)
      // DL can only be cheaper than plain Levenshtein (ASCII input so
      // the byte/char domains coincide with boundedLevenshtein's)
      val lev = GraftHash.boundedLevenshtein(
        UTF8String.fromString(s), UTF8String.fromString(t), 64)
      assert(dl <= lev, s"s=$s t=$t dl=$dl lev=$lev")
      // one adjacent swap costs exactly 1 (on distinct neighbors)
      if (s.length >= 2 && s(0) != s(1)) {
        val sw = s"${s(1)}${s(0)}" + s.drop(2)
        assert(GraftHash.damerauLevenshtein(
          UTF8String.fromString(s), UTF8String.fromString(sw)) === 1L)
      }
    }
  }
}
