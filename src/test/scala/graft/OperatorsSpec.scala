package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Skew}

/** Semantics checks on constructed frames for the custom operators. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("asofJoin: latest right row at-or-before, nulls when none") {
    import spark.implicits._
    val left = Seq((1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 0L, "p0"), (2L, 7L, "p7"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 1L, "r1"), (1L, 7L, "r7"), (1L, 10L, "r10"))
      .toDF("k", "t", "rv")
    val got = AsOf.asofJoin(left, right, "k", "t", "t", Seq("rv"))
      .select("lv", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "p0" -> null, // before any right row
      "p5" -> "r1", // latest at-or-before 5
      "p10" -> "r10", // equal time counts (>=)
      "p7" -> null)) // key 2 has no right rows
  }

  test("asofJoinNear: tolerance nulls stale matches; forward picks first at-or-after") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "t", "lv")
    val right = Seq((1L, 90L, "r90"), (1L, 205L, "r205")).toDF("k", "t", "rv")
    val back = AsOf.asofJoinNear(left, right, "k", "t", "t", Seq("rv"),
        toleranceNs = 15L)
      .select("lv", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back === Map(
      "a" -> "r90", // gap 10 within tolerance 15
      "b" -> null)) // latest-at-or-before is r90, 110 stale -> nulled
    val fwd = AsOf.asofJoinNear(left, right, "k", "t", "t", Seq("rv"),
        toleranceNs = 10L, forward = true)
      .select("lv", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fwd === Map(
      "a" -> null, // first-at-or-after is r205, gap 105 > 10
      "b" -> "r205")) // gap 5 within tolerance
  }

  test("saltedJoin equals plain equi-join") {
    import spark.implicits._
    // skewed fact: one hot key
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "v")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (6L, "d")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "k", 8).groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("s06 quantization: codes in [-127,127], reconstruction error within half a step") {
    // max quantization error per element is (0.5 + eps)/scale; with the
    // per-vector max-abs scale that is mx/254 — check the bound holds
    // on the real embeddings and codes saturate at the extreme element
    val sf = GraftTestSession.sf
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xd"),
        array_max(transform(col("embedding"), x => abs(x.cast("double")))).as("mx"))
      .filter(col("mx") > 0)
      .withColumn("scale", lit(127.0) / col("mx"))
      .withColumn("codes", transform(col("xd"), x => round(x * col("scale")).cast("long")))
      .withColumn("cmax", array_max(transform(col("codes"), c => abs(c))))
      .withColumn("err", array_max(zip_with(col("xd"), col("codes"),
        (x, c) => abs(x - c.cast("double") / col("scale")))))
    val bad = e.filter(col("cmax") > 127 ||
      col("err") > (col("mx") / lit(254.0)) * lit(1.0000001)).count()
    assert(bad === 0)
    // the max-abs element must quantize to exactly +/-127
    assert(e.filter(col("cmax") === 127).count() === e.count())
  }

  test("q63 merge upsert: actions partition the key space correctly") {
    val sf = GraftTestSession.sf
    val out = SparkEntry.queries("q63_merge_upsert")(spark, sf)
    val byAction = out.groupBy("merge_action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = graft.sources.Tables.orders(spark, sf)
    val nUpd = orders.filter(col("o_orderkey") % 7 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 1000 === 3).count()
    val nAll = orders.count()
    assert(byAction.getOrElse("updated", 0L) === nUpd)
    assert(byAction.getOrElse("inserted", 0L) === nIns)
    assert(byAction.getOrElse("kept", 0L) === nAll - nUpd)
    // updated rows carry the new price: spot-check one key
    val k = orders.filter(col("o_orderkey") % 7 === 0)
      .select(min(col("o_orderkey"))).collect().head.getLong(0)
    val before = orders.filter(col("o_orderkey") === k)
      .select("o_totalprice").collect().head.getDouble(0)
    val after = out.filter(col("o_orderkey") === k)
      .select("o_totalprice").collect().head.getDouble(0)
    assert(after === before + 10.0)
  }

  test("anyAllRewrite: empty subquery gives SQL semantics (> ALL(∅)=TRUE, < ANY(∅)=FALSE)") {
    import spark.implicits._
    val orders = Seq((1L, 10.0, "O"), (2L, 20.0, "F"), (3L, 30.0, "O"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    // no 'Z' orders → vacuous ALL is true for every row, ANY false
    val empty = graft.operators.Relational
      .anyAllRewrite(orders, col("o_orderstatus") === "Z")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(empty.toSeq === Seq((1L, true, false), (2L, true, false), (3L, true, false)))
    // non-empty: > ALL ≡ > max(20), < ANY ≡ < max(20)
    val some = graft.operators.Relational
      .anyAllRewrite(orders, col("o_orderstatus") === "F")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(some.toSeq === Seq((1L, false, true), (2L, false, false), (3L, true, false)))
  }

  test("anyAllRewrite: full 3VL with NULLs in the subquery and NULL probe values") {
    import spark.implicits._
    def tri(r: org.apache.spark.sql.Row, i: Int): Option[Boolean] =
      if (r.isNullAt(i)) None else Some(r.getBoolean(i))
    // S = {10, 20, NULL} (status P): a NULL in S makes every
    // non-disproven ALL and non-proven ANY UNKNOWN
    val withNull = Seq(
      (1L, Some(10.0), "P"), (2L, Some(20.0), "P"), (3L, None: Option[Double], "P"),
      (4L, Some(25.0), "O"), (5L, Some(15.0), "O"), (6L, None: Option[Double], "O"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val got = graft.operators.Relational
      .anyAllRewrite(withNull, col("o_orderstatus") === "P")
      .collect().map(r => r.getLong(0) -> ((tri(r, 1), tri(r, 2)))).toMap
    assert(got(4L) === ((None, None)))              // 25 > all non-null, but NULL ∈ S
    assert(got(5L) === ((Some(false), Some(true)))) // 15 ≤ 20 disproves ALL; 15 < 20 proves ANY
    assert(got(6L) === ((None, None)))              // NULL probe vs non-empty S
    assert(got(2L) === ((Some(false), None)))       // 20 ≤ 20; 20 < 20 false, NULL ∈ S
    // S all-NULL: UNKNOWN for every non-null probe too
    val allNull = Seq(
      (1L, None: Option[Double], "P"), (2L, Some(5.0), "O"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val got2 = graft.operators.Relational
      .anyAllRewrite(allNull, col("o_orderstatus") === "P")
      .collect().map(r => r.getLong(0) -> ((tri(r, 1), tri(r, 2)))).toMap
    assert(got2(2L) === ((None, None)))
  }

  test("PQ seam: MLlib-trained codebook drops into the kernel and tightens recon error") {
    val emb = graft.sources.Tables.embeddings(spark, GraftTestSession.sf)
    def avgErr(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recon_err"))).collect().head.getDouble(0)
    val sampled = avgErr(graft.operators.Similarity.pqQuantize(emb, 8, 16))
    val trained = avgErr(graft.operators.Similarity.pqQuantizeWith(
      emb, graft.operators.Similarity.pqKmeansCodebook(emb, 8, 16), 8, 16))
    // a trained codebook must beat 16 arbitrary data rows — clearly,
    // not marginally (observed ~2x tighter)
    assert(trained < sampled * 0.8, s"trained=$trained sampled=$sampled")
  }

  test("OPQ rotation: strictly tighter recon error on a correlated corpus, orthonormal R, sidecar round-trip") {
    import spark.implicits._
    val S = graft.operators.Similarity
    // correlated ANISOTROPIC corpus — the real-embedding shape the
    // near-isotropic gate corpus can't exhibit: rank-3 signal along
    // non-axis-aligned directions + small noise, so unrotated PQ
    // wastes every subspace's centroids on cross-subspace correlation
    val rnd = new scala.util.Random(7)
    val d = 64
    val dirs = Array.fill(3)(Array.fill(d)(rnd.nextGaussian()))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val emb = (0 until 512).map { id =>
      val c = Array(3.0, 2.0, 1.5).map(_ * rnd.nextGaussian())
      (id.toLong, Array.tabulate(d)(j =>
        (c(0) * dirs(0)(j) + c(1) * dirs(1)(j) + c(2) * dirs(2)(j) +
          0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    def avgErr(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recon_err"))).collect().head.getDouble(0)
    val unrot = avgErr(S.pqQuantizeWith(emb, S.pqKmeansCodebook(emb, 8, 16), 8, 16))
    val r = S.opqParametricRotation(emb, 8, sampleN = 512)
    // R must be orthonormal (distances preserved → search semantics
    // unchanged; only the quantization grid moves)
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(x => r(i * d + x) * r(j * d + x)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"R not orthonormal at ($i,$j): $dot")
    }
    val rotDf = S.rotateEmbeddings(emb, r)
    val rot = avgErr(S.pqQuantizeWith(rotDf, S.pqKmeansCodebook(rotDf, 8, 16), 8, 16))
    info(f"recon err: unrotated $unrot%.4f -> rotated $rot%.4f (${rot / unrot}%.2fx)")
    // strictly below, and clearly so — the rotation must buy real
    // grid quality on anisotropic data, not a rounding artifact
    assert(rot < unrot * 0.9, s"rotated=$rot unrotated=$unrot")
    // KB sidecar round-trips exactly
    val tmp = java.nio.file.Files.createTempDirectory("graft-opq").toString
    S.writeOpqSidecar(spark, tmp, r)
    assert(S.readOpqSidecar(spark, tmp).toSeq === r.toSeq)
  }

  test("pqQuantize: codebook vectors code to themselves with zero error") {
    val out = graft.operators.Similarity
      .pqQuantize(graft.sources.Tables.embeddings(spark, GraftTestSession.sf), 8, 16)
      .filter(col("vec_id") < 16).collect()
    assert(out.length === 16)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === Array.fill(8)(id).mkString(","), s"vec $id")
      assert(r.getDouble(2) === 0.0, s"vec $id")
    }
  }

  test("percentileGate: per-group threshold, ties kept, no corpus sort window") {
    import spark.implicits._
    val scored = (
      (1L to 10L).map(i => (i, "a", i)) ++          // a: scores 1..10
      (11L to 14L).map(i => (i, "b", 5L)) ++        // b: all tied at 5
      Seq((21L, "c", 1L), (22L, "c", 1L), (23L, "c", 2L), (24L, "c", 3L))
    ).toDF("doc_id", "lang", "n_words")
    val out = graft.operators.TextOps.percentileGate(scored, "lang", "n_words", 0.2)
      .select("doc_id", "lang", "n_words", "thr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val byLang = out.groupBy(_._2)
    // a: n=10, ceil(0.2*10)=2 -> thr=2, doc 1 (score 1) dropped
    assert(byLang("a").map(_._1).sorted === (2L to 10L))
    assert(byLang("a").forall(_._3 == 2L))
    // b: all tied at the threshold value -> everything kept
    assert(byLang("b").map(_._1).sorted === (11L to 14L))
    // c: n=4, ceil(0.8)=1 -> thr=1 (cum at score 1 is already 2) -> all kept
    assert(byLang("c").map(_._1).sorted === Seq(21L, 22L, 23L, 24L))

    // scale shape: the only window runs over the histogram, and the
    // threshold join is a broadcast — the corpus never sorts per group
    val plan = graft.operators.TextOps.percentileGate(scored, "lang", "n_words", 0.2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"threshold join should broadcast:\n$plan")
  }

  test("percentileGateApprox: continuous scores, threshold within rank-error of exact") {
    import spark.implicits._
    // 1000 distinct continuous scores in one group — the shape where
    // the exact histogram would be corpus-sized
    val scored = (1 to 1000)
      .map(i => (i.toLong, "a", i / 1000.0 + 1e-9 * i)).toDF("doc_id", "lang", "s")
    val kept = graft.operators.TextOps
      .percentileGateApprox(scored, "lang", "s", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact p=0.2 drops docs 1..199 (threshold = 200th value); at
    // accuracy=10000 the rank error on n=1000 is well under 1 rank,
    // but allow a small slack band
    val dropped = (1L to 1000L).toSet -- kept
    assert(dropped.forall(_ <= 205L), s"dropped above the error band: $dropped")
    assert(dropped.size >= 195 && dropped.size <= 205,
      s"dropped ${dropped.size}, expected ~200 (p=0.2 of 1000)")
    // kept set is a suffix: the gate is a pure threshold
    assert(kept === ((dropped.max + 1) to 1000L).toSet)
  }

  test("gopherRules: first failing rule named, clean doc kept") {
    import spark.implicits._
    val rows = Seq(
      1L -> "the cat sat of the mat with nice red hats in town",
      2L -> "too short here",
      3L -> "a b c d e f g h i j k l",
      4L -> "cats dogs bird fish goat lion tiger bear wolf deer",
      5L -> "the of 1234 5678 9012 3456 7890 1234 5678 9012 3456 7890",
      6L -> "the of aa!!! bb@@@ cc### dd$$$ ee%%% ff^^^ gg&&& hh*** ii((( jj)))"
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.gopherRules(rows).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getString(3)))).toMap
    assert(got(1L) === ((true, null)))
    assert(got(2L) === ((false, "word_count")))
    assert(got(3L) === ((false, "mean_word_len")))
    assert(got(4L) === ((false, "stopwords")))
    assert(got(5L) === ((false, "alpha_words")))
    assert(got(6L) === ((false, "symbol_ratio")))
  }

  test("t07 BM25: a doc repeating the query's rare terms outranks one without them") {
    // corpus semantics on the real output: scores strictly ordered,
    // all positive, and every scored doc shares at least one term
    // with doc 0
    val sf = GraftTestSession.sf
    val out = SparkEntry.queries("t07_bm25")(spark, sf).collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  test("t16 chunking: stride overlap, full coverage, exact reassembly") {
    import spark.implicits._
    // 80 words → starts 0,24,48,72: three full 32-word chunks + an
    // 8-word tail; consecutive chunks overlap by exactly 32-24=8 words
    val words = (0 until 80).map(i => s"w$i")
    val one = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.operators.TextOps.chunkOverlap(one)
      .select(col("chunk_id"), col("chunk_text"))
      .orderBy("chunk_id").collect()
    assert(chunks.length === 4)
    val texts = chunks.map(_.getString(1))
    assert(texts(0).split(" ").length === 32)
    assert(texts(3).split(" ").length === 8) // tail chunk
    // overlap: last 8 words of chunk i == first 8 words of chunk i+1
    for (i <- 0 until 3)
      assert(texts(i).split(" ").takeRight(8).sameElements(
        texts(i + 1).split(" ").take(8)))
    // coverage: union of de-overlapped chunks reassembles the doc
    val reassembled = texts.head.split(" ") ++
      texts.tail.flatMap(_.split(" ").drop(8))
    assert(reassembled.sameElements(words))
  }

  test("t16 chunking: randomized corpus matches a driver-side reference chunker") {
    import spark.implicits._
    // deterministic pseudo-random texts: varied word counts (0..~90),
    // occasional empty/multi-space content via the word generator
    def word(seed: Long, j: Int): String = {
      val h = (seed * 31 + j) * 2654435761L % 1000003
      if (h % 17 == 0) "" else s"w${h % 97}"
    }
    val docs = (0L until 200L).map { id =>
      val n = ((id * 13) % 91).toInt
      (id, (0 until n).map(word(id, _)).mkString(" "))
    }
    val got = graft.operators.TextOps.chunkOverlap(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    // reference: same trim/single-space-split semantics as the op
    val want = docs.flatMap { case (id, text) =>
      val ws = text.trim.split(" ", -1)
      val starts = 0 to math.max(ws.length - 1, 0) by 24
      starts.zipWithIndex.map { case (st, ci) =>
        val chunk = ws.slice(st, st + 32)
        (id, ci.toLong) -> ((chunk.mkString(" "),
          math.min(ws.length - st, 32).toLong))
      }
    }.toMap
    assert(got === want)
  }

  test("s11 matryoshka: shortlist containment and exact-rerank agreement") {
    val emb = graft.sources.Tables.embeddings(spark, GraftTestSession.sf)
    val mat = graft.operators.Similarity.matryoshkaTopK(emb, 0L, 10, 16, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = graft.operators.Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // re-ranked scores are EXACT full-dim cosines: any id in both
    // results must carry the identical score
    mat.keySet.intersect(full.keySet).foreach { id =>
      assert(mat(id) === full(id), s"vec $id rerank score differs")
    }
    // the contract row gates recall and must agree with the overlap
    val row = graft.operators.Similarity
      .matryoshkaRecall(emb, 0L, 10, 16, 50, 0.0).head()
    assert(row.getLong(3) === mat.keySet.intersect(full.keySet).size.toLong)
  }

  test("d19 semDedup: nearest-centroid assignment and drop rule match brute force") {
    val emb = graft.sources.Tables.embeddings(spark, GraftTestSession.sf)
    val got = graft.operators.Dedup.semDedup(emb, 16, 0.3).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cents = (0 until 16).map(i => vecs(i.toLong))
    def l2(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cellOf = vecs.map { case (id, v) =>
      id -> (0 until 16).minBy(j => l2(v, cents(j))) // minBy ties → first = smallest j
    }
    got.foreach { case (id, (c, _)) =>
      assert(c === cellOf(id), s"vec $id assigned to wrong cell")
    }
    val ids = vecs.keys.toSeq.sorted
    val droppedRef = ids.filter { j =>
      ids.exists(i => i < j && cellOf(i) == cellOf(j) && cos(vecs(i), vecs(j)) >= 0.3)
    }.toSet
    assert(droppedRef.nonEmpty, "gate corpus should drop at least one semantic dup")
    assert(got.filter(_._2._2).keySet === droppedRef)
  }

  test("d19 semDedup: trained KMeans centroids drop into the centroid seam") {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = graft.sources.Tables.embeddings(spark, GraftTestSession.sf)
    // pinned partitioning + seed, the s04 determinism recipe
    val fv = emb.repartition(8, col("vec_id")).sortWithinPartitions("vec_id")
      .withColumn("fv", array_to_vector(col("embedding")))
    val cents = new KMeans().setK(8).setSeed(7L).setMaxIter(10)
      .setFeaturesCol("fv").fit(fv).clusterCenters.map(_.toArray)
    val got = graft.operators.Dedup.semDedupWithCentroids(emb, cents, 0.3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got.size === emb.count())
    // trained cells are the argmin-L2 assignment against the fit's centers
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(v: Array[Double], c: Array[Double]): Double =
      v.indices.foldLeft(0.0)((s, i) => { val d = v(i) - c(i); s + d * d })
    got.foreach { case (id, (cell, _)) =>
      assert(cell === cents.indices.minBy(j => l2(vecs(id), cents(j))))
    }
    // drop rule unchanged: every drop has a smaller-id cell-mate at tau
    val cellOf = got.map { case (id, (c, _)) => id -> c }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.filter(_._2._2).keys.foreach { j =>
      assert(vecs.keys.exists(i =>
        i < j && cellOf(i) == cellOf(j) && cos(vecs(i), vecs(j)) >= 0.3),
        s"dropped $j has no similar smaller-id cell-mate")
    }
  }

  test("t18 qualityScore: sigmoid of the index-order dot, keep = logit sign") {
    val docs = graft.sources.Tables.documents(spark, GraftTestSession.sf)
    val emb = graft.operators.TextOps.embedDocuments(docs)
    val w = graft.operators.TextOps.classifierWeights(64)
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = graft.operators.TextOps.qualityScore(emb, w).collect()
    assert(got.length === vecs.size)
    got.foreach { r =>
      val v = vecs(r.getLong(0))
      var dot = 0.0
      v.indices.foreach(i => dot += v(i) * w(i)) // same fold order as the plan
      assert(r.getBoolean(2) === (dot >= 0))
      assert(math.abs(r.getDouble(1) - 1.0 / (1.0 + math.exp(-dot))) < 1e-6)
    }
    // the head separates: both classes present on the gate corpus
    assert(got.exists(_.getBoolean(2)) && got.exists(!_.getBoolean(2)))
  }

  test("t18: trained LogisticRegression head drops into the same literal slot") {
    // the s07/d19 trained-seam parity pattern: fit a REAL MLlib model,
    // feed its coefficients through the production literal slot, and
    // assert (a) the kernel path's physical plan is UNCHANGED (no new
    // shuffle, same node sequence as the dyadic head) and (b) the
    // trained head actually learned — it reproduces its training
    // labels with high accuracy on the gate corpus.
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val docs = graft.sources.Tables.documents(spark, GraftTestSession.sf)
    val emb = graft.operators.TextOps.embedDocuments(docs)
      .localCheckpoint(true) // one embed pass; both heads read the same frame
    val w0 = graft.operators.TextOps.classifierWeights(64)
    // deterministic, linearly separable label: the dyadic head's own
    // keep decision (teacher-student distillation shape — no RNG)
    val teacher = graft.operators.TextOps.qualityScore(emb, w0)
      .select(col("doc_id"), col("keep").cast("double").as("label"))
    // pinned partitioning + no intercept (qualityScore has no bias
    // slot), the s04/s07 determinism recipe
    val fv = teacher.join(emb, "doc_id")
      .repartition(8, col("doc_id")).sortWithinPartitions("doc_id")
      .withColumn("fv", array_to_vector(col("embedding")))
    val model = new LogisticRegression().setFeaturesCol("fv")
      .setLabelCol("label").setFitIntercept(false)
      .setRegParam(0.0).setMaxIter(50).fit(fv)
    val trained = model.coefficients.toArray
    assert(trained.length === 64)
    val scored = graft.operators.TextOps.qualityScore(emb, trained)
    // (b) sane accuracy: >= 95% agreement with the training labels
    val n = emb.count()
    val agree = scored.select(col("doc_id"), col("keep"))
      .join(teacher, "doc_id")
      .filter(col("keep") === (col("label") === 1.0)).count()
    assert(agree >= (n * 95) / 100,
      s"trained head agrees on $agree/$n — did not learn the teacher")
    // (a) plan parity: same node sequence as the dyadic head, zero
    // exchanges — the trained coefficients are literals exactly like
    // classifierWeights, so nothing about the plan may move
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head.linesIterator
        .flatMap("""^[\s+:*()\d-]*([A-Za-z][A-Za-z0-9]+)""".r
          .findFirstMatchIn(_).map(_.group(1)))
        .toSeq
    }
    val trainedShape = shape(scored)
    assert(trainedShape === shape(graft.operators.TextOps.qualityScore(emb, w0)))
    assert(!trainedShape.exists(_.contains("Exchange")),
      s"trained head introduced a shuffle: $trainedShape")
  }

  test("s15 batch matryoshka agrees with the single-query path per query") {
    val emb = graft.sources.Tables.embeddings(spark, GraftTestSession.sf)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = graft.operators.Similarity.matryoshkaTopKBatch(emb, qs, 10, 16, 50)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1), r.getDouble(2))).toSet }
    (0L until 3L).foreach { q =>
      val single = graft.operators.Similarity.matryoshkaTopK(emb, q, 10, 16, 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(q) === single, s"query $q batch/single divergence")
    }
  }

  test("rj02 intervalOverlapJoin equals the exhaustive inequality join") {
    import spark.implicits._
    // spans crossing bucket boundaries, nested, touching, disjoint
    val a = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 20L, 29L), (4L, 100L, 100L))
      .toDF("aid", "as_", "ae")
    val b = Seq((10L, 9L, 12L), (11L, 6L, 6L), (12L, 30L, 40L), (13L, 0L, 200L))
      .toDF("bid", "bs", "be")
    val grid = graft.operators.RangeJoin
      .intervalOverlapJoin(a, b, "as_", "ae", "bs", "be", bucketWidth = 4L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b, col("as_") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid === naive, s"grid $grid vs naive $naive")
    // the wide b-interval meets every a-interval; the disjoint one meets none
    assert(naive.count(_._2 == 13L) === 4 && !naive.exists(_._2 == 12L))
  }

  test("s16 knnJoin equals the symmetric window top-k over the near-dup pair set") {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.sources.Tables.embeddings(spark, GraftTestSession.sf)
    val res = graft.operators.Similarity.knnJoin(emb, 0.3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pairs = graft.operators.Similarity.nearDupPairs(emb, 0.3)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"), col("cos"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nb"), col("cos")))
    val naive = sym
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(desc("cos"), col("nb"))))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(res === naive, "TopKPerKey heap diverged from the window row_number rule")
    assert(res.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("pr01 pageRank equals a driver-side integer reference; hub outranks leaves") {
    import spark.implicits._
    // star 1—{2,3,4} plus disjoint pair 5—6, undirected
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    val sym = und ++ und.map(_.swap)
    val res = graft.operators.Graph.pageRank(sym.toDF("src", "dst"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent driver-side reference, same integer rule
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (sym.map(_._1) ++ sym.map(_._2)).distinct
    val n = nodes.size
    val tp = 1000000000000L * 15L / (100L * n)
    var r = nodes.map(_ -> 1000000000000L / n).toMap
    (1 to 8).foreach { _ =>
      val inflow = sym.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r(s) * 85L / (deg(s) * 100L) }.sum).toMap
      r = nodes.map(v => v -> (tp + inflow.getOrElse(v, 0L))).toMap
    }
    assert(res === r, "distributed ranks diverged from the integer reference")
    assert(res(1L) > res(2L), "hub must outrank a leaf")
    assert(res(2L) === res(3L) && res(3L) === res(4L), "symmetric leaves must tie")
  }

  test("pr02 personalizedPageRank: integer reference parity; disconnected component ranks zero") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    val sym = und ++ und.map(_.swap)
    val res = graft.operators.Graph.personalizedPageRank(
      sym.toDF("src", "dst"), Seq(1L).toDF("id"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (sym.map(_._1) ++ sym.map(_._2)).distinct
    val tp = 1000000000000L * 15L / 100L // |S| = 1
    var r = nodes.map(v => v -> (if (v == 1L) 1000000000000L else 0L)).toMap
    (1 to 8).foreach { _ =>
      val inflow = sym.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r(s) * 85L / (deg(s) * 100L) }.sum).toMap
      r = nodes.map(v =>
        v -> ((if (v == 1L) tp else 0L) + inflow.getOrElse(v, 0L))).toMap
    }
    assert(res === r, "distributed PPR diverged from the integer reference")
    assert(res(5L) === 0L && res(6L) === 0L, "unreachable nodes must rank zero")
    assert(res(1L) > res(2L) && res(2L) > 0L)
  }

  test("tr01 trianglesPerVertex: degree-oriented counts equal brute force on a skewed toy graph") {
    import spark.implicits._
    // K4 {1..4} + hub 1 with pendants {7,8,9} + disjoint triangle {10,11,12}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 7L), (1L, 8L), (1L, 9L), (10L, 11L), (10L, 12L),
      (11L, 12L))
    val res = graft.operators.Graph
      .trianglesPerVertex(edges.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute-force reference: all vertex triples with all three edges
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = (for {
      i <- vs; j <- vs if i < j; k <- vs if j < k
      if has(i, j) && has(i, k) && has(j, k)
    } yield Seq(i, j, k)).flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(res === brute)
    assert(res(1L) === 3L && !res.contains(7L) && res(10L) === 1L)
  }


  test("tr02 clusteringCoefficient: K4 hub dilution, pendant null, triangle-free zero") {
    import spark.implicits._
    // K4 {1..4} + pendant 7 on 1 + path 10-11 (triangle-free)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 7L), (10L, 11L))
    val res = graft.operators.Graph
      .clusteringCoefficient(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // node 1: deg 4, tri 3 -> 6/12 = 0.5 (the pendant dilutes it);
    // nodes 2..4: deg 3, tri 3 -> 6/6 = 1.0
    assert(res(1L) === ((4L, 3L, Some(0.5))))
    assert(res(2L) === ((3L, 3L, Some(1.0))))
    // pendant: degree 1 -> no defined coefficient
    assert(res(7L) === ((1L, 0L, None)))
    // triangle-free but degree >= 2? 10/11 have deg 1 here; make the
    // zero explicit with node 1's neighbors in a square: covered by
    // sf data — here assert the triangle-free PRESENCE contract
    assert(res.contains(10L) && res(10L)._2 === 0L)
  }

  test("tr03 commonNeighborRecs: adjacency excluded, both directions served, celebrity cap") {
    import spark.implicits._
    // path 1-2-3 + 3-4: (1,3) adjacent via nothing? 1-3 NOT an edge,
    // share {2} -> cn 1; (2,4) share {3} -> cn 1; (1,4) share none
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val res = graft.operators.Graph.commonNeighborRecs(edges, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(res.toSet === Set((1L, 3L, 1L), (3L, 1L, 1L),
      (2L, 4L, 1L), (4L, 2L, 1L)))
    // adjacent pairs never recommended: K3 has no candidates at all
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    assert(graft.operators.Graph.commonNeighborRecs(k3, 5).isEmpty)
    // celebrity cap: star center 9 (deg 3) is the only shared
    // neighbor; capping centers below 3 kills every wedge through it
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("id_a", "id_b")
    assert(graft.operators.Graph.commonNeighborRecs(star, 5)
      .count() === 6L) // 3 unordered pairs x 2 directions
    assert(graft.operators.Graph
      .commonNeighborRecs(star, 5, maxCenterDeg = 2L).isEmpty)
  }

  test("rj03 maxConcurrency: day-offset carry-in exact across midnight; closed-interval touch counts") {
    import spark.implicits._
    val day = 86400000000L
    // two sessions open across midnight (start day 0, end day 1) plus
    // one on day 1 whose start EQUALS another's end (closed intervals
    // overlap at the shared instant) -> peak 3 on day 1
    val ivs = Seq(
      (1L, 1L, day - 1000L, day + 5000L),
      (2L, 1L, day - 500L, day + 2000L),
      (3L, 1L, day + 2000L, day + 9000L) // starts AT 2's end
    ).toDF("user_id", "sid", "s_start", "s_end")
    val r = graft.operators.RangeJoin.maxConcurrency(ivs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((3L, 3L, day + 2000L)))
    // disjoint control: never more than 1
    val solo = Seq((1L, 1L, 0L, 10L), (1L, 2L, 100L, 110L))
      .toDF("user_id", "sid", "s_start", "s_end")
    val r2 = graft.operators.RangeJoin.maxConcurrency(solo).collect()(0)
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 0L)
  }

  test("tr04 adamicAdarRecs: rare shared neighbor outranks the hub; deg-1 centers safe") {
    import spark.implicits._
    // 1 and 2 share BOTH a hub h (deg 4: 1,2,3,4) and a rare mutual
    // friend r (deg 2: 1,2); 3 and 4 share only the hub. AA(1,2) =
    // 1/ln(2) + 1/ln(4) > AA(3,4) = 1/ln(4) — under plain counting
    // (tr03) the pairs would tie at cn 1 vs 2; AA separates by rarity
    val edges = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L),
      (7L, 1L), (7L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val got = graft.operators.Graph.adamicAdarRecs(edges, 5)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val aa12 = math.rint((r9(1 / math.log(2)) + r9(1 / math.log(4))) * 1e6) / 1e6
    val aa34 = math.rint(r9(1 / math.log(4)) * 1e6) / 1e6
    assert(got((1L, 2L)) === aa12 && got((2L, 1L)) === aa12)
    assert(got((3L, 4L)) === aa34)
    assert(aa12 > aa34)
    // the deg-1 pendant pair (5,6) is adjacent — never recommended —
    // and its deg-1 endpoints as centers must not blow up 1/ln(1)
    assert(!got.keys.exists(k => k._1 == 5L || k._1 == 6L))
  }

  test("lp01 labelPropagation: two cliques converge to their min labels; deterministic ties") {
    import spark.implicits._
    // K4 {1..4} — bridge 4—5 — K4 {5..8}: communities must keep the
    // bridge from merging the cliques
    def k4(v: Seq[Long]) = for (i <- v; j <- v if i < j) yield (i, j)
    val edges = (k4(Seq(1L, 2L, 3L, 4L)) ++ k4(Seq(5L, 6L, 7L, 8L))
      :+ ((4L, 5L))).toDF("id_a", "id_b")
    val res = graft.operators.Graph.labelPropagation(edges, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L).forall(res(_) == 1L),
      s"left clique must adopt min label 1: $res")
    assert(Seq(6L, 7L, 8L).forall(res(_) == 5L),
      s"right clique must adopt min label 5: $res")
    // driver-side replay of the same sync rule = exact parity
    val sym = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(e => Seq(e, e.swap))
    var l = sym.map(_._1).distinct.map(v => v -> v).toMap
    (1 to 6).foreach { _ =>
      l = sym.groupBy(_._2).view.mapValues { in =>
        in.map(e => l(e._1)).groupBy(identity).view.mapValues(_.size)
          .toSeq.maxBy { case (lab, c) => (c, -lab) }._1
      }.toMap
    }
    assert(res === l, "distributed LPA diverged from the sync reference")
  }

  test("t21 dsirLogRatio: target-language docs score higher; replay-deterministic") {
    val docs = graft.sources.Tables.documents(spark, GraftTestSession.sf)
    val scores = graft.operators.TextOps.dsirLogRatio(docs, col("lang") === "en", 512)
    val j = scores.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_logratio")).as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(j(true) > j(false),
      s"target slice should score higher: en=${j(true)} other=${j(false)}")
    val r1 = scores.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val r2 = graft.operators.TextOps.dsirLogRatio(docs, col("lang") === "en", 512)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(r1 === r2, "DSIR scores are not replay-deterministic")
  }

  test("bfs01 shortestHops: exact BFS distances, cap honored, unreachable absent") {
    import spark.implicits._
    // path 1-2-3-4-5, branch 2-6, isolated component {8,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L),
      (8L, 9L))
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("id")
    def run(cap: Int) = graft.operators.Graph.shortestHops(edges, seeds, cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(8) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L,
      4L -> 3L, 5L -> 4L), "exact distances (8/9 unreachable, absent)")
    assert(run(2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L),
      "cap drops deeper nodes, keeps exact distances within it")
    // multi-source: nearest seed wins
    val ms = graft.operators.Graph.shortestHops(edges, Seq(1L, 5L).toDF("id"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ms(3L) === 2L && ms(4L) === 1L && ms(5L) === 0L)
  }

  test("bfs/hc probeEvery: batched early-exit probes leave results identical") {
    import spark.implicits._
    // diameter 4 from seed 1, maxHops 8: the true fixpoint lands at
    // h=4, so probeEvery=3 runs blind no-op rounds past it — the
    // CC-dial trade (k-1 empty-frontier rounds for k x fewer driver
    // barriers). Distances and harmonic sums must be bit-identical.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("id")
    def hops(k: Int) = graft.operators.Graph
      .shortestHops(edges, seeds, 8, probeEvery = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = hops(1)
    assert(hops(3) === base)
    // k > maxHops: only the h=0 probe ever fires, so the hop cap
    // alone ends the loop (k=7 would re-probe at h=7 and cut one
    // blind round — a different, weaker case)
    assert(hops(9) === base)
    val und = pairs.toDF("id_a", "id_b")
    def harm(k: Int) = graft.operators.Graph
      .harmonicCentrality(und, Seq(1L, 5L).toDF("id"), 8, probeEvery = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(harm(4) === harm(1))
  }

  test("kc01 kCore: cascading peel reaches the fixpoint core with in-core degrees") {
    import spark.implicits._
    // K4 {1..4} + pendant chain 4-5-6 + triangle {7,8,9}: the 3-core
    // is exactly the K4 (the chain peels in cascading rounds, and the
    // triangle dies because deg 2 < 3)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L), (7L, 9L), (8L, 9L))
    val got = graft.operators.Graph.kCore(pairs.toDF("id_a", "id_b"), 3L, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2 keeps the triangle too, and 4 loses its pendant edge
    val k2 = graft.operators.Graph.kCore(pairs.toDF("id_a", "id_b"), 2L, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      7L -> 2L, 8L -> 2L, 9L -> 2L))
    // budget exhaustion throws rather than returning an under-peeled core
    intercept[IllegalStateException] {
      graft.operators.Graph.kCore(pairs.toDF("id_a", "id_b"), 3L, 1)
    }
  }

  test("ss07 userGrowth: new/returning split and cumulative distinct on a toy stream") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 09:00:00"), (3L, "2024-01-02 10:00:00"),
      (1L, "2024-01-02 23:00:00"), // same user+day dup must collapse
      (2L, "2024-01-04 08:00:00")
    ).toDF("user_id", "s").select(col("user_id"),
      col("s").cast("timestamp").as("ts"))
    val got = graft.operators.Sessionize.userGrowth(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 2L, 0L, 2L)),
      "2024-01-02" -> ((2L, 1L, 1L, 3L)),
      "2024-01-04" -> ((1L, 0L, 1L, 3L))))
  }

  test("ss11 stickiness: trailing-28d MAU expires lapsed users; dup days collapse") {
    import spark.implicits._
    // u1 day 0 only; u2 days 0 and 30 (gap > 28 -> u1 out of the
    // day-30 window, u2's own day-0 coverage also expired)
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 12:00:00"),
      (2L, "2024-01-01 11:00:00"), (2L, "2024-01-31 09:00:00")
    ).toDF("user_id", "s").select(col("user_id"),
      col("s").cast("timestamp").as("ts"))
    val got = graft.operators.Sessionize.stickiness(ev, 28)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 2L, 1.0)),
      "2024-01-31" -> ((1L, 1L, 1.0))))
    // overlap case: u3 on days 0 and 10 — at day 10 MAU must count
    // u3 ONCE (disjoint-interval property), u4 still covered from day 0
    val ev2 = Seq(
      (3L, "2024-01-01 10:00:00"), (4L, "2024-01-01 11:00:00"),
      (3L, "2024-01-11 09:00:00")
    ).toDF("user_id", "s").select(col("user_id"),
      col("s").cast("timestamp").as("ts"))
    val got2 = graft.operators.Sessionize.stickiness(ev2, 28)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2 === Map(
      "2024-01-01" -> ((2L, 2L)),
      "2024-01-11" -> ((1L, 2L))))
  }

  test("tr05 degreeAssortativity: star graph is exactly -1; regular graph is NULL") {
    import spark.implicits._
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("id_a", "id_b")
    val r = graft.operators.Graph.degreeAssortativity(star).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((3L, 3L, -1.0)))
    // triangle: every endpoint degree 2 -> zero variance -> NULL (the
    // documented degenerate case: 0/0 gated by try_divide under ANSI)
    val ring = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val r2 = graft.operators.Graph.degreeAssortativity(ring).collect()(0)
    assert(r2.getLong(0) === 3L && r2.isNullAt(2))
  }

  test("ts14 timeWeightedAvg: duration-weighted, last point excluded, burst-proof") {
    import spark.implicits._
    // key a: v=10 for 1000ns then terminal 99 (no duration -> excluded)
    // key b: v=1 for 100ns, v=3 for 300ns -> (100 + 900)/400 = 2.5;
    //        a count-weighted avg would say 2.0
    val ev = Seq(
      ("a", 0L, 1L, 10.0), ("a", 1000L, 2L, 99.0),
      ("b", 0L, 3L, 1.0), ("b", 100L, 4L, 3.0), ("b", 400L, 5L, 7.0)
    ).toDF("event_type", "ts_ns", "event_id", "value")
    val got = graft.operators.Timeseries.timeWeightedAvg(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map("a" -> ((1L, 1000L, 10.0)),
      "b" -> ((2L, 400L, 2.5))))
  }

  test("d26 containmentJoin: one-directional subsumption; jaccard-low pair still caught") {
    import spark.implicits._
    // B extends A by two words: every A-shingle is in B (C(A->B)=1)
    // but C(B->A)=6/8 < 4/5 — only the (A,B) direction qualifies.
    // Jaccard(A,B) = 6/8 = 0.75 < 0.8 would MISS this pair in d25.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (3L, "x1 x2 x3 x4 x5")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentJoin(docs, 4L, 5L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got === Map((1L, 2L) -> ((6L, 6L, 8L, 1.0))))
  }

  test("wh06 fifoCogs: closed form equals the explicit layer-queue fold") {
    import spark.implicits._
    // part 1: layers (10 @ 1000c) then (5 @ 600c); issues 12 ->
    // queue fold consumes 10 (full 1000c) + 2 of 5 (600*2/5 = 240c)
    // part 2: layers (4 @ 400c); issues 9 -> consumed 4, unfilled 5
    // part 3: layer (7 @ 700c); no issues -> consumed 0, cogs 0
    val layers = Seq(
      (1L, 1L, 0L, 0L, 10L, 1000L), (1L, 2L, 0L, 0L, 5L, 600L),
      (2L, 1L, 0L, 0L, 4L, 400L), (3L, 1L, 0L, 0L, 7L, 700L)
    ).toDF("l_partkey", "o1", "o2", "o3", "qty", "cents")
    val issues = Seq((1L, 12L), (2L, 9L)).toDF("l_partkey", "issued")
    val got = graft.operators.Warehouse.fifoCogs(layers, issues)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(7)))).toMap
    assert(got === Map(
      1L -> ((2L, 15L, 12L, 12L, 1240L, 0L)),
      2L -> ((1L, 4L, 9L, 4L, 400L, 5L)),
      3L -> ((1L, 7L, 0L, 0L, 0L, 0L))))
  }

  test("ix05 proximitySearch: window boundary inclusive, pair fan-out is tf x tf") {
    import spark.implicits._
    // doc 1: gap exactly 4 (inclusive hit); doc 2: gap 5 (miss at
    // w=4); doc 3: two 'hash' near one 'merge' -> 2 pairs, min_gap 1
    val docs = Seq(
      (1L, "hash a b c merge"),
      (2L, "hash a b c d merge"),
      (3L, "hash merge hash z")
    ).toDF("doc_id", "text")
    val got = graft.operators.Search.proximitySearch(
      graft.operators.Search.postings(docs), "hash", "merge", 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((1L, 4L)), 3L -> ((2L, 1L))))
  }

  test("ts15 holtFixedPoint: hand-folded level/trend registers on a linear ramp") {
    import spark.implicits._
    val day = 86400L * 1000L * 1000L * 1000L
    // cents 100, 200, 300:
    //   rn1: l=100, b=0
    //   rn2: l=(200+4*100)/5=120, b=((120-100)+0)/5=4
    //   rn3: l=(300+4*124)/5=159, b=((159-120)+16)/5=11 -> forecast 1.7
    val ev = Seq(("x", 0L, 1.0), ("x", day, 2.0), ("x", 2 * day, 3.0))
      .toDF("event_type", "ts_ns", "value")
    val got = graft.operators.Timeseries.holtFixedPoint(ev, day, 5L, 5L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map(
      0L -> ((100L, 100L, 0L, 1.0)),
      1L -> ((200L, 120L, 4L, 1.24)),
      2L -> ((300L, 159L, 11L, 1.7))))
  }

  test("s17 mmrRerank: redundancy penalty evicts the duplicate a plain top-k keeps") {
    import spark.implicits._
    // vec 1 and vec 2 are IDENTICAL (sim 1.0, both simq 0.8); vec 3
    // is orthogonal to them with simq 0.6. Plain top-2 = {1, 2};
    // MMR round 2 scores the duplicate (7*0.8 - 3*1.0)/10 = 0.26 vs
    // the diverse (7*0.6 - 3*0.0)/10 = 0.42 -> {1, 3}
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.0f)),
      (3L, Array(0.6f, -0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.mmrRerank(emb, 0L, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 1L, 0.56), (2L, 3L, 0.42)))
  }

  test("wh05 clampedRunningBalance: clamp at zero is order-dependent, shortfall exact") {
    import spark.implicits._
    // key a: +5, -8 (clamp: short 3, bal 0), +2 -> bal 2 — a plain
    // prefix sum would report -1; key b starts with unfillable demand
    val moves = Seq(
      (1L, 1L, 0L, 0L, 5L), (1L, 2L, 0L, 0L, -8L), (1L, 3L, 0L, 0L, 2L),
      (2L, 1L, 0L, 0L, -4L), (2L, 2L, 0L, 0L, 1L)
    ).toDF("k", "o1", "o2", "o3", "delta")
    val got = graft.operators.Warehouse.clampedRunningBalance(moves)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 2L, 3L)),
      2L -> ((2L, 1L, 4L))))
  }

  test("hc01 harmonicCentrality: path-graph inverse-distance sums; hop cap honored") {
    import spark.implicits._
    // path 1-2-3-4, seeds {1,4}: H(2)=1/1+1/2=1.5, H(3)=1/2+1/1=1.5,
    // H(1)=1/3 (from seed 4; own seed contributes 0), H(4) symmetric.
    // 1/3 is the INTEGER floor(1e9/3)/1e9 = 0.333333333
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 4L).toDF("id")
    val got = graft.operators.Graph.harmonicCentrality(path, seeds, 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> ((1L, 0.333333333)), 2L -> ((2L, 1.5)),
      3L -> ((2L, 1.5)), 4L -> ((1L, 0.333333333))))
    // hop cap: from seed 1 with maxHops=1 only node 2 is scored
    val capped = graft.operators.Graph
      .harmonicCentrality(path, Seq(1L).toDF("id"), 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(capped === Map(2L -> 1.0))
  }

  test("ss12 engagementHistogram: trailing-7d active-day counts bucket correctly") {
    import spark.implicits._
    // u1 active days 1,2,3 -> l=1,2,3; u2 active day 1 and day 9
    // (gap > 6 -> day-9 window holds only day 9 -> l=1)
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-03 10:00:00"), (1L, "2024-01-03 12:00:00"),
      (2L, "2024-01-01 11:00:00"), (2L, "2024-01-09 09:00:00")
    ).toDF("user_id", "s").select(col("user_id"),
      col("s").cast("timestamp").as("ts"))
    val got = graft.operators.Sessionize.engagementHistogram(ev, 7)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got === Map(
      ("2024-01-01", 1L) -> 2L,   // u1 and u2 both first-day
      ("2024-01-02", 2L) -> 1L,
      ("2024-01-03", 3L) -> 1L,
      ("2024-01-09", 1L) -> 1L))  // u2's day-1 presence expired
  }

  test("t26 stratifiedSample: largest-remainder allocation is exact and capped") {
    import spark.implicits._
    // strata: a=5 docs, b=3, c=2 (N=10), k=6 -> exact shares 3.0/1.8/1.2
    // floors 3/1/1 (sum 5), one leftover -> largest remainder is b (.8)
    // -> alloc a=3, b=2, c=1; sum = 6 exactly
    val docs = (1L to 5L).map(i => (i, "a")) ++
      (6L to 8L).map(i => (i, "b")) ++ (9L to 10L).map(i => (i, "c"))
    val df = docs.toDF("doc_id", "lang")
    val got = graft.operators.TextOps.stratifiedSample(df, 6L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val byStratum = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byStratum === Map("a" -> 3, "b" -> 2, "c" -> 1))
    assert(got.length === 6)
    // ranks within each stratum are exactly 1..alloc (offset math holds)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }
}
