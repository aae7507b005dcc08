package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaDedup, Multimodal}

/** The perceptual fingerprint store (incremental media dedup) and the
  * chunk-blocked hamming join's completeness/valve guarantees, on
  * constructed fingerprints (no media decode — the store operates on
  * (doc_id, hash_hi, hash_lo) whatever modality produced them).
  */
class MediaDedupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  /** Sign-safe halves (m08's convention): hi/lo each in [0, 2^32). */
  private def fps(rows: (Long, (Long, Long))*) = {
    import spark.implicits._
    rows.map { case (id, (hi, lo)) => (id, hi, lo) }
      .toDF("doc_id", "hash_hi", "hash_lo")
  }

  private def flip(h: (Long, Long), bits: Int*): (Long, Long) =
    bits.foldLeft(h) { case ((hi, lo), k) =>
      if (k < 32) (hi, lo ^ (1L << k)) else (hi ^ (1L << (k - 32)), lo)
    }

  private val h1 = (0x9e3779b9L, 0x7f4a7c15L)
  private val h3 = (0x243f6a88L, 0x85a308d3L)

  private def dropStore(name: String): Unit =
    Seq("_fpblocks", "_fps", "_fpdial", "_tombstones", "_labels", "_remap")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  private def classify(name: String, batch: org.apache.spark.sql.DataFrame,
      maxHamming: Int) =
    MediaDedup.ingestFingerprintBatch(spark, name, batch, maxHamming)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("fingerprint store: classify via store equals truth; store side reads with zero exchange") {
    try {
      MediaDedup.writeFingerprintStore(spark, "fpstore",
        fps(1L -> h1, 3L -> h3), 6)
      val got = MediaDedup.fingerprintPairsAgainstStore(spark, "fpstore",
        fps(2L -> flip(h1, 5, 40), 5L -> flip(h3, 0, 1, 2, 3, 4, 5, 6, 7)), 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((2L, 1L, 2L))) // doc 5 is 8 bits from h3: out
      // the store side of the skey join must not shuffle — the
      // bucketed write WAS its exchange
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val bk = Multimodal.hammingBlockKeys(fps(9L -> flip(h1, 11)), 6)
          .select(xxhash64(col("j"), col("bk")).as("skey"), col("doc_id"))
        val j = bk.join(spark.table("fpstore_fpblocks"), "skey")
        j.collect()
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val storeSide = plan.linesIterator
          .dropWhile(!_.contains("SortMergeJoin")).drop(1)
          .filterNot(_.trim.startsWith(":")).mkString("\n")
        assert(storeSide.contains("Bucketed: true"), plan)
        assert(!storeSide.contains("Exchange"),
          s"store side must not re-shuffle:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally dropStore("fpstore")
  }

  test("fingerprint ingest: uniques append and chain; crash-replay is idempotent") {
    val hNew = (0x452821e6L, 0x38d01377L)
    try {
      MediaDedup.writeFingerprintStore(spark, "fpapp",
        fps(1L -> h1, 3L -> h3), 6)
      val n0 = spark.table("fpapp_fps").count()
      val batch = fps(10L -> hNew, 11L -> flip(h1, 17))
      val b1 = classify("fpapp", batch, 6)
      assert(b1(10L) === (("unique", -1L)))
      assert(b1(11L) === (("near", 1L)))
      assert(spark.table("fpapp_fps").count() === n0 + 1) // only the unique
      // batch 2 near-dups BATCH 1's unique — visible only via the append
      val b2 = classify("fpapp", fps(20L -> flip(hNew, 3, 44)), 6)
      assert(b2(20L) === (("near", 10L)))
      // crash-replay: batch 1's fps are IN the store; without the
      // self-match guard doc 10 would flip to ("near", 10)
      val retry = classify("fpapp", batch, 6)
      assert(retry === b1, s"retry must be idempotent: $retry vs $b1")
      // still just doc 10: the replayed unique must not land twice,
      // and "near" docs (11, 20) never enter the store
      assert(spark.table("fpapp_fps").count() === n0 + 1)
    } finally dropStore("fpapp")
  }

  test("fingerprint delete + compact: retired id stops matching, rows reclaimed, id stays dead") {
    import spark.implicits._
    try {
      MediaDedup.writeFingerprintStore(spark, "fpdel",
        fps(1L -> h1, 3L -> h3), 6)
      assert(classify("fpdel", fps(2L -> flip(h1, 9)), 6)(2L) === (("near", 1L)))
      MediaDedup.deleteFromFingerprintStore(spark, "fpdel",
        Seq(1L, 2L).toDF("doc_id"))
      // retired ids no longer match; 4 lands as a fresh unique
      assert(classify("fpdel", fps(4L -> flip(h1, 21)), 6)(4L) === (("unique", -1L)))
      val before = spark.table("fpdel_fps").as[(Long, Long, Long)]
        .collect().map(_._1).toSet
      // doc 2 classified "near" so never entered; 1 is lazily
      // deleted — still on disk until compaction
      assert(before === Set(1L, 3L, 4L))
      MediaDedup.compactFingerprintStore(spark, "fpdel")
      val after = spark.table("fpdel_fps").as[(Long, Long, Long)]
        .collect().map(_._1).toSet
      assert(after === Set(3L, 4L)) // reclaimed physically
      // suppression list: a crash-replayed batch cannot resurrect id 1
      val replay = classify("fpdel", fps(1L -> h1), 6)
      assert(replay(1L)._1 === "near") // matches 4 (2 bits away) ...
      assert(!spark.table("fpdel_fps").as[(Long, Long, Long)]
        .collect().map(_._1).contains(1L)) // ... but never re-enters
    } finally dropStore("fpdel")
  }

  test("fingerprint store dial: probing with the other scheme tier fails fast") {
    try {
      MediaDedup.writeFingerprintStore(spark, "fpdial", fps(1L -> h1), 6)
      val e = intercept[IllegalArgumentException] {
        MediaDedup.fingerprintPairsAgainstStore(spark, "fpdial",
          fps(2L -> flip(h1, 4)), 2)
      }
      assert(e.getMessage.contains("scheme"))
    } finally dropStore("fpdial")
  }

  test("blocking completeness: every <=h-flip copy shares a key with its base (both tiers)") {
    val rng = new scala.util.Random(42)
    def randHalf() = rng.nextLong() & 0xffffffffL
    val bases = (0L until 200L).map(i => i -> ((randHalf(), randHalf())))
    for ((tier, hmax) <- Seq(("pairs16", 6), ("chunks21", 2))) {
      val copies = bases.map { case (i, h) =>
        val bits = rng.shuffle((0 until 64).toList).take(hmax)
        (i + 1000L) -> flip(h, bits: _*)
      }
      val keys = Multimodal.hammingBlockKeys(fps((bases ++ copies): _*), hmax)
      val a = keys.filter(col("doc_id") < 1000)
        .select(col("doc_id").as("ida"), col("j"), col("bk"))
      val b = keys.filter(col("doc_id") >= 1000)
        .select((col("doc_id") - 1000L).as("ida"), col("j"), col("bk"))
      val found = a.join(b, Seq("ida", "j", "bk"))
        .select("ida").distinct().count()
      assert(found === bases.size.toLong,
        s"$tier: ${bases.size - found} of ${bases.size} <=$hmax-flip copies lost by blocking")
    }
  }

  test("streaming media dedup: batch 2 near-dups against batch 1's appended uniques; retry-idempotent sink layout") {
    import spark.implicits._
    import java.nio.file.Files
    val hNew = (0x452821e6L, 0x38d01377L)
    def addFile(src: java.nio.file.Path, name: String,
        rows: Seq[(Long, Long, Long)]): Unit = {
      val stage = Files.createTempDirectory("graft-mstream-stage")
      rows.toDF("doc_id", "hash_hi", "hash_lo")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, src.resolve(name))
    }
    def row(id: Long, h: (Long, Long)) = (id, h._1, h._2)
    MediaDedup.writeFingerprintStore(spark, "fpstream", fps(1L -> h1), 6)
    try {
      val src = Files.createTempDirectory("graft-mstream-src")
      val out = Files.createTempDirectory("graft-mstream-out").toString
      val ckpt = Files.createTempDirectory("graft-mstream-ckpt").toString
      // micro-batch 1: doc 10 brand new, doc 11 near-dups the corpus
      addFile(src, "b1.parquet", Seq(row(10L, hNew), row(11L, flip(h1, 7))))
      val stream = spark.readStream
        .schema("doc_id LONG, hash_hi LONG, hash_lo LONG")
        .parquet(src.toString)
      val q = graft.streaming.MediaDedupStream
        .start("fpstream", stream, 6, out, ckpt)
      try {
        q.processAllAvailable()
        // micro-batch 2: doc 20 near-dups BATCH 1's doc 10 — only
        // visible through the per-batch store append
        addFile(src, "b2.parquet", Seq(row(20L, flip(hNew, 2, 50))))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(out)
        .select(col("doc_id"), col("status"), col("match_id"),
          col("micro_batch").cast("long"))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got(10L) === (("unique", -1L, 0L)))
      assert(got(11L) === (("near", 1L, 0L)))
      assert(got(20L) === (("near", 10L, 1L)))
      val partDirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(partDirs.toSeq === Seq("micro_batch=0", "micro_batch=1"))
    } finally dropStore("fpstream")
  }

  test("labeled fingerprint ingest: attach joins existing cluster; a bridging batch doc merges clusters via remap only") {
    // hB is 10 bits from h1 (separate clusters at hamming <= 6); the
    // bridge x is 5 bits from EACH
    val x = flip(h1, 1, 8, 20, 33, 47)
    val hB = flip(x, 2, 9, 21, 34, 48)
    try {
      val corpus = fps(1L -> h1, 3L -> flip(h1, 11), 40L -> hB, 5L ->
        (0x13198a2eL, 0x03707344L))
      MediaDedup.writeFingerprintStore(spark, "fplbl", corpus, 6)
      MediaDedup.writeFingerprintLabelStore(spark, "fplbl", corpus, 6)
      // init truth: {1,3} cluster at root 1; 40 and 5 singletons
      val init = graft.operators.Dedup.clusterLabels(spark, "fplbl")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(init === Map(1L -> 1L, 3L -> 1L, 40L -> 40L, 5L -> 5L))
      // attach: near doc joins the existing cluster
      val a = MediaDedup.ingestFingerprintBatchLabeled(spark, "fplbl",
          fps(10L -> flip(h1, 2)), 6)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(a(10L) === (("near", 1L, 1L)))
      // bridge: doc 20 matches BOTH clusters -> 40's cluster merges
      // into root 1 by a remap row, labels never rewritten
      val b = MediaDedup.ingestFingerprintBatchLabeled(spark, "fplbl",
          fps(20L -> x), 6)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(b(20L)._1 === "near")
      assert(b(20L)._3 === 1L)
      val after = graft.operators.Dedup.clusterLabels(spark, "fplbl")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after(40L) === 1L, s"bridged cluster must resolve to 1: $after")
      assert(after(20L) === 1L && after(10L) === 1L)
      // replay idempotence: the merge already happened, edges vanish
      val replay = MediaDedup.ingestFingerprintBatchLabeled(spark, "fplbl",
          fps(20L -> x), 6)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(replay === b, s"replay must be idempotent: $replay vs $b")
    } finally dropStore("fplbl")
  }

  test("streaming labeled media dedup: a batch-2 fingerprint joins the cluster a batch-1 doc founded") {
    import spark.implicits._
    import java.nio.file.Files
    val hNew = (0x452821e6L, 0x38d01377L)
    def addFile(src: java.nio.file.Path, name: String,
        rows: Seq[(Long, Long, Long)]): Unit = {
      val stage = Files.createTempDirectory("graft-mlstream-stage")
      rows.toDF("doc_id", "hash_hi", "hash_lo")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, src.resolve(name))
    }
    val corpus = fps(1L -> h1)
    MediaDedup.writeFingerprintStore(spark, "fplstream", corpus, 6)
    MediaDedup.writeFingerprintLabelStore(spark, "fplstream", corpus, 6)
    try {
      val src = Files.createTempDirectory("graft-mlstream-src")
      val out = Files.createTempDirectory("graft-mlstream-out").toString
      val ckpt = Files.createTempDirectory("graft-mlstream-ckpt").toString
      // micro-batch 1: doc 10 unique — FOUNDS cluster 10
      addFile(src, "b1.parquet", Seq((10L, hNew._1, hNew._2)))
      val stream = spark.readStream
        .schema("doc_id LONG, hash_hi LONG, hash_lo LONG")
        .parquet(src.toString)
      val q = graft.streaming.MediaDedupStream
        .startLabeled("fplstream", stream, 6, out, ckpt)
      try {
        q.processAllAvailable()
        // micro-batch 2: doc 20 near-dups doc 10 — joins ITS cluster
        val h20 = flip(hNew, 2, 50)
        addFile(src, "b2.parquet", Seq((20L, h20._1, h20._2)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(out)
        .select(col("doc_id"), col("status"), col("match_id"),
          col("cluster_id"))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got(10L) === (("unique", -1L, 10L)))
      assert(got(20L) === (("near", 10L, 10L)))
    } finally dropStore("fplstream")
  }

  test("stop-frame valve: a planted common frame cannot quadratically pair the corpus") {
    import spark.implicits._
    // 100 videos: each has one UNIQUE frame + the SAME black frame;
    // two true copies additionally share 3 frames
    val black = (0L, 0L)
    val unique = (0L until 100L).map(i => (i, 0x10000L + i, 0x200L + i))
    val blackRows = (0L until 100L).map(i => (i, black._1, black._2))
    val shared = for (i <- Seq(7L, 8L); f <- 1 to 3)
      yield (i, 0xabcL + f, 0xdefL + f)
    val frames = (unique ++ blackRows ++ shared)
      .toDF("doc_id", "hash_hi", "hash_lo")
    // valved: only the true copy pair survives (black frame df=100 > 10)
    val valved = Multimodal.sharedFrameSig(frames, 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(valved.toSeq === Seq((7L, 8L, 3L)))
    // unvalved baseline: the black frame alone pairs ALL C(100,2) videos
    val unvalved = Multimodal.sharedFrameSig(frames, 1, maxDf = Int.MaxValue)
    assert(unvalved.count() === 100L * 99L / 2L)
  }
}
