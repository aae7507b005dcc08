package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DecodedRow, MediaCodec, MediaRow, Multimodal, TextOps}

/** The tokenizer/codec injection seams: a real BPE or media codec
  * drops in behind a trait whose open() runs once per partition —
  * these tests prove the plumbing (per-partition init count, schema,
  * parity with the default path) with fake implementations.
  */
class PipelineSeamsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  test("Tokenizer seam: injected tokenizer runs via mapPartitions, one open per partition") {
    val opens = spark.sparkContext.longAccumulator("tok_opens")
    val wsTok = new TextOps.Tokenizer {
      def open(): String => Long = {
        opens.add(1L) // stands in for loading merges/vocab
        s => s.split("\\s+").count(_.nonEmpty).toLong
      }
    }
    val docs = graft.sources.Tables.documents(spark, sf).repartition(4)
    val got = TextOps.tokenCounts(docs, wsTok)
    assert(got.columns.toSeq === Seq("doc_id", "n_tokens"))
    val sample = got.orderBy("doc_id").limit(3).collect()
    val expect = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("bigint").as("n"))
      .orderBy("doc_id").limit(3).collect()
    assert(sample.map(_.getLong(1)).toSeq === expect.map(_.getLong(1)).toSeq)
    assert(opens.value === 4L, s"expected one open() per partition, got ${opens.value}")
  }

  test("Embedder seam: one open per partition, unit-norm vectors, deterministic kernel") {
    val opens = spark.sparkContext.longAccumulator("emb_opens")
    val counted = new TextOps.Embedder {
      val dim = 64
      def open(): String => Array[Float] = {
        opens.add(1L) // stands in for loading model weights
        TextOps.HashedBowEmbedder(dim).open()
      }
    }
    val docs = graft.sources.Tables.documents(spark, sf).repartition(4)
    val emb = TextOps.embedDocuments(docs, counted)
    assert(emb.columns.toSeq === Seq("doc_id", "embedding"))
    val rows = emb.collect()
    assert(rows.length === docs.count())
    assert(opens.value === 4L, s"expected one open() per partition, got ${opens.value}")
    // non-empty docs embed to unit L2 norm (the kernel normalizes)
    val norms = rows.map(_.getSeq[Float](1))
      .filter(_.exists(_ != 0f))
      .map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    assert(norms.nonEmpty && norms.forall(n => math.abs(n - 1.0) < 1e-4))
    // deterministic: a second pass produces identical floats
    val again = TextOps.embedDocuments(docs, counted).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getSeq[Float](1)))
  }

  test("Embedder seam: output chains into the ANN stack (s07 pqQuantize, s01 cosineTopK)") {
    import graft.operators.Similarity
    val docs = graft.sources.Tables.documents(spark, sf)
      .repartition(spark.sparkContext.defaultParallelism)
    val emb = TextOps.embedDocuments(docs)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val n = emb.count()
    // s07's quantizer consumes the seam's output directly: one code
    // row per vector, reconstruction error finite
    val pq = Similarity.pqQuantize(emb, 8, 16).collect()
    assert(pq.length === n)
    assert(pq.forall(r => r.getDouble(2) >= 0.0))
    // s01's exact search over the seam's vectors: a doc's own text is
    // its nearest neighbor's query — top-k is sane and self-excluded
    val top = Similarity.cosineTopK(emb, 0L, 5).collect()
    assert(top.length === 5 && top.forall(_.getLong(0) != 0L))
    assert(top.map(_.getDouble(1)).toSeq === top.map(_.getDouble(1)).toSeq.sorted.reverse)
  }

  test("Reranker seam: one open per partition, injected scorer replaces the F1 kernel") {
    val opens = spark.sparkContext.longAccumulator("rr_opens")
    val constRr = new TextOps.Reranker {
      def open(): (String, String) => Double = {
        opens.add(1L) // stands in for loading the cross-encoder
        (_, _) => 0.25
      }
    }
    import spark.implicits._
    val shortlist = Seq(
      (0L, "a b c", 1L, "a b d"), (0L, "a b c", 2L, "x y"),
      (1L, "p q", 3L, "p q"), (1L, "p q", 4L, ""))
      .toDF("query_id", "qtext", "doc_id", "dtext").repartition(3)
    // injected scorer wins, one open per partition
    val flat = TextOps.rerankBatch(shortlist, constRr).collect()
    assert(flat.length === 4 && flat.forall(_.getDouble(2) === 0.25))
    assert(opens.value === 3L, s"expected one open() per partition, got ${opens.value}")
    // reference kernel: F1 = 2|q∩d| / (|d|+|q|) over distinct words
    val f1 = TextOps.rerankBatch(shortlist).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(f1((0L, 1L)) === 2.0 * 2 / (3 + 3)) // {a,b} of {a,b,c}/{a,b,d}
    assert(f1((0L, 2L)) === 0.0)
    assert(f1((1L, 3L)) === 1.0) // identical sets
    assert(f1((1L, 4L)) === 0.0) // empty doc side
  }

  test("Tokenizer seam: default regex tokenizer plans as a codegen column (no lambda)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val plan = TextOps.tokenCounts(docs).queryExecution.optimizedPlan.toString
    // regexp_count rewrites to size(regexp_extract_all(..)) in Catalyst
    assert(plan.contains("regexp_count") || plan.contains("regexp_extract_all"),
      plan.take(2000))
    assert(!plan.contains("MapPartitions"), plan.take(2000))
  }

  test("Tokenizer seam: injected counter agrees with the default on the same pattern") {
    val reTok = new TextOps.Tokenizer {
      def open(): String => Long = {
        val p = java.util.regex.Pattern.compile(TextOps.RegexTokenizer.pattern)
        s => { val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n }
      }
    }
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = TextOps.tokenCounts(docs).orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val b = TextOps.tokenCounts(docs, reTok).orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }

  test("Bpe.train: greedy most-frequent pair, deterministic, stops when no pair repeats") {
    // (a,b) occurs 2*2+3=7 times, (b,a) 2 — so (a,b) merges first;
    // then (ab,ab) occurs twice in 'abab'; then nothing repeats.
    val merges = TextOps.Bpe.train(Seq("abab" -> 2L, "ab" -> 3L), 10)
    assert(merges === Vector(("a", "b"), ("ab", "ab")))
    assert(merges === TextOps.Bpe.train(Seq("ab" -> 3L, "abab" -> 2L), 10))
  }

  test("Bpe.encodeTokens: left-to-right non-overlapping, merges in rank order only") {
    import TextOps.Bpe.encodeTokens
    assert(encodeTokens("lllll", Seq(("l", "l"))) === Vector("ll", "ll", "l"))
    assert(encodeTokens("abcabc", Seq(("a", "b"), ("ab", "c"))) ===
      Vector("abc", "abc"))
    // a later merge creating an earlier pair must NOT re-trigger it
    // (rank-order single pass — the oracle replace() chain's semantics)
    assert(encodeTokens("aab", Seq(("a", "b"), ("a", "ab"))) ===
      Vector("aab"))
    assert(encodeTokens("aab", Seq(("a", "ab"), ("a", "b"))) ===
      Vector("a", "ab"))
  }

  test("Bpe.Tok: committed merge table loads and counts = sum of per-word encodings") {
    val merges = TextOps.Bpe.loadMerges()
    assert(merges.nonEmpty && merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
    val count = TextOps.Bpe.Tok.open()
    assert(count("") === 0L)
    assert(count("   ") === 0L)
    val byHand = TextOps.Bpe.encodeTokens("the", merges).length +
      TextOps.Bpe.encodeTokens("merchant", merges).length
    assert(count("the  merchant") === byHand.toLong)
  }

  test("chunkByTokens: budget, greedy maximality, minimal overlap, coverage") {
    val maxT = 64; val ovl = 16
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(60)
    val chunks = TextOps.chunkByTokens(docs, maxT, ovl)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val merges = TextOps.Bpe.loadMerges()
    def cost(w: String) = TextOps.Bpe.encodeTokens(w, merges).length.toLong
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, cs) =>
      val ws = texts(docId).split(" ").filter(_.nonEmpty)
      val costs = ws.map(cost)
      cs.zipWithIndex.foreach { case ((_, _, start, text, nw, nt), i) =>
        val b = start.toInt - 1; val e = b + nw.toInt - 1
        // the chunk really is those words, with the claimed token total
        assert(text === ws.slice(b, e + 1).mkString(" "))
        assert(nt === costs.slice(b, e + 1).sum)
        // budget holds unless a single word overflows it
        assert(nt <= maxT || nw === 1L, s"doc $docId chunk $i: $nt tokens in $nw words")
        if (i < cs.length - 1) {
          // greedy maximality: one more word would blow the budget
          assert(nt + costs(e + 1) > maxT, s"doc $docId chunk $i not maximal")
          val b2 = cs(i + 1)._3.toInt - 1
          // next start inside (b, e+1], overlap within budget, minimal
          assert(b2 > b && b2 <= e + 1)
          assert(costs.slice(b2, e + 1).sum <= ovl)
          if (b2 - 1 > b)
            assert(costs.slice(b2 - 1, e + 1).sum > ovl,
              s"doc $docId chunk ${i + 1} start not minimal")
        } else assert(e === ws.length - 1, s"doc $docId: last chunk must end the doc")
      }
      assert(cs.head._3 === 1L)
    }
  }

  test("ImageIoCodec: real PNG bytes in, true bitstream dimensions out") {
    import graft.operators.{ImageIoCodec, PngGen}
    // PngGen emits genuine PNGs (magic bytes), and the codec's dims
    // come from ImageIO.read of the bitstream — not payload arithmetic
    val ids = Seq(0L, 3L, 57L, 123456L, 9999999L)
    ids.foreach { id =>
      val bytes = PngGen.png(id)
      assert((bytes.take(8).map(_ & 0xff) sameElements
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)), s"not a PNG for id $id")
      val decode = ImageIoCodec.open()
      val got = decode(MediaRow(id, bytes, "image"))
      val (w, h) = PngGen.dims(id)
      assert(got.width === w.toLong && got.height === h.toLong && got.n_frames === 1L)
    }
    // payload arithmetic must NOT predict the real dims (the decode
    // is doing real work, not length arithmetic on the bytes)
    val real = ImageIoCodec.open()(MediaRow(3L, PngGen.png(3L), "image"))
    val n = PngGen.png(3L).length.toLong
    assert((real.width != 64L + n % 577L) || (real.height != 64L + (n * 31L) % 331L))
  }

  test("AviGen + AviParse: real RIFF/AVI container in, true header + frame rasters out") {
    import graft.operators.{AviGen, AviParse}
    val ids = Seq(2L, 5L, 8L, 1234565L)
    ids.foreach { id =>
      val bytes = AviGen.avi(id)
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF", s"not RIFF for id $id")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "AVI ", s"not AVI for id $id")
      val m = AviParse.meta(bytes)
      val (w, h) = AviGen.dims(id)
      assert(m.width === w && m.height === h, s"dims, doc $id")
      assert(m.nFrames === AviGen.frames(id), s"frame count, doc $id")
      // round-trip every sampled frame's raster: parse-side channel
      // sums equal the generator formula's (proves idx1 offsets, the
      // bottom-up row order, and the 4-byte row padding are all read
      // correctly out of the real chunk bytes)
      (0 until m.nFrames).foreach { f =>
        var (er, eg, eb) = (0L, 0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          val v = AviGen.pixel(id, f, x, y)
          er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
        }
        assert(AviParse.frameChannelSums(bytes, m, f) === ((er, eg, eb)),
          s"frame $f raster, doc $id")
      }
    }
    // corrupted container must fail loudly, not return header fiction:
    // clobber avih.dwTotalFrames (byte 48) so the three frame counts
    // (avih, strh, idx1) no longer agree
    val bad = AviGen.avi(2L).clone()
    bad(48) = (bad(48) ^ 0x7f).toByte
    intercept[IllegalArgumentException](AviParse.meta(bad))
  }

  test("AviParse.frameSad: lockstep raster diff equals the formula; grows with frame distance") {
    import graft.operators.{AviGen, AviParse}
    val id = 8L // 2 + 8 % 10 = 10 frames
    val bytes = AviGen.avi(id)
    val m = AviParse.meta(bytes)
    assert(m.nFrames >= 3)
    val (w, h) = AviGen.dims(id)
    def expected(f1: Int, f2: Int): (Long, Long, Long) = {
      var (dr, dg, db) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (a, b) = (AviGen.pixel(id, f1, x, y), AviGen.pixel(id, f2, x, y))
        dr += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff))
        dg += math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff))
        db += math.abs((a & 0xff) - (b & 0xff))
      }
      (dr, dg, db)
    }
    assert(AviParse.frameSad(bytes, m, 0, 1) === expected(0, 1))
    assert(AviParse.frameSad(bytes, m, 0, m.nFrames - 1) ===
      expected(0, m.nFrames - 1))
    // the scene-delta signal: a distant frame pair differs more than
    // an adjacent one (the generator varies smoothly in frame index)
    def tot(t: (Long, Long, Long)) = t._1 + t._2 + t._3
    assert(tot(AviParse.frameSad(bytes, m, 0, m.nFrames - 1)) >
      tot(AviParse.frameSad(bytes, m, 0, 1)))
    // self-SAD is exactly zero — the two walks read identical chunks
    assert(AviParse.frameSad(bytes, m, 1, 1) === ((0L, 0L, 0L)))
  }

  test("WavGen + JdkMediaCodec: real RIFF/WAVE bytes in, true header + sample data out") {
    import graft.operators.{JdkMediaCodec, WavGen}
    val ids = Seq(1L, 4L, 7L, 1234567L)
    ids.foreach { id =>
      val bytes = WavGen.wav(id)
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF", s"not RIFF for id $id")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE", s"not WAVE for id $id")
      val got = JdkMediaCodec.open()(MediaRow(id, bytes, "audio"))
      assert(got.width === WavGen.sampleRate(id).toLong, s"sample rate, doc $id")
      assert(got.height === WavGen.channels(id).toLong, s"channels, doc $id")
      assert(got.n_frames === WavGen.frames(id).toLong, s"frames, doc $id")
    }
    // round-trip the data chunk: decode-side abs-sum equals the
    // generator formula's (proves little-endian sample reassembly)
    val id = 7L
    val n = WavGen.frames(id) * WavGen.channels(id)
    val want = (0 until n).map(i => math.abs(WavGen.sample(id, i).toLong)).sum
    val row = Multimodal.audioStats(spark, sf)
      .filter(col("doc_id") === id).collect().head
    assert(row.getLong(3) === want)
  }

  test("m01 pipeline: image/audio/video rows all decode through real JDK parsers") {
    val out = Multimodal.decoded(spark, sf)
      .orderBy("doc_id").limit(9).collect()
    out.foreach { r =>
      val (id, mt, w, h) = (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      mt match {
        case "image" =>
          val (ew, eh) = graft.operators.PngGen.dims(id)
          assert(w === ew.toLong && h === eh.toLong, s"doc $id")
        case "audio" =>
          assert(w === graft.operators.WavGen.sampleRate(id).toLong &&
            h === graft.operators.WavGen.channels(id).toLong, s"doc $id")
        case _ =>
          val (ew, eh) = graft.operators.AviGen.dims(id)
          assert(w === ew.toLong && h === eh.toLong, s"doc $id")
          assert(r.getLong(4) === graft.operators.AviGen.frames(id).toLong, s"doc $id")
      }
    }
    assert(Seq("image", "audio", "video").forall(t => out.exists(_.getString(1) == t)))
  }

  test("MediaCodec seam: injected codec replaces the stub decode") {
    val opens = spark.sparkContext.longAccumulator("codec_opens")
    val fixed = new MediaCodec {
      def open(): MediaRow => DecodedRow = {
        opens.add(1L) // stands in for native library init
        m => DecodedRow(m.doc_id, m.media_type, 1920L, 1080L, 1L)
      }
    }
    val out = Multimodal.decoded(spark, sf, fixed)
    assert(out.columns.toSeq ===
      Seq("doc_id", "media_type", "width", "height", "n_frames"))
    val rows = out.limit(5).collect()
    assert(rows.forall(r => r.getLong(2) == 1920L && r.getLong(3) == 1080L))
    assert(opens.value >= 1L)
  }

  test("AviParse.frameDHash: every bit equals the generator-formula replay") {
    import graft.operators.{AviGen, AviParse}
    Seq(2L, 5L, 8L, 1234565L).foreach { id =>
      val bytes = AviGen.avi(id)
      val m = AviParse.meta(bytes)
      val (w, h) = AviGen.dims(id)
      (0 until m.nFrames).foreach { f =>
        def gray(gx: Int, gy: Int): Int = {
          val v = AviGen.pixel(id, f, gx, gy)
          ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
        }
        var (ehi, elo) = (0L, 0L)
        for (y <- 0 until 8; x <- 0 until 8) {
          if (gray((x + 1) * w / 9, y * h / 8) > gray(x * w / 9, y * h / 8)) {
            val k = y * 8 + x
            if (k < 32) elo |= 1L << k else ehi |= 1L << (k - 32)
          }
        }
        assert(AviParse.frameDHash(bytes, m, f) === ((ehi, elo)),
          s"frame $f dHash, doc $id")
      }
    }
  }

  test("audioFingerprint: Haitsma-Kalker bits equal the WavGen formula replay") {
    import graft.operators.WavGen
    // reference replay straight off the generator formula (never the
    // kernel's own decode path): 17x5 abs-energy grid, HK bit rule
    def expected(id: Long): (Long, Long) = {
      val n = WavGen.frames(id) * WavGen.channels(id)
      val e = Array.ofDim[Long](17, 5)
      (0 until n).foreach { i =>
        e((i.toLong * 17 / n).toInt)(i % 5) += math.abs(WavGen.sample(id, i).toLong)
      }
      var (hi, lo) = (0L, 0L)
      for (t <- 1 to 16; b <- 0 until 4) {
        if ((e(t)(b) - e(t)(b + 1)) - (e(t - 1)(b) - e(t - 1)(b + 1)) > 0) {
          val k = (t - 1) * 4 + b
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      }
      (hi, lo)
    }
    val got = Multimodal.audioFingerprint(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, fp) =>
      assert(fp === expected(id), s"fingerprint, doc $id")
    }
  }

  test("perceptual invariance: audio fingerprint survives phase inversion and WAV re-encode") {
    import graft.operators.WavGen
    Seq(1L, 4L, 7L, 1234567L).foreach { id =>
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(WavGen.wav(id))).readAllBytes()
      val fp = Multimodal.audioFpOfPcm(pcm)
      // phase inversion (sign flip) — the classic re-encode/DAC
      // artifact: |−s| = |s| for every sample (incl. −32768, whose
      // two's-complement negation is itself), so abs-energy grids and
      // therefore every HK bit are EXACTLY invariant
      val flipped = new Array[Byte](pcm.length)
      var i = 0
      while (i + 1 < pcm.length) {
        val v = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
        val f = (-v).toShort
        flipped(i) = (f & 0xff).toByte
        flipped(i + 1) = ((f >> 8) & 0xff).toByte
        i += 2
      }
      assert(Multimodal.audioFpOfPcm(flipped) === fp, s"phase inversion, doc $id")
      // lossless WAV re-encode roundtrip: a copy written by a
      // different serializer decodes to the same samples → same hash
      val fmt = new javax.sound.sampled.AudioFormat(
        WavGen.sampleRate(id).toFloat, 16, WavGen.channels(id), true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, WavGen.frames(id).toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      val pcm2 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(out.toByteArray)).readAllBytes()
      assert(Multimodal.audioFpOfPcm(pcm2) === fp, s"re-encode, doc $id")
    }
  }

  test("perceptual invariance: image dHash survives uniform brightness shift and PNG re-encode; 1px edit moves <= 2 bits") {
    def mk(w: Int, h: Int, px: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      img
    }
    // channels kept in [40, 200] so a +40 shift never clips
    def base(x: Int, y: Int): Int = {
      val r = 40 + (x * 31 + y * 7) % 161
      val g = 40 + (x * 13 + y * 17) % 161
      val b = 40 + (x * 5 + y * 23) % 161
      (r << 16) | (g << 8) | b
    }
    val (w, h) = (23, 17)
    val img = mk(w, h, base)
    val fp = Multimodal.dHashOf(img)
    // clip-free uniform brightness shift: every gray moves by 3*40,
    // every gray DIFFERENCE is unchanged → bit-identical hash
    val bright = mk(w, h, (x, y) => base(x, y) + 0x282828)
    assert(Multimodal.dHashOf(bright) === fp, "brightness shift")
    // lossless re-encode: PNG-roundtripped pixels hash identically
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val rt = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    assert(Multimodal.dHashOf(rt) === fp, "png roundtrip")
    // locality: editing ONE pixel perturbs at most the two grid
    // comparisons that sample it — hamming <= 2, the property the
    // m09/m11 hamming threshold rides on
    for (gx <- Seq(0, w / 2, w - 1); gy <- Seq(0, h - 1)) {
      val edited = mk(w, h, (x, y) =>
        if (x == gx && y == gy) 0xc8c8c8 else base(x, y))
      val (ehi, elo) = Multimodal.dHashOf(edited)
      val hd = java.lang.Long.bitCount(ehi ^ fp._1) +
        java.lang.Long.bitCount(elo ^ fp._2)
      assert(hd <= 2, s"1px edit at ($gx,$gy) moved $hd bits")
    }
  }

  test("m11/m12 near-dup: blocked pairs equal the exhaustive all-pairs truth") {
    // audio: chunk-blocked hamming join vs naive all-pairs over the
    // collected fingerprints (the recall-1.0 claim, test-corpus-sized)
    val fps = Multimodal.audioFingerprint(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naiveAudio = (for {
      (a, ahi, alo) <- fps; (b, bhi, blo) <- fps if a < b
      hd = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if hd <= 2
    } yield (a, b, hd.toLong)).toSet
    val gotAudio = Multimodal.audioNearDup(spark, sf, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotAudio === naiveAudio)
    // video: frame-hash-banded overlap join vs naive set intersection
    val sigs = Multimodal.videoFrameHashes(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(2), r.getLong(3))).toSet
      }
    val ids = sigs.keys.toSeq.sorted
    val naiveVideo = (for {
      a <- ids; b <- ids if a < b
      sh = (sigs(a) & sigs(b)).size if sh >= 3
    } yield (a, b, sh.toLong)).toSet
    val gotVideo = Multimodal.videoNearDup(spark, sf, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotVideo === naiveVideo)
  }
}
