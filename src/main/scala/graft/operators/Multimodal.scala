package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Input to the decode stage: opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

/** Output of the decode stage. */
case class DecodedRow(doc_id: Long, media_type: String,
    width: Long, height: Long, n_frames: Long)

/** Injection seam for a real media codec (libjpeg/ffmpeg/...):
  * `open()` runs ONCE PER PARTITION on the executor — do the
  * expensive library/native init there and return the per-row decode
  * function. Implementations must be Serializable (the instance ships
  * in the task closure; the opened state does not).
  */
trait MediaCodec extends Serializable {
  def open(): MediaRow => DecodedRow
}

/** STUB codec for formats whose decode libraries are absent in this
  * environment (audio/video): deterministic arithmetic on the payload.
  */
object StubCodec extends MediaCodec {
  def open(): MediaRow => DecodedRow = { m =>
    val n = m.payload.length.toLong
    DecodedRow(m.doc_id, m.media_type,
      width = 64L + n % 577L,
      height = 64L + (n * 31L) % 331L,
      n_frames = if (m.media_type == "video") 1L + n % 24L else 1L)
  }
}

/** REAL image decode through the seam: `javax.imageio` is pure JDK, so
  * image rows need no stub. Width/height come out of the actual PNG/
  * JPEG bitstream (`ImageIO.read`), not payload arithmetic; audio and
  * video rows (codecs genuinely absent here) fall back to [[StubCodec]].
  * open() is the once-per-partition init point: disable ImageIO's
  * temp-file cache (executors decode in memory, not on local disk).
  */
object ImageIoCodec extends MediaCodec {
  def open(): MediaRow => DecodedRow = {
    javax.imageio.ImageIO.setUseCache(false)
    val fallback = StubCodec.open()
    m =>
      if (m.media_type == "image") {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable image payload for doc ${m.doc_id}")
        DecodedRow(m.doc_id, m.media_type,
          img.getWidth.toLong, img.getHeight.toLong, 1L)
      } else fallback(m)
  }
}

/** REAL audio decode through the same seam: `javax.sound.sampled` is
  * pure JDK, so WAV/PCM rows need no stub either. The typed metadata
  * mapping for audio is documented on [[DecodedRow]]'s generic fields:
  * width = sample rate (Hz), height = channel count, n_frames = PCM
  * frame count — all read out of the actual RIFF/WAVE header by
  * `AudioSystem.getAudioInputStream`, not payload arithmetic. Video
  * rows (codecs genuinely absent in the JDK) fall back to [[StubCodec]].
  */
object JdkMediaCodec extends MediaCodec {
  def open(): MediaRow => DecodedRow = {
    val image = ImageIoCodec.open()
    val fallback = StubCodec.open()
    m =>
      m.media_type match {
        case "image" => image(m)
        case "audio" =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val fmt = ais.getFormat
          DecodedRow(m.doc_id, m.media_type,
            width = fmt.getSampleRate.toLong,
            height = fmt.getChannels.toLong,
            n_frames = ais.getFrameLength)
        case _ => fallback(m)
      }
  }
}

/** Deterministic tiny WAVs — REAL RIFF/WAVE bytes (encoded by the
  * JDK's AudioSystem) standing in for an ingest's audio column.
  * Sample rate, channel count, frame count, and every 16-bit PCM
  * sample derive from doc_id alone, so the SQL oracle knows the
  * decode truth without itself decoding.
  */
object WavGen {
  def sampleRate(docId: Long): Int = 8000 + (docId % 5).toInt * 1000
  def channels(docId: Long): Int = 1 + (docId % 2).toInt
  def frames(docId: Long): Int = 200 + (docId % 300).toInt
  /** i-th interleaved 16-bit sample; mirrors the oracle's formula. */
  def sample(docId: Long, i: Int): Int =
    ((i.toLong * 31L + docId * 7L) % 65536L - 32768L).toInt

  def wav(docId: Long): Array[Byte] = {
    val (sr, ch, fr) = (sampleRate(docId), channels(docId), frames(docId))
    val pcm = new Array[Byte](fr * ch * 2) // 16-bit little-endian signed
    var i = 0
    while (i < fr * ch) {
      val v = sample(docId, i)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, ch, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, fr.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}

/** Deterministic tiny PNGs — REAL image bytes (encoded by the JDK's
  * ImageIO) standing in for an ingest's image column. Dimensions and
  * pixel content derive from doc_id alone, so the SQL oracle knows the
  * decode truth without itself decoding: a hash match proves the codec
  * read the true dimensions out of the bitstream.
  */
object PngGen {
  def dims(docId: Long): (Int, Int) =
    (8 + (docId % 57).toInt, 8 + ((docId * 31L) % 41).toInt)

  def png(docId: Long): Array[Byte] = {
    val (w, h) = dims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 7 + (docId % 251).toInt * 13) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** Multimodal column pipeline: media as opaque binary columns with
  * typed metadata, decoded per-partition through a typed Dataset.
  *
  * Image rows carry REAL PNG bytes ([[PngGen]]) decoded by ImageIO;
  * audio rows carry REAL WAV bytes ([[WavGen]]) decoded by
  * javax.sound — both pure-JDK kernels behind [[JdkMediaCodec]].
  * Only video rows keep the declared [[StubCodec]] (no video codec in
  * the JDK). Everything else is
  * the real 100 TB plumbing: binary column, case-class Encoders,
  * mapPartitions batch iteration (one decoder init per partition, not
  * per row), zero shuffles end to end, and a columnar result that
  * downstream queries can aggregate.
  */
object Multimodal {
  type QFn = (SparkSession, String) => DataFrame

  /** The ingest stand-in: one MediaRow per document — image rows get
    * real PNG payloads, audio rows real WAV payloads, video rows the
    * raw text bytes. A narrow typed map (media synthesis is per-row
    * imperative work, same shape a real ingest's fetch/transcode
    * stage has).
    */
  def mediaFrames(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d).select(
      col("doc_id"), col("text"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, mt) =>
        MediaRow(id, mt match {
          case "image" => PngGen.png(id)
          case "audio" => WavGen.wav(id)
          case _       => text.getBytes("UTF-8")
        }, mt)
      })
  }

  /** The decode pipeline as a reusable stage: binary payload + typed
    * metadata through case-class Encoders and mapPartitions.
    */
  def decoded(s: SparkSession, d: String,
      codec: MediaCodec = JdkMediaCodec): DataFrame =
    mediaFrames(s, d)
      .mapPartitions { it =>
        val decode = codec.open() // codec/library init, once per partition
        it.map(decode)
      }(org.apache.spark.sql.Encoders.product[DecodedRow])
      .toDF()

  /** Per-image channel statistics computed from the DECODED RASTER —
    * the feature-extraction stage of a multimodal pipeline, and the
    * proof the codec reads actual pixels (not just the header): exact
    * BIGINT channel sums over every pixel, which the oracle replays
    * from the generator's pixel formula. Integer sums, not float
    * means, so parity is exact at any image size. Zero shuffles; the
    * raster scan rides the same one-init-per-partition seam.
    */
  def imageStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaFrames(s, d)
      .filter(_.media_type == "image")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { m =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          require(img != null, s"undecodable image payload for doc ${m.doc_id}")
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = img.getRGB(x, y)
              sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
              x += 1
            }
            y += 1
          }
          (m.doc_id, img.getWidth.toLong * img.getHeight, sr, sg, sb)
        }
      }
      .toDF("doc_id", "n_pixels", "sum_r", "sum_g", "sum_b")
  }

  /** Sample-level audio feature extraction: exact abs-sum over every
    * decoded 16-bit PCM sample — the audio analogue of [[imageStats]],
    * and the proof the codec reads actual samples out of the WAV data
    * chunk (little-endian reassembly included), not just the header.
    * The oracle replays [[WavGen]]'s sample formula per index.
    */
  def audioStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaFrames(s, d)
      .filter(_.media_type == "audio")
      .mapPartitions { it =>
        it.map { m =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          var (i, sumAbs) = (0, 0L)
          while (i + 1 < bytes.length) {
            val v = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
            sumAbs += math.abs(v)
            i += 2
          }
          (m.doc_id, fmt.getSampleRate.toLong, bytes.length.toLong / 2, sumAbs)
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "sum_abs")
  }

  /** Image resize over the decode stage — the remaining multimodal
    * verb (decode / feature-extract / frame-sample / RESIZE): real
    * ImageIO decode, then an explicit nearest-neighbor 2× downsample
    * (out(x,y) = in(2x,2y), dims ⌈w/2⌉×⌈h/2⌉ — a pixel loop rather
    * than Graphics2D so the arithmetic is exact and the oracle can
    * replay the generator's pixel formula at the even coordinates).
    * Channel sums of the RESIZED raster prove the kernel sampled the
    * decoded pixels it claims. Same zero-shuffle partition-local seam
    * as [[imageStats]].
    */
  def imageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaFrames(s, d)
      .filter(_.media_type == "image")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { m =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          require(img != null, s"undecodable image payload for doc ${m.doc_id}")
          val (w2, h2) = ((img.getWidth + 1) / 2, (img.getHeight + 1) / 2)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              val v = img.getRGB(2 * x, 2 * y)
              sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
              x += 1
            }
            y += 1
          }
          (m.doc_id, w2.toLong, h2.toLong, sr, sg, sb)
        }
      }
      .toDF("doc_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b")
  }

  /** Frame sampling over the decode stage — the video half of the
    * multimodal pipeline plumbing: every `stride`-th frame of each
    * video becomes a row (the shape a caption/embedding stage
    * consumes). The frame COUNT comes through the codec seam (the
    * declared video stub here; a real demuxer drops in via
    * [[MediaCodec]]); the per-frame feature is the stub's
    * deterministic arithmetic, replayed by the oracle. Explode of a
    * bounded sequence — no shuffle before the output sort.
    */
  def frameSample(s: SparkSession, d: String, stride: Int = 4): DataFrame =
    decoded(s, d).filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .withColumn("brightness",
        pmod(col("doc_id") * 31 + col("frame_idx") * 7, lit(256L)))
      .orderBy("doc_id", "frame_idx")

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // image dims are decoded from real PNG bitstreams, audio format
    // from real RIFF/WAVE headers; the oracle replays the PngGen /
    // WavGen parameter formulas (video stays on the declared stub
    // arithmetic over the payload = text bytes)
    ("m01_multimodal", (s: SparkSession, d: String) =>
      decoded(s, d).orderBy("doc_id"), Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 57
                  WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 1000
                  ELSE 64 + strlen(text) % 577 END AS BIGINT) AS width,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 31) % 41
                  WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2
                  ELSE 64 + (strlen(text) * 31) % 331 END AS BIGINT) AS height,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                  WHEN doc_id % 3 = 1 THEN 200 + doc_id % 300
                  ELSE 1 + strlen(text) % 24 END AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id""")),

    // downstream aggregation over the decoded stage (pipeline
    // composition: typed decode feeds a columnar rollup)
    ("m02_media_stats", (s: SparkSession, d: String) => {
      decoded(s, d).groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
          (sum(col("height")).cast("double") / count(lit(1))).as("avg_height"),
          sum(col("n_frames")).as("total_frames"))
        .orderBy("media_type")
    }, Some("""
      WITH dec AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
          CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 57
               WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 1000
               ELSE 64 + strlen(text) % 577 END AS width,
          CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 31) % 41
               WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2
               ELSE 64 + (strlen(text) * 31) % 331 END AS height,
          CASE WHEN doc_id % 3 = 0 THEN 1
               WHEN doc_id % 3 = 1 THEN 200 + doc_id % 300
               ELSE 1 + strlen(text) % 24 END AS n_frames
        FROM documents)
      SELECT media_type, count(*) AS n,
        CAST(sum(width) AS DOUBLE) / count(*) AS avg_width,
        CAST(sum(height) AS DOUBLE) / count(*) AS avg_height,
        CAST(sum(n_frames) AS BIGINT) AS total_frames
      FROM dec GROUP BY media_type ORDER BY media_type""")),

    // raster-level feature extraction: exact per-channel pixel sums
    // out of the decoded image. The oracle replays the generator's
    // pixel formula over every (x,y) — a hash match proves the codec
    // decoded the actual raster, not just the header
    ("m03_image_stats", (s: SparkSession, d: String) =>
      imageStats(s, d).orderBy("doc_id"), Some("""
      WITH img AS (
        SELECT doc_id, 8 + doc_id % 57 AS w, 8 + (doc_id * 31) % 41 AS h
        FROM documents WHERE doc_id % 3 = 0),
      px AS (
        SELECT doc_id, w, w * h AS n_pixels,
          unnest(generate_series(0, w * h - 1)) AS i
        FROM img),
      ch AS (
        SELECT doc_id, n_pixels,
          (((i % w) * 31 + (i // w) * 7 + (doc_id % 251) * 13) & 16777215) AS v
        FROM px)
      SELECT doc_id, CAST(n_pixels AS BIGINT) AS n_pixels,
        CAST(sum((v >> 16) & 255) AS BIGINT) AS sum_r,
        CAST(sum((v >> 8) & 255) AS BIGINT) AS sum_g,
        CAST(sum(v & 255) AS BIGINT) AS sum_b
      FROM ch GROUP BY doc_id, n_pixels ORDER BY doc_id""")),

    // sample-level audio feature extraction: exact abs-sum over the
    // decoded PCM. The oracle replays WavGen's per-index sample
    // formula — a hash match proves the codec decoded the actual
    // 16-bit little-endian data chunk, not just the WAV header
    ("m04_audio_stats", (s: SparkSession, d: String) =>
      audioStats(s, d).orderBy("doc_id"), Some("""
      WITH aud AS (
        SELECT doc_id, 8000 + (doc_id % 5) * 1000 AS sr,
          (1 + doc_id % 2) * (200 + doc_id % 300) AS n_samples
        FROM documents WHERE doc_id % 3 = 1),
      sm AS (
        SELECT doc_id, sr, n_samples,
          unnest(generate_series(0, n_samples - 1)) AS i
        FROM aud),
      v AS (
        SELECT doc_id, sr, n_samples,
          ((i * 31 + doc_id * 7) % 65536) - 32768 AS s
        FROM sm)
      SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate,
        CAST(n_samples AS BIGINT) AS n_samples,
        CAST(sum(abs(s)) AS BIGINT) AS sum_abs
      FROM v GROUP BY doc_id, sr, n_samples ORDER BY doc_id""")),

    // frame sampling over the decode stage: every 4th frame of each
    // video as a row. n_frames rides the codec seam (video stub);
    // the oracle replays the stub's frame count and per-frame feature
    ("m05_frame_sample", (s: SparkSession, d: String) =>
      frameSample(s, d, 4), Some("""
      WITH v AS (SELECT doc_id, 1 + strlen(text) % 24 AS nf
                 FROM documents WHERE doc_id % 3 = 2),
      f AS (SELECT doc_id, unnest(range(0, nf, 4)) AS frame_idx FROM v)
      SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        (doc_id * 31 + frame_idx * 7) % 256 AS brightness
      FROM f ORDER BY doc_id, frame_idx""")),

    // nearest-neighbor 2x downsample of the decoded raster: the
    // oracle replays the generator's pixel formula at the EVEN
    // (2x, 2y) coordinates only — a hash match proves the resize
    // kernel sampled exactly those decoded pixels
    ("m06_image_resize", (s: SparkSession, d: String) =>
      imageResize(s, d).orderBy("doc_id"), Some("""
      WITH img AS (
        SELECT doc_id, 8 + doc_id % 57 AS w, 8 + (doc_id * 31) % 41 AS h
        FROM documents WHERE doc_id % 3 = 0),
      dims AS (SELECT doc_id, w, (w + 1) // 2 AS w2, (h + 1) // 2 AS h2 FROM img),
      px AS (SELECT doc_id, w2, h2,
               unnest(generate_series(0, w2 * h2 - 1)) AS i
             FROM dims),
      ch AS (SELECT doc_id, w2, h2,
               (((2 * (i % w2)) * 31 + (2 * (i // w2)) * 7
                 + (doc_id % 251) * 13) & 16777215) AS v
             FROM px)
      SELECT doc_id, CAST(w2 AS BIGINT) AS out_w, CAST(h2 AS BIGINT) AS out_h,
        CAST(sum((v >> 16) & 255) AS BIGINT) AS sum_r,
        CAST(sum((v >> 8) & 255) AS BIGINT) AS sum_g,
        CAST(sum(v & 255) AS BIGINT) AS sum_b
      FROM ch GROUP BY doc_id, w2, h2 ORDER BY doc_id"""))
  )
}
