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
  * Image rows carry REAL PNG bytes (generated deterministically by
  * [[PngGen]] — the ingest stand-in) and are decoded by the REAL
  * [[ImageIoCodec]] kernel; audio/video rows keep the declared
  * [[StubCodec]] (their libraries are absent here). Everything else is
  * the real 100 TB plumbing: binary column, case-class Encoders,
  * mapPartitions batch iteration (one decoder init per partition, not
  * per row), zero shuffles end to end, and a columnar result that
  * downstream queries can aggregate.
  */
object Multimodal {
  type QFn = (SparkSession, String) => DataFrame

  /** The ingest stand-in: one MediaRow per document — image rows get
    * real PNG payloads, audio/video rows the raw text bytes. A narrow
    * typed map (media synthesis is per-row imperative work, same shape
    * a real ingest's fetch/transcode stage has).
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
        MediaRow(id,
          if (mt == "image") PngGen.png(id) else text.getBytes("UTF-8"), mt)
      })
  }

  /** The decode pipeline as a reusable stage: binary payload + typed
    * metadata through case-class Encoders and mapPartitions.
    */
  def decoded(s: SparkSession, d: String,
      codec: MediaCodec = ImageIoCodec): DataFrame =
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

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    // image dims are decoded from real PNG bitstreams; the oracle
    // replays PngGen's dimension formula (audio/video stay on the
    // declared stub arithmetic over the payload = text bytes)
    ("m01_multimodal", (s: SparkSession, d: String) =>
      decoded(s, d).orderBy("doc_id"), Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 57
                  ELSE 64 + strlen(text) % 577 END AS BIGINT) AS width,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 31) % 41
                  ELSE 64 + (strlen(text) * 31) % 331 END AS BIGINT) AS height,
        CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 24 ELSE 1 END AS BIGINT) AS n_frames
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
               ELSE 64 + strlen(text) % 577 END AS width,
          CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 31) % 41
               ELSE 64 + (strlen(text) * 31) % 331 END AS height,
          CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 24 ELSE 1 END AS n_frames
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
      FROM ch GROUP BY doc_id, n_pixels ORDER BY doc_id"""))
  )
}
