package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

/** Default STUB codec: deterministic arithmetic fake standing in for
  * a real decoder (image/audio libs are absent in this environment).
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

/** Multimodal column pipeline: media as opaque binary columns with
  * typed metadata, decoded per-partition through a typed Dataset.
  *
  * The decode kernel is the [[MediaCodec]] seam (default: the
  * declared [[StubCodec]]). Everything around it is the real 100 TB
  * plumbing: binary column in parquet, case-class Encoders,
  * mapPartitions batch iteration (one decoder init per partition, not
  * per row), and a columnar result that downstream queries can
  * aggregate.
  */
object Multimodal {
  type QFn = (SparkSession, String) => DataFrame

  /** The decode pipeline as a reusable stage: binary payload + typed
    * metadata through case-class Encoders and mapPartitions.
    */
  def decoded(s: SparkSession, d: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))
    media.as[MediaRow]
      .mapPartitions { it =>
        val decode = codec.open() // codec/library init, once per partition
        it.map(decode)
      }
      .toDF()
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    ("m01_multimodal", (s: SparkSession, d: String) =>
      decoded(s, d).orderBy("doc_id"), Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        CAST(64 + strlen(text) % 577 AS BIGINT) AS width,
        CAST(64 + (strlen(text) * 31) % 331 AS BIGINT) AS height,
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
          64 + strlen(text) % 577 AS width,
          64 + (strlen(text) * 31) % 331 AS height,
          CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 24 ELSE 1 END AS n_frames
        FROM documents)
      SELECT media_type, count(*) AS n,
        CAST(sum(width) AS DOUBLE) / count(*) AS avg_width,
        CAST(sum(height) AS DOUBLE) / count(*) AS avg_height,
        CAST(sum(n_frames) AS BIGINT) AS total_frames
      FROM dec GROUP BY media_type ORDER BY media_type"""))
  )
}
