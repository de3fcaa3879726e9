package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media content is an opaque `binary` column plus typed metadata —
  * the layout a 100 TB multimodal corpus uses (content in parquet binary
  * or object-store references, metadata queryable without touching
  * bytes). Decode / feature-extract / frame-sample run as partition-local
  * batch transforms (`Dataset.mapPartitions`, the JVM analogue of
  * `mapInPandas`): no shuffle, one decoder instantiation per partition,
  * vectorizable batch shape.
  *
  * NOTE: the actual codec kernels are STUBS (this container has no
  * image/audio libraries): [[decodeStub]] derives deterministic fake
  * dimensions/samples from the bytes. The Spark-side plumbing — schema,
  * partitioning, batch iteration, typed encoders — is real and tested;
  * swapping in a real decoder changes only the function body.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      source: String)
  case class DecodedRow(media_id: Long, kind: String, source: String,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Deterministic fake decode: dimensions/frame count derived from the
    * first content bytes; feature = 8-bin byte histogram (L1-normalized).
    * Replace with a real codec (JNI/FFI) without touching callers. */
  def decodeStub(r: MediaRow): DecodedRow = {
    val b = r.content
    val w = if (b.length > 0) 16 + (b(0) & 0x3f) else 0
    val h = if (b.length > 1) 16 + (b(1) & 0x3f) else 0
    val frames = r.kind match {
      case "video" => 1 + b.length / 64
      case "audio" => 1 + b.length / 16
      case _       => 1
    }
    val hist = new Array[Float](8)
    var i = 0
    while (i < b.length) { hist((b(i) & 0xff) >> 5) += 1f; i += 1 }
    val total = math.max(b.length, 1).toFloat
    var j = 0
    while (j < 8) { hist(j) /= total; j += 1 }
    DecodedRow(r.media_id, r.kind, r.source, w, h, frames, hist)
  }

  /** Decode a media dataset partition-by-partition. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Sample every `stride`-th frame of video rows (stub: frames are
    * 64-byte windows of the content). Non-video rows pass through with a
    * single pseudo-frame. */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind == "video") {
        val n = 1 + r.content.length / 64
        (0 until n by stride).map(f => (r.media_id, f,
          java.util.Arrays.copyOfRange(r.content, f * 64, math.min((f + 1) * 64, r.content.length))))
      } else {
        Seq((r.media_id, 0, r.content))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  case class ResizedRow(media_id: Long, kind: String, width: Int,
      height: Int, content: Array[Byte])

  /** Resize image rows to `(tw, th)` (stub: the fake pixel space is the
    * content bytes; resampling keeps a proportional byte subset —
    * deterministic, shape-correct). Non-image rows pass through
    * unchanged. Runs partition-local like [[decode]]. */
  def resize(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val d = decodeStub(r)
      if (r.kind == "image" && d.width > 0 && d.height > 0) {
        val ratio = math.min(1.0, (tw.toLong * th).toDouble / (d.width.toLong * d.height))
        val outLen = math.max(1, (r.content.length * ratio).toInt)
        val step = math.max(1, r.content.length / outLen)
        val out = Array.range(0, r.content.length, step).map(r.content(_))
        ResizedRow(r.media_id, r.kind, math.min(tw, d.width), math.min(th, d.height), out)
      } else ResizedRow(r.media_id, r.kind, d.width, d.height, r.content)
    })
  }

  /** Build a deterministic media corpus out of the documents table (the
    * container ships no binary fixtures): content = UTF-8 bytes of the
    * text, kind round-robins image/audio/video. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      col("source").as("source")).as[MediaRow]
  }
}
