package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline. Media payloads ride as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / resize /
  * frame-sample run batched per partition.
  *
  * IMPORTANT — decode is STUBBED: this container has no image/audio
  * codecs, so `decodeStub` produces a deterministic fake feature
  * vector derived from the bytes (clearly marked below). Everything
  * AROUND the stub is real and tested: the schema, the binary-column
  * handling, the per-partition batching shape (mirroring a Pandas-UDF
  * `mapInPandas` batch contract), and the partition sizing, so a real
  * codec drops in by replacing ONE function.
  */
object Multimodal {

  /** Typed row: media id, kind (image|audio|video), payload, metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      width: Int, height: Int, sampleRate: Int, durationMs: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  /** Deterministic synthetic media table (for tests/bench): payload
    * bytes derived from the id — stands in for real blobs at the same
    * schema. */
  def syntheticMedia(spark: SparkSession, n: Long, payloadBytes: Int = 1024): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      val bytes = Array.tabulate[Byte](payloadBytes)(i =>
        ((id * 31 + i * 7 + (id >> 3)) & 0xff).toByte)
      MediaRow(id, kind, bytes, 64, 64, 16000, 1000)
    }
  }

  // ======================== STUB BOUNDARY =========================
  /** STUB: stand-in decoder. A real deployment replaces this body with
    * an actual codec (JPEG decode → pixels, PCM decode → samples, …).
    * The fake is deterministic in the payload so tests are stable:
    * 16 floats derived from a rolling hash of the bytes. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](16)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i & 15) += (h & 0xffff) / 65535.0f
      i += 1
    }
    out
  }
  // ======================= /STUB BOUNDARY =========================

  /** Batched per-partition feature extraction. The loop shape matches
    * a `mapInPandas` contract — consume a batch iterator, emit a batch
    * iterator — so the Spark-side plumbing (schema in/out, partition
    * sizing, no driver collect) is exactly what a Python-codec version
    * would use. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, decodeStub(r.bytes))
      }
    }
  }

  /** "Frame sampling" for video-kind rows: deterministic stride over
    * the payload, one pseudo-frame per `stride` bytes — real byte
    * slicing, stub semantics. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.bytes.grouped(stride).zipWithIndex.map { case (frame, idx) =>
        (r.media_id, idx, frame.length, decodeStub(frame))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes", "frame_features")
  }

  /** Media table derived from a text corpus: payload = the UTF-8 bytes
    * of the text column riding as an opaque `binary` column (exactly
    * how real blobs ride), kind round-robined by id. Exercises the
    * binary-column path end-to-end with content any SQL engine can
    * reproduce (text → blob cast), so the audit query is
    * oracle-checkable. */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("bytes"))

  /** Metadata + size audit as pure column ops (no decode): bytes
    * length, kind histogram-ready columns. */
  def audit(mediaDf: DataFrame): DataFrame =
    mediaDf.select(
      col("media_id"), col("kind"),
      length(col("bytes")).cast("long").as("n_bytes"),
      (length(col("bytes")) > 0).as("non_empty"))
}
