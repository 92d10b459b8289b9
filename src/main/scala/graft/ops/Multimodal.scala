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

  /** Deterministic synthetic media table (for tests/bench). AUDIO rows
    * carry REAL RIFF/WAVE PCM16 payloads (samples derived from the
    * id), so the decode path below exercises an actual parser;
    * image/video rows stay opaque hash-derived blobs behind the
    * compressed-codec stub. */
  def syntheticMedia(spark: SparkSession, n: Long, payloadBytes: Int = 1024): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      if (kind == "audio") {
        val rate = 16000
        val frames = (200 + id % 100).toInt
        val samples = Array.tabulate[Short](frames)(i =>
          (((id * 31 + i * 7) % 4096) - 2048).toShort)
        MediaRow(id, kind, encodeWavPcm16(rate, samples), 0, 0, rate,
          (frames.toLong * 1000L / rate).toInt)
      } else {
        val bytes = Array.tabulate[Byte](payloadBytes)(i =>
          ((id * 31 + i * 7 + (id >> 3)) & 0xff).toByte)
        MediaRow(id, kind, bytes, 64, 64, 0, 1000)
      }
    }
  }

  // ------------------------------------------------------ WAV (REAL)
  // PCM/WAV needs no codec library — the container is pure byte
  // arithmetic (RIFF chunks + little-endian PCM16 frames), so the
  // audio decode path is REAL, not stubbed: header parse, chunk walk,
  // sample extraction, duration from frame count. Only compressed
  // formats (JPEG/MP3/H.264) remain behind the stub below.

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nFrames: Int, durationMs: Long, samples: Array[Short])

  /** Canonical 44-byte-header RIFF/WAVE with one PCM16 `data` chunk. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short], channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0, "partial frame")
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a PCM16 RIFF/WAVE payload: validates the RIFF/WAVE magic,
    * walks chunks (tolerates extras like LIST before data, and odd
    * chunk padding per spec), and extracts format + samples. Throws
    * IllegalArgumentException on anything that is not PCM16 WAV. */
  def decodeWavPcm16(bytes: Array[Byte]): WavInfo = {
    def fail(msg: String) = throw new IllegalArgumentException(s"not PCM16 WAV: $msg")
    if (bytes.length < 44) fail(s"only ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (fourCC(0) != "RIFF" || fourCC(8) != "WAVE") fail("bad RIFF/WAVE magic")

    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
      val id = fourCC(off)
      val len = bb.getInt(off + 4)
      if (len < 0 || off + 8 + len > bytes.length) fail(s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          if (len < 16) fail("fmt chunk too short")
          if (bb.getShort(off + 8) != 1) fail("not uncompressed PCM")
          channels = bb.getShort(off + 10)
          sampleRate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22)
          if (bits != 16) fail(s"$bits-bit PCM unsupported")
          if (channels <= 0 || sampleRate <= 0) fail("degenerate fmt")
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => () // skip LIST/fact/etc.
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (sampleRate == 0) fail("no fmt chunk")
    if (dataOff < 0) fail("no data chunk")
    if (dataLen % (2 * channels) != 0) fail("partial frame in data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    bb.position(dataOff)
    bb.asShortBuffer().get(samples, 0, n)
    val frames = n / channels
    WavInfo(sampleRate, channels, bits, frames,
      frames.toLong * 1000L / sampleRate, samples)
  }

  // ======================== STUB BOUNDARY =========================
  /** STUB: stand-in decoder for COMPRESSED formats only (JPEG →
    * pixels, H.264 → frames, …) — this container ships no codec
    * libraries. PCM/WAV audio is decoded for real above
    * (decodeWavPcm16). The fake is deterministic in the payload so
    * tests are stable: 16 floats derived from a rolling hash of the
    * bytes. */
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

  /** 16-bin mean-absolute-amplitude profile of decoded PCM samples —
    * real features from the real audio decode. */
  def audioFeatures(w: WavInfo): Array[Float] = {
    val out = new Array[Float](16)
    val n = w.samples.length
    if (n == 0) return out
    var i = 0
    while (i < n) {
      out(i * 16 / n) += math.abs(w.samples(i).toInt) / 32768.0f
      i += 1
    }
    var b = 0
    while (b < 16) { out(b) = out(b) * 16.0f / n; b += 1 }
    out
  }

  /** Batched per-partition feature extraction. The loop shape matches
    * a `mapInPandas` contract — consume a batch iterator, emit a batch
    * iterator — so the Spark-side plumbing (schema in/out, partition
    * sizing, no driver collect) is exactly what a Python-codec version
    * would use. Audio rows run the REAL WAV decode; other kinds fall
    * to the compressed-codec stub. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats =
          if (r.kind == "audio") audioFeatures(decodeWavPcm16(r.bytes))
          else decodeStub(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, feats)
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
