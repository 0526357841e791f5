package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed metadata parsed from a WAV payload's header bytes. */
final case class WavMeta(
    doc_id: Long,
    byte_len: Long,
    format: String,
    sample_rate: Option[Int],
    channels: Option[Int],
    bits_per_sample: Option[Int],
    duration_ms: Option[Long])

/** Codec-free WAV (RIFF) header parsing — the audio twin of
  * [[ImageHeaders]], using only the public RIFF/WAVE chunk layout
  * (Microsoft/IBM RIFF spec): `RIFF`[size]`WAVE`, then chunks of
  * [4-byte id][4-byte little-endian size][data]; the `fmt ` chunk carries
  * audio format, channel count, sample rate, byte rate, block align, and
  * bits per sample; `data`'s size with the byte rate gives the duration.
  * No audio library involved — this is fixed-offset integer decoding. */
object AudioHeaders {

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
  private def le32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFF).toLong | ((p(off + 1) & 0xFF).toLong << 8) |
      ((p(off + 2) & 0xFF).toLong << 16) | ((p(off + 3) & 0xFF).toLong << 24)
  private def tag(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")

  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      durationMs: Long)

  /** Walk the RIFF chunks for `fmt ` and `data`. Returns None for
    * non-WAV payloads or truncated/incoherent headers. */
  def parseWav(p: Array[Byte]): Option[Wav] = {
    if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE") return None
    var off = 12
    var rate = 0; var ch = 0; var bits = 0; var byteRate = 0L
    var dataSize = -1L
    while (off + 8 <= p.length) {
      val id = tag(p, off)
      val size = le32(p, off + 4)
      // a declared chunk size beyond the payload is corruption: stop the
      // walk rather than let the (unsigned) size wrap negative through
      // toInt and send the cursor backwards — a malformed payload must
      // parse to None, never throw or loop out of a task
      if (size < 0 || size > p.length.toLong) return None
      if (id == "fmt " && off + 24 <= p.length) {
        ch = le16(p, off + 10)
        rate = le32(p, off + 12).toInt
        byteRate = le32(p, off + 16)
        bits = le16(p, off + 22)
      } else if (id == "data") {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size.toInt + (size % 2).toInt
    }
    if (rate <= 0 || ch <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(Wav(rate, ch, bits, dataSize * 1000L / byteRate))
  }

  /** Minimal well-formed PCM WAV: 44-byte RIFF/fmt/data header plus
    * `nSamples` zeroed frames. */
  def synthWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * blockAlign) // byte rate
    out.putShort(blockAlign.toShort)
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    out.array()
  }

  /** PCM WAV carrying REAL 16-bit mono samples — the honest-codec
    * sibling of [[synthWav]]'s zeroed frames (mm10's write side). */
  def synthWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Decode the 16-bit mono PCM samples out of real WAV bytes — the
    * same guarded chunk walk as [[parseWav]], plus the data payload.
    * None unless the container is coherent mono 16-bit PCM. */
  def pcm16Samples(p: Array[Byte]): Option[Array[Short]] = {
    if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE")
      return None
    var off = 12
    var ch = 0; var bits = 0
    var dataOff = -1; var dataSize = -1L
    while (off + 8 <= p.length) {
      val id = tag(p, off)
      val size = le32(p, off + 4)
      if (size < 0 || size > p.length.toLong) return None
      if (id == "fmt " && off + 24 <= p.length) {
        ch = le16(p, off + 10)
        bits = le16(p, off + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataSize = size
      }
      off += 8 + size.toInt + (size % 2).toInt
    }
    if (ch != 1 || bits != 16 || dataOff < 0 ||
      dataOff + dataSize > p.length) return None
    val n = (dataSize / 2).toInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (le16(p, dataOff + 2 * i) match {
        case v if v >= 0x8000 => v - 0x10000
        case v => v
      }).toShort
      i += 1
    }
    Some(out)
  }

  /** Extract WAV metadata from a binary payload column — same
    * per-partition decoder shape as [[BinaryMeta.extract]]. */
  def extract(spark: SparkSession, docs: DataFrame,
      idCol: String, payloadCol: String): Dataset[WavMeta] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val wav = parseWav(payload)
          WavMeta(id, payload.length.toLong,
            wav.map(_ => "wav").getOrElse("unknown"),
            wav.map(_.sampleRate), wav.map(_.channels),
            wav.map(_.bitsPerSample), wav.map(_.durationMs))
        }
      }
  }
}
