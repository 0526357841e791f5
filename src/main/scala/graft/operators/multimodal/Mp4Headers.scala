package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed metadata parsed from an MP4 payload's header bytes. */
final case class Mp4Meta(
    doc_id: Long,
    byte_len: Long,
    format: String,
    brand: Option[String],
    timescale: Option[Long],
    duration_ms: Option[Long])

/** Codec-free MP4 (ISO BMFF, ISO/IEC 14496-12) box walk — the video twin
  * of [[ImageHeaders]]/[[AudioHeaders]]: boxes are
  * [4-byte big-endian size][4-byte type][payload] (size includes the
  * header; 1 = 64-bit largesize follows, 0 = to end-of-file); `ftyp`
  * carries the major brand, `moov`'s child `mvhd` carries the movie
  * timescale and duration (version 0: 32-bit fields at offsets 12/16 of
  * the payload; version 1: 64-bit creation/modification shift them).
  * Duration in ms = duration · 1000 / timescale. Fixed-offset integer
  * decoding only — no codec library, same as the image/audio walks. */
object Mp4Headers {

  private def be32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xFF).toLong << 24) | ((p(off + 1) & 0xFF).toLong << 16) |
      ((p(off + 2) & 0xFF).toLong << 8) | (p(off + 3) & 0xFF).toLong
  private def be64(p: Array[Byte], off: Int): Long =
    (be32(p, off) << 32) | be32(p, off + 4)
  private def tag(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")

  final case class Mp4(brand: String, timescale: Long, durationMs: Long)

  /** Parse one mvhd payload starting at `off` (the byte after the box
    * header). Returns (timescale, duration) or None if truncated. */
  private def mvhd(p: Array[Byte], off: Int, size: Long): Option[(Long, Long)] = {
    if (off + 4 > p.length) return None
    val version = p(off) & 0xFF
    version match {
      case 0 if off + 24 <= p.length && size >= 32 =>
        Some((be32(p, off + 12), be32(p, off + 16)))
      case 1 if off + 32 <= p.length && size >= 40 =>
        Some((be32(p, off + 20), be64(p, off + 24)))
      case _ => None
    }
  }

  /** Walk the top-level boxes for `ftyp` and `moov`/`mvhd`. Returns None
    * for non-MP4 payloads or truncated/incoherent headers. */
  def parseMp4(p: Array[Byte]): Option[Mp4] = {
    if (p.length < 16 || tag(p, 4) != "ftyp") return None
    var off = 0
    var brand: Option[String] = None
    var ts = -1L
    var dur = -1L
    while (off + 8 <= p.length) {
      val size0 = be32(p, off)
      val typ = tag(p, off + 4)
      // size 1 (64-bit largesize) and 0 (to-EOF) both resolve to a
      // concrete extent; anything incoherent stops the walk → None
      val (size, hdr) =
        if (size0 == 1L && off + 16 <= p.length) (be64(p, off + 8), 16)
        else if (size0 == 0L) (p.length.toLong - off, 8)
        else (size0, 8)
      if (size < hdr || off + size > p.length) return None
      if (typ == "ftyp" && size >= hdr + 4)
        brand = Some(tag(p, off + hdr))
      else if (typ == "moov") {
        // one-level child walk inside moov
        var c = off + hdr
        val end = off + size.toInt
        while (c + 8 <= end) {
          val cs = be32(p, c)
          if (cs < 8 || c + cs > end) { c = end } // corrupt child: stop
          else {
            if (tag(p, c + 4) == "mvhd")
              mvhd(p, c + 8, cs - 8).foreach { case (t, d) => ts = t; dur = d }
            c += cs.toInt
          }
        }
      }
      off += size.toInt
    }
    brand match {
      case Some(b) if ts > 0 && dur >= 0 =>
        Some(Mp4(b, ts, dur * 1000L / ts))
      case _ => None
    }
  }

  /** Minimal well-formed MP4 header: ftyp + moov/mvhd(v0) + an `mdat`
    * of `mdatBytes` filler — enough structure for any BMFF walker. */
  def synthMp4(brand: String, timescale: Int, duration: Long,
      mdatBytes: Int): Array[Byte] = {
    require(brand.length == 4, "brand is a 4CC")
    val mvhdSize = 8 + 100 // header + v0 payload
    val moovSize = 8 + mvhdSize
    val out = java.nio.ByteBuffer.allocate(16 + moovSize + 8 + mdatBytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put(brand.getBytes("US-ASCII")).putInt(0)
    out.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    out.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
    out.putInt(0) // version 0 + flags
    out.putInt(0).putInt(0) // creation, modification
    out.putInt(timescale).putInt(duration.toInt)
    out.putInt(0x00010000) // rate 1.0
    out.putShort(0x0100.toShort) // volume 1.0
    out.putShort(0).putLong(0) // reserved
    // identity matrix (9 × 32-bit fixed point)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.putInt)
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_id
    out.putInt(8 + mdatBytes).put("mdat".getBytes("US-ASCII"))
    out.array()
  }

  /** Distributed extraction: (id, payload) → [[Mp4Meta]]. */
  def extract(spark: SparkSession, docs: DataFrame,
      idCol: String, payloadCol: String): Dataset[Mp4Meta] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val mp4 = parseMp4(payload)
          Mp4Meta(id, payload.length.toLong,
            mp4.map(_ => "mp4").getOrElse("unknown"),
            mp4.map(_.brand), mp4.map(_.timescale), mp4.map(_.durationMs))
        }
      }
  }
}
