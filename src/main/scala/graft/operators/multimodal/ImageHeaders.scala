package graft.operators.multimodal

/** Codec-free image dimension extraction from header bytes — both layouts
  * are public file-format specs, no image library involved:
  *
  *  - PNG (RFC 2083 / ISO 15948): an 8-byte signature, then chunks of
  *    [4-byte length][4-byte type][data][4-byte CRC]. IHDR is REQUIRED to
  *    be the first chunk, and its first 8 data bytes are width and height
  *    as big-endian uint32 — fixed offsets 16 and 20.
  *  - JPEG (ITU T.81): a stream of [0xFF marker] segments, each (except
  *    the bare SOI/EOI/RSTn) carrying a big-endian uint16 length that
  *    counts itself. Dimensions live in the frame header SOFn
  *    (0xC0-0xCF minus the non-frame C4=DHT, C8=JPG, CC=DAC):
  *    [length][precision:1][height:2][width:2][...]. The walk skips
  *    segments until a SOFn appears.
  *
  * Used per-partition inside [[BinaryMeta.extract]]'s decoder — the
  * "decode" step that used to be a documented stub. */
object ImageHeaders {

  final case class ImageDims(format: String, width: Int, height: Int)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def u8(b: Byte): Int = b & 0xFF
  private def be16(p: Array[Byte], off: Int): Int = (u8(p(off)) << 8) | u8(p(off + 1))
  private def be32(p: Array[Byte], off: Int): Long =
    (u8(p(off)).toLong << 24) | (u8(p(off + 1)) << 16) |
      (u8(p(off + 2)) << 8) | u8(p(off + 3))

  def parse(payload: Array[Byte]): Option[ImageDims] =
    parsePng(payload).orElse(parseJpeg(payload))

  /** IHDR width/height at fixed offsets; validates the signature and that
    * the first chunk really is IHDR. */
  def parsePng(p: Array[Byte]): Option[ImageDims] = {
    if (p.length < 24 || !p.take(8).sameElements(PngSig)) return None
    val isIhdr = p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'
    if (!isIhdr) return None
    val w = be32(p, 16)
    val h = be32(p, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageDims("png", w.toInt, h.toInt))
  }

  /** Walk marker segments from SOI to the first SOFn. */
  def parseJpeg(p: Array[Byte]): Option[ImageDims] = {
    if (p.length < 4 || u8(p(0)) != 0xFF || u8(p(1)) != 0xD8) return None
    var i = 2
    while (i + 3 < p.length) {
      if (u8(p(i)) != 0xFF) return None // desynchronized: not a marker
      var marker = u8(p(i + 1))
      // fill bytes: 0xFF may repeat before the marker byte
      while (marker == 0xFF && i + 2 < p.length) { i += 1; marker = u8(p(i + 1)) }
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / scan data: no SOF seen
      if ((marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
        i += 2 // RSTn / TEM carry no length
      } else {
        if (i + 3 >= p.length) return None
        val len = be16(p, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          // [len][precision][height][width]
          if (i + 8 >= p.length) return None
          val h = be16(p, i + 5)
          val w = be16(p, i + 7)
          return if (w > 0 && h > 0) Some(ImageDims("jpeg", w, h)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  // ------------------------------------------------------------ synthesis
  // Minimal well-formed headers for gate queries and specs: enough real
  // structure that the parser above exercises its actual code paths
  // (signature check, chunk type check, segment walk past APP0).

  /** PNG: signature + IHDR chunk (zeroed CRC) + `filler` zero bytes —
    * 33 + filler bytes total. */
  def synthPng(width: Int, height: Int, filler: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33 + filler)
    out.write(PngSig, 0, 8)
    out.write(Array[Byte](0, 0, 0, 13), 0, 4) // IHDR data length
    out.write("IHDR".getBytes("US-ASCII"), 0, 4)
    writeBe32(out, width)
    writeBe32(out, height)
    // bit depth 8, color type 6 (RGBA), compression/filter/interlace 0
    out.write(Array[Byte](8, 6, 0, 0, 0), 0, 5)
    out.write(new Array[Byte](4 + filler), 0, 4 + filler) // CRC + filler
    out.toByteArray
  }

  /** JPEG: SOI + JFIF APP0 + SOF0 (3-component) + `filler` zero bytes —
    * 39 + filler bytes total. */
  def synthJpeg(width: Int, height: Int, filler: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(39 + filler)
    out.write(Array(0xFF, 0xD8).map(_.toByte), 0, 2) // SOI
    out.write(Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte), 0, 4) // APP0 len 16
    out.write("JFIF".getBytes("US-ASCII"), 0, 4)
    out.write(new Array[Byte](10), 0, 10) // version/units/densities/thumb
    out.write(Array(0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte), 0, 5) // SOF0 len 17, precision 8
    writeBe16(out, height)
    writeBe16(out, width)
    // 3 components: id, sampling, quant table
    out.write(Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1), 0, 10)
    out.write(new Array[Byte](filler), 0, filler)
    out.toByteArray
  }

  private def writeBe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }
  private def writeBe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  // ------------------------------------------------ GIF / WebP (little-endian)

  private def le16(p: Array[Byte], off: Int): Int = u8(p(off)) | (u8(p(off + 1)) << 8)
  private def le24(p: Array[Byte], off: Int): Int =
    u8(p(off)) | (u8(p(off + 1)) << 8) | (u8(p(off + 2)) << 16)

  /** Every format this module knows: PNG, JPEG, GIF, WebP. Kept separate
    * from [[parse]] so existing callers' format universe (and their
    * oracles) is unchanged. */
  def parseAny(payload: Array[Byte]): Option[ImageDims] =
    parse(payload).orElse(parseGif(payload)).orElse(parseWebp(payload))

  /** GIF87a/89a: 6-byte signature, then the Logical Screen Descriptor's
    * width/height as LITTLE-endian uint16 at offsets 6/8 (GIF89a spec
    * §18) — the one mainstream image format that predates network byte
    * order conventions. */
  def parseGif(p: Array[Byte]): Option[ImageDims] = {
    if (p.length < 13) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(p, 6)
    val h = le16(p, 8)
    if (w > 0 && h > 0) Some(ImageDims("gif", w, h)) else None
  }

  /** WebP (RIFF container, all little-endian): "RIFF"[size]"WEBP", then
    * one of three first chunks —
    *  - "VP8 " lossy: 3-byte frame tag, sync 9D 01 2A, then 14-bit
    *    width/height in two LE uint16s (VP8 spec / RFC 6386 §9.1);
    *  - "VP8L" lossless: 0x2F signature, then 14-bit width−1/height−1
    *    packed LSB-first in 4 bytes;
    *  - "VP8X" extended: 24-bit LE canvas width−1/height−1 at 24/27. */
  def parseWebp(p: Array[Byte]): Option[ImageDims] = {
    if (p.length < 25) return None
    if (new String(p, 0, 4, "US-ASCII") != "RIFF" ||
      new String(p, 8, 4, "US-ASCII") != "WEBP") return None
    new String(p, 12, 4, "US-ASCII") match {
      case "VP8 " if p.length >= 30 =>
        if (u8(p(23)) != 0x9D || u8(p(24)) != 0x01 || u8(p(25)) != 0x2A) None
        else {
          val w = le16(p, 26) & 0x3FFF
          val h = le16(p, 28) & 0x3FFF
          if (w > 0 && h > 0) Some(ImageDims("webp", w, h)) else None
        }
      case "VP8L" if u8(p(20)) == 0x2F =>
        val b0 = u8(p(21)); val b1 = u8(p(22)); val b2 = u8(p(23)); val b3 = u8(p(24))
        val w = 1 + (((b1 & 0x3F) << 8) | b0)
        val h = 1 + (((b3 & 0xF) << 10) | (b2 << 2) | ((b1 >> 6) & 0x3))
        Some(ImageDims("webp-lossless", w, h))
      case "VP8X" if p.length >= 30 =>
        val w = le24(p, 24) + 1
        val h = le24(p, 27) + 1
        Some(ImageDims("webp", w, h))
      case _ => None
    }
  }

  /** GIF89a header + LSD + `filler` zero bytes + trailer — 14 + filler
    * bytes total. */
  def synthGif(width: Int, height: Int, filler: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(14 + filler)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    writeLe16(out, width)
    writeLe16(out, height)
    out.write(new Array[Byte](3), 0, 3) // flags, bg color, aspect
    out.write(new Array[Byte](filler), 0, filler)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Lossy WebP: RIFF + "VP8 " chunk (frame tag, sync, 14-bit dims) +
    * `filler` — 30 + filler bytes total. */
  def synthWebpLossy(width: Int, height: Int, filler: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(30 + filler)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    writeLe32(out, 22 + filler) // file size - 8
    out.write("WEBP".getBytes("US-ASCII"), 0, 4)
    out.write("VP8 ".getBytes("US-ASCII"), 0, 4)
    writeLe32(out, 10 + filler) // chunk payload size
    out.write(new Array[Byte](3), 0, 3) // frame tag (keyframe)
    out.write(0x9D); out.write(0x01); out.write(0x2A) // sync code
    writeLe16(out, width & 0x3FFF)
    writeLe16(out, height & 0x3FFF)
    out.write(new Array[Byte](filler), 0, filler)
    out.toByteArray
  }

  /** Lossless WebP: RIFF + "VP8L" chunk (0x2F + packed 14-bit dims) +
    * `filler` — 25 + filler bytes total. */
  def synthWebpLossless(width: Int, height: Int, filler: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(25 + filler)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    writeLe32(out, 17 + filler)
    out.write("WEBP".getBytes("US-ASCII"), 0, 4)
    out.write("VP8L".getBytes("US-ASCII"), 0, 4)
    writeLe32(out, 5 + filler)
    out.write(0x2F)
    val wm1 = width - 1; val hm1 = height - 1
    out.write(wm1 & 0xFF)
    out.write(((wm1 >> 8) & 0x3F) | ((hm1 & 0x3) << 6))
    out.write((hm1 >> 2) & 0xFF)
    out.write((hm1 >> 10) & 0xF) // alpha/version bits zero
    out.write(new Array[Byte](filler), 0, filler)
    out.toByteArray
  }

  private def writeLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }
  private def writeLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }
}
