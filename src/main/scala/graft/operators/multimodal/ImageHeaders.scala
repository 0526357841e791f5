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
}
