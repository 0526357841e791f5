package graft.operators.multimodal

/** REAL EXIF metadata: a TIFF IFD walk inside a JPEG APP1 segment —
  * the capture-metadata extraction a multimodal training pipeline runs
  * to filter/group images (orientation normalization, capture-time
  * dedup windows, device stratification). Both TIFF byte orders (II
  * little-endian, MM big-endian), inline AND offset-stored values
  * (ASCII > 4 bytes, RATIONAL always 8 bytes at offset), and the
  * chained Exif-private IFD (tag 0x8769) are handled — the layouts
  * real camera files use. Synthesis builds the same structures
  * byte-for-byte so gates exercise the actual parser, never a mock.
  *
  * Reference analogue: binary attachments ride the reference's profile
  * model as opaque URLs (core/models/profile.py Attachment) — the
  * engine-side decode is the capability the reference delegates to its
  * consumers. */
object Exif {

  final case class ExifMeta(byteOrder: String, orientation: Option[Int],
      iso: Option[Int], focalMm: Option[Double], model: Option[String],
      capture: Option[String])

  // ── synthesis ──────────────────────────────────────────────────────

  /** A minimal-but-real JPEG: SOI, APP1/Exif (TIFF with IFD0 +
    * Exif-private IFD), SOF0 with the dimensions, EOI. */
  def synthExifJpeg(w: Int, h: Int, littleEndian: Boolean,
      orientation: Int, iso: Int, focalNum: Int, focalDen: Int,
      model: String, capture: String): Array[Byte] = {
    val tiff = synthTiff(littleEndian, orientation, iso, focalNum,
      focalDen, model, capture)
    val exifPayload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val out = new java.io.ByteArrayOutputStream()
    def u16be(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    out.write(0xFF); out.write(0xD8)                  // SOI
    out.write(0xFF); out.write(0xE1)                  // APP1
    u16be(exifPayload.length + 2)                     // length incl itself
    out.write(exifPayload, 0, exifPayload.length)
    out.write(0xFF); out.write(0xC0); u16be(11)       // SOF0
    out.write(8); u16be(h); u16be(w)                  // precision, dims
    out.write(1); out.write(1); out.write(0x11); out.write(0) // 1 component
    out.write(0xFF); out.write(0xD9)                  // EOI
    out.toByteArray
  }

  /** The TIFF stream: IFD0 (Model, Orientation, DateTime, ExifIFD
    * pointer — ascending tag order per spec) + a data area holding the
    * offset-stored ASCII values, the Exif IFD (ISOSpeedRatings,
    * FocalLength) and the focal RATIONAL. */
  private def synthTiff(le: Boolean, orientation: Int, iso: Int,
      focalNum: Int, focalDen: Int, model: String,
      capture: String): Array[Byte] = {
    val modelB = model.getBytes("US-ASCII") :+ 0.toByte
    val captureB = capture.getBytes("US-ASCII") :+ 0.toByte
    val ifd0At = 8
    val ifd0End = ifd0At + 2 + 4 * 12 + 4
    val modelAt = ifd0End
    val captureAt = modelAt + modelB.length
    val exifIfdAt = captureAt + captureB.length
    val focalAt = exifIfdAt + 2 + 2 * 12 + 4
    val buf = java.nio.ByteBuffer.allocate(focalAt + 8).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
    buf.putShort(42.toShort)
    buf.putInt(ifd0At)
    def entry(tag: Int, typ: Int, count: Int, inline: Option[Int],
        offset: Option[Int]): Unit = {
      buf.putShort(tag.toShort); buf.putShort(typ.toShort); buf.putInt(count)
      (inline, offset) match {
        case (Some(v), _) if typ == 3 => // SHORT rides the value slot's
          buf.putShort(v.toShort); buf.putShort(0) // FIRST two bytes
        case (Some(v), _) => buf.putInt(v)
        case (_, Some(o)) => buf.putInt(o)
        case _ => buf.putInt(0)
      }
    }
    buf.putShort(4.toShort) // IFD0 entries, ascending tags
    entry(0x0110, 2, modelB.length, None, Some(modelAt))    // Model ASCII
    entry(0x0112, 3, 1, Some(orientation), None)            // Orientation
    entry(0x0132, 2, captureB.length, None, Some(captureAt))// DateTime
    entry(0x8769, 4, 1, Some(exifIfdAt), None)              // Exif IFD ptr
    buf.putInt(0) // no IFD1
    buf.put(modelB)
    buf.put(captureB)
    buf.putShort(2.toShort) // Exif IFD
    entry(0x8827, 3, 1, Some(iso), None)                    // ISO SHORT
    entry(0x920A, 5, 1, None, Some(focalAt))                // FocalLength
    buf.putInt(0)
    buf.putInt(focalNum)
    buf.putInt(focalDen)
    buf.array()
  }

  // ── parsing ────────────────────────────────────────────────────────

  /** Walk the JPEG's segments to APP1/Exif and parse the TIFF inside.
    * None when the payload is not a JPEG or carries no EXIF. */
  def parse(bytes: Array[Byte]): Option[ExifMeta] = {
    if (bytes.length < 4 ||
        (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= bytes.length && (bytes(i) & 0xFF) == 0xFF) {
      val marker = bytes(i + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / scan data
      val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
      if (marker == 0xE1 && i + 4 + 6 <= bytes.length &&
          new String(bytes, i + 4, 4, "US-ASCII") == "Exif" &&
          bytes(i + 8) == 0 && bytes(i + 9) == 0)
        return parseTiff(bytes, i + 10, i + 2 + len)
      i += 2 + len
    }
    None
  }

  private def parseTiff(b: Array[Byte], tiffAt: Int,
      declaredEnd: Int): Option[ExifMeta] = {
    // a truncated stream's declared segment length can point past the
    // actual bytes — every bound below clamps to what exists
    val end = math.min(declaredEnd, b.length)
    if (tiffAt + 8 > end) return None
    val order = new String(b, tiffAt, 2, "US-ASCII")
    val le = order match {
      case "II" => true
      case "MM" => false
      case _ => return None
    }
    def u16(at: Int): Int =
      if (le) (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8)
      else ((b(at) & 0xFF) << 8) | (b(at + 1) & 0xFF)
    def u32(at: Int): Long =
      if (le) (b(at) & 0xFFL) | ((b(at + 1) & 0xFFL) << 8) |
        ((b(at + 2) & 0xFFL) << 16) | ((b(at + 3) & 0xFFL) << 24)
      else ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
        ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)
    if (u16(tiffAt + 2) != 42) return None
    // one IFD's (tag → (type, count, value-slot offset)) map
    def readIfd(ifdAt: Int): Map[Int, (Int, Long, Int)] = {
      // a hostile/corrupt IFD pointer (huge u32, or one that overflows
      // tiffAt + offset past Int.MaxValue) lands negative after .toInt,
      // or re-enters the 8-byte TIFF header (offsets are TIFF-relative
      // and the spec floors them at 8) — reject both so the u16 below
      // can never index out of bounds or parse header bytes as an IFD
      if (ifdAt < tiffAt + 8 || ifdAt + 2 > end) return Map.empty
      val n = u16(ifdAt)
      (0 until n).flatMap { k =>
        val e = ifdAt + 2 + k * 12
        if (e + 12 > end) None
        else Some(u16(e) -> ((u16(e + 2), u32(e + 4), e + 8)))
      }.toMap
    }
    def short(m: Map[Int, (Int, Long, Int)], tag: Int): Option[Int] =
      m.get(tag).collect { case (3, _, at) => u16(at) }
    def ascii(m: Map[Int, (Int, Long, Int)], tag: Int): Option[String] =
      m.get(tag).collect { case (2, count, at) =>
        val start =
          if (count <= 4) at else tiffAt + u32(at).toInt // inline vs offset
        val len =
          if (start < 0 || start >= end) 0
          else math.max(0, math.min(count.toInt, end - start))
        new String(b, math.max(0, math.min(start, end)), len, "US-ASCII")
          .takeWhile(_ != '\u0000')
      }
    def rational(m: Map[Int, (Int, Long, Int)], tag: Int): Option[Double] =
      m.get(tag).collect { case (5, _, at)
          if tiffAt + u32(at) + 8 <= end =>
        val o = tiffAt + u32(at).toInt
        val den = u32(o + 4)
        if (den == 0) Double.NaN else u32(o).toDouble / den.toDouble
      }
    val ifd0 = readIfd(tiffAt + u32(tiffAt + 4).toInt)
    if (ifd0.isEmpty) return None
    val exifIfd = ifd0.get(0x8769).collect { case (4, _, at) =>
      readIfd(tiffAt + u32(at).toInt) }.getOrElse(Map.empty)
    Some(ExifMeta(order,
      short(ifd0, 0x0112),
      short(exifIfd, 0x8827),
      rational(exifIfd, 0x920A),
      ascii(ifd0, 0x0110),
      ascii(ifd0, 0x0132)))
  }
}
