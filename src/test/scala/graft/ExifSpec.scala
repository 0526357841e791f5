package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.multimodal.Exif

/** The EXIF TIFF walk against its own synthesis plus the hostile
  * inputs a real corpus serves: truncated streams, wrong magic, missing
  * Exif IFD, non-JPEG bytes. */
class ExifSpec extends AnyFunSuite {

  private def mk(le: Boolean) = Exif.synthExifJpeg(
    w = 640, h = 480, littleEndian = le, orientation = 6, iso = 400,
    focalNum = 35, focalDen = 2, model = "CAM-X",
    capture = "2019:07:04 12:00:00")

  test("round trip in both byte orders, offset ASCII and rational") {
    for (le <- Seq(true, false)) {
      val m = Exif.parse(mk(le)).get
      assert(m.byteOrder == (if (le) "II" else "MM"))
      assert(m.orientation.contains(6))
      assert(m.iso.contains(400))
      assert(m.focalMm.contains(17.5))
      assert(m.model.contains("CAM-X"))
      assert(m.capture.contains("2019:07:04 12:00:00"))
    }
  }

  test("non-JPEG, truncation, and structural damage parse to None - never throw") {
    assert(Exif.parse("plain text".getBytes("UTF-8")).isEmpty)
    assert(Exif.parse(Array[Byte]()).isEmpty)
    val good = mk(true)
    // every truncation length parses without throwing
    (0 until good.length).foreach { n =>
      Exif.parse(good.take(n)) // must not throw
    }
    // smash the TIFF byte-order mark: None, not garbage
    val bad = good.clone()
    bad(12) = 'X'.toByte
    assert(Exif.parse(bad).isEmpty)
    // smash the 42 magic
    val bad2 = good.clone()
    bad2(14) = 99.toByte; bad2(15) = 99.toByte
    assert(Exif.parse(bad2).isEmpty)
  }

  test("hostile IFD pointers - huge or Int-overflowing u32 offsets - " +
      "parse to None, never ArrayIndexOutOfBounds") {
    // TIFF starts at byte 12 (SOI+APP1 header+\"Exif\\0\\0\"); the IFD0
    // pointer is the u32 at tiffAt+4 = bytes 16..19 (little-endian here)
    def smashIfd0(offset: Long): Array[Byte] = {
      val b = mk(true).clone()
      b(16) = (offset & 0xFF).toByte
      b(17) = ((offset >> 8) & 0xFF).toByte
      b(18) = ((offset >> 16) & 0xFF).toByte
      b(19) = ((offset >> 24) & 0xFF).toByte
      b
    }
    // 0x80000000 lands negative after .toInt; 0x7FFFFFF0 + tiffAt
    // overflows Int; 0xFFFFFFFF is the all-ones corruption classic
    for (off <- Seq(0x80000000L, 0x7FFFFFF0L, 0xFFFFFFFFL, 1L << 20))
      assert(Exif.parse(smashIfd0(off)).isEmpty, f"ifd0 offset 0x$off%x")
    // same attack on the chained Exif-IFD pointer (tag 0x8769's value
    // slot): IFD0 entry 4 of 4, value at ifd0At + 2 + 3*12 + 8
    val exifPtrAt = 12 + 8 + 2 + 3 * 12 + 8
    val b2 = mk(true).clone()
    b2(exifPtrAt) = 0xF0.toByte; b2(exifPtrAt + 1) = 0xFF.toByte
    b2(exifPtrAt + 2) = 0xFF.toByte; b2(exifPtrAt + 3) = 0xFF.toByte
    val m = Exif.parse(b2)
    assert(m.nonEmpty && m.get.iso.isEmpty && m.get.focalMm.isEmpty,
      "a corrupt Exif-IFD pointer drops the sub-IFD fields, keeps IFD0's")
  }

  test("a JPEG without APP1 yields None; fields absent from the IFD " +
      "come back None, not defaults") {
    // plain JPEG: SOI + EOI
    assert(Exif.parse(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
    // zero a tag id: that field disappears, the rest survive
    val good = mk(false) // big-endian: tag bytes at entry start
    val m0 = Exif.parse(good).get
    assert(m0.orientation.isDefined)
  }
}
