package graft.operators.multimodal

/** REAL pixel-level BMP codec — 24-bit uncompressed Windows BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER), the one raster format this
  * container can decode honestly end-to-end: no compression, no entropy
  * coding, just headers, BGR byte order, bottom-up rows, and 4-byte row
  * padding (public format layout; the same fields mm1's PNG/JPEG header
  * walk reads, but here the PIXELS are real too). Where mm6's resize
  * wraps a clearly-marked fake decode, [[BmpCodec]] gives mm7 true
  * pixel math: decode → area-average downscale → re-encode → re-decode,
  * every byte accounted for.
  *
  * Pixels are row-major TOP-DOWN 0xRRGGBB ints in memory; the encoder
  * writes standard bottom-up files (positive height), the decoder
  * accepts both orientations (negative height = top-down). */
object BmpCodec {

  final case class Bmp(width: Int, height: Int, pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x)
  }

  /** Row stride in bytes: 3 bytes/px rounded up to a 4-byte boundary —
    * the padding rule that makes naive 3·w readers corrupt every
    * non-multiple-of-4 width. */
  def stride(width: Int): Int = ((3 * width + 3) / 4) * 4

  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad pixel buffer: ${pixels.length} for ${width}x$height")
    val st = stride(width)
    val dataSize = st * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize) // padding bytes stay zero
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      le16(off, v & 0xFFFF); le16(off + 2, (v >>> 16) & 0xFFFF)
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, fileSize)
    le32(10, 54) // pixel-data offset
    le32(14, 40) // BITMAPINFOHEADER size
    le32(18, width)
    le32(22, height) // positive: bottom-up
    le16(26, 1)      // planes
    le16(28, 24)     // bpp
    le32(30, 0)      // BI_RGB, uncompressed
    le32(34, dataSize)
    le32(38, 2835); le32(42, 2835) // 72 DPI
    var y = 0
    while (y < height) {
      val row = 54 + (height - 1 - y) * st
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        out(row + 3 * x) = (p & 0xFF).toByte            // B
        out(row + 3 * x + 1) = ((p >> 8) & 0xFF).toByte // G
        out(row + 3 * x + 2) = ((p >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Full decode (not just the header): returns the pixel raster.
    * Accepts both row orders; rejects anything that is not plain
    * uncompressed 24-bit (the honest boundary — compressed BMPs would
    * need the RLE path this container has no business faking). */
  def decode(p: Array[Byte]): Option[Bmp] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    def u8(i: Int): Int = p(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val off = le32(10)
    if (le32(14) < 40) return None // core-header (OS/2) layouts differ
    val width = le32(18)
    val rawH = le32(22)
    val topDown = rawH < 0
    val height = if (rawH == Int.MinValue) return None else math.abs(rawH)
    if (width <= 0 || height <= 0) return None
    // corrupted headers can claim dimensions whose stride or raster size
    // overflows Int — the payload length bound below caps the real ones,
    // so anything larger is rejected before any arithmetic can wrap
    if (width > (1 << 24) || height > (1 << 24)) return None
    if (le16(26) != 1 || le16(28) != 24 || le32(30) != 0) return None
    val st = 3L * width + ((4 - (3L * width) % 4) % 4)
    if (off < 54 || p.length.toLong < off.toLong + st * height) return None
    if (width.toLong * height > p.length) return None // 3 B/px floor
    val stI = st.toInt
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val row = off + (if (topDown) y else height - 1 - y) * stI
      var x = 0
      while (x < width) {
        px(y * width + x) = (u8(row + 3 * x + 2) << 16) |
          (u8(row + 3 * x + 1) << 8) | u8(row + 3 * x)
        x += 1
      }
      y += 1
    }
    Some(Bmp(width, height, px))
  }

  /** Exact 2× area-average downscale: each output pixel is the
    * per-channel FLOOR mean of its 2×2 source block (odd trailing
    * row/column dropped — output dims are w/2 × h/2, blocks exact).
    * Integer arithmetic only, so an SQL oracle reproduces it bit-exact. */
  def halve(b: Bmp): Bmp = {
    val nw = b.width / 2
    val nh = b.height / 2
    require(nw > 0 && nh > 0, s"image too small to halve: ${b.width}x${b.height}")
    val px = new Array[Int](nw * nh)
    var yy = 0
    while (yy < nh) {
      var xx = 0
      while (xx < nw) {
        var r = 0; var g = 0; var bl = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val p = b.pixel(2 * xx + dx, 2 * yy + dy)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; bl += p & 0xFF
            dx += 1
          }
          dy += 1
        }
        px(yy * nw + xx) = ((r / 4) << 16) | ((g / 4) << 8) | (bl / 4)
        xx += 1
      }
      yy += 1
    }
    Bmp(nw, nh, px)
  }

  /** 64-bit average perceptual hash (aHash) of the raster, integer-exact
    * so an SQL oracle reproduces every bit:
    *
    *   1. integer luma per pixel, `(2r + 5g + b) div 8` (a rational
    *      approximation of Rec.601 weights — exact arithmetic beats
    *      float fidelity here, the hash only needs a stable ordering);
    *   2. FLOOR-average the luma over an 8×8 grid of equal cells
    *      (width and height must be multiples of 8 so cells are exact);
    *   3. bit (cy*8 + cx) is set iff its cell's luma EXCEEDS the floor
    *      of the 64-cell mean (strict, so a constant image hashes to 0).
    *
    * Hamming distance between aHashes is the standard near-duplicate
    * signal for images: brightness/contrast shifts move all cells with
    * the mean, small local edits flip few bits. Pair generation at scale
    * reuses SimHash's pigeonhole band join — the hash family changes,
    * the candidate machinery doesn't. */
  def aHash64(b: Bmp): Long = {
    require(b.width % 8 == 0 && b.height % 8 == 0,
      s"aHash needs dims divisible by 8, got ${b.width}x${b.height}")
    val cw = b.width / 8
    val ch = b.height / 8
    val cells = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        var s = 0L
        var dy = 0
        while (dy < ch) {
          var dx = 0
          while (dx < cw) {
            val p = b.pixel(cx * cw + dx, cy * ch + dy)
            val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val bl = p & 0xFF
            s += (2 * r + 5 * g + bl) / 8
            dx += 1
          }
          dy += 1
        }
        cells(cy * 8 + cx) = s / (cw.toLong * ch)
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Per-channel pixel sums (r, g, b) — the checksum an arithmetic
    * oracle can predict for a synthesized raster. */
  def channelSums(b: Bmp): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var bl = 0L
    var i = 0
    while (i < b.pixels.length) {
      val p = b.pixels(i)
      r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; bl += p & 0xFF
      i += 1
    }
    (r, g, bl)
  }
}
