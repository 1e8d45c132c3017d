package graft.operators

/** Pure-JVM image codec for the multimodal decode stage: parses two
  * real, publicly-specified uncompressed formats —
  *
  *   - binary PPM ("P6", the Netpbm portable pixmap: ASCII header
  *     `P6 <width> <height> <maxval>` with `#` comments, then raw
  *     RGB triplets), and
  *   - 24-bit uncompressed Windows BMP (BITMAPFILEHEADER +
  *     BITMAPINFOHEADER, BGR pixel rows padded to 4 bytes, stored
  *     bottom-up unless the height field is negative)
  *
  * — into a canonical top-down interleaved-RGB byte buffer, plus a
  * box-filter downsample and a PPM re-encoder. No native libraries,
  * no reflection, no allocation beyond the output buffers: this is
  * the decoder that runs inside `Multimodal`'s mapPartitions stage,
  * so it must be executor-thread-safe (it is — pure functions) and
  * cheap to call per row.
  *
  * Reference behavior modeled: the reference pipeline treats media
  * payloads as opaque blobs with typed metadata; the decode step here
  * is the engine-side capability the reference delegates to external
  * tooling. Formats follow the public Netpbm spec and the public
  * Windows BMP file-format layout.
  */
object ImageCodec {

  /** Decoded raster: top-down row-major, 3 bytes per pixel (RGB). */
  final case class RawImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((pixels(o) & 0xff), (pixels(o + 1) & 0xff), (pixels(o + 2) & 0xff))
    }
  }

  /** Magic-byte dispatch over the supported formats. Returns None for
    * anything that is not a well-formed P6 PPM or 24-bit BMP — the
    * caller decides the fallback policy for opaque payloads. */
  def decode(bytes: Array[Byte]): Option[RawImage] =
    if (bytes == null) None
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp24(bytes)
    else None

  // ------------------------------------------------------------------
  // PPM (P6)
  // ------------------------------------------------------------------

  /** Parse a binary PPM: `P6`, then three ASCII integers (width,
    * height, maxval) separated by whitespace with `#`-to-EOL comments
    * allowed, then a single whitespace byte, then `w*h*3` raw bytes.
    * Only maxval <= 255 (1 byte/sample) is supported — the common
    * case; 2-byte-sample PPMs return None rather than mis-decode. */
  def decodePpm(bytes: Array[Byte]): Option[RawImage] = {
    var pos = 2 // past "P6"
    def skipSeparators(): Boolean = {
      var sawAny = false
      var moving = true
      while (moving && pos < bytes.length) {
        val b = bytes(pos)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c) {
          pos += 1; sawAny = true
        } else if (b == '#') { // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          sawAny = true
        } else moving = false
      }
      sawAny
    }
    def readInt(): Int = {
      if (!skipSeparators()) return -1
      var v = 0L
      var digits = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); digits += 1; pos += 1
        if (v > Int.MaxValue) return -1
      }
      if (digits == 0) -1 else v.toInt
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly one whitespace byte terminates the header before raster data
    if (pos >= bytes.length || !isSpace(bytes(pos))) return None
    pos += 1
    val need = w.toLong * h * 3
    if (need > Int.MaxValue || bytes.length - pos < need) return None
    val px = java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)
    if (maxval != 255) { // rescale samples to the canonical 0..255 range
      var i = 0
      while (i < px.length) {
        px(i) = (((px(i) & 0xff) * 255 + maxval / 2) / maxval).toByte
        i += 1
      }
    }
    Some(RawImage(w, h, px))
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

  // ------------------------------------------------------------------
  // BMP (24-bit uncompressed)
  // ------------------------------------------------------------------

  /** Parse a 24-bit uncompressed BMP. Layout (all little-endian):
    * bytes 0-1 "BM"; byte 10 u32 = pixel-data offset; byte 14 u32 =
    * DIB header size; byte 18 i32 width; byte 22 i32 height (negative
    * = top-down); byte 28 u16 bits-per-pixel (must be 24); byte 30
    * u32 compression (must be 0 = BI_RGB). Rows are BGR, padded to a
    * 4-byte boundary, bottom-up when height > 0. */
  def decodeBmp24(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes.length < 54) return None
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    val dataOffset = i32(10)
    val dibSize = i32(14)
    val w = i32(18)
    val hRaw = i32(22)
    val bpp = u16(28)
    val compression = i32(30)
    if (dibSize < 40 || bpp != 24 || compression != 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || dataOffset < 54) return None
    val rowStride = ((w * 3 + 3) / 4) * 4
    if (dataOffset.toLong + rowStride.toLong * h > bytes.length) return None
    if (w.toLong * h * 3 > Int.MaxValue) return None
    val px = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      var src = dataOffset + srcRow * rowStride
      var dst = row * w * 3
      var x = 0
      while (x < w) { // BGR -> RGB
        px(dst) = bytes(src + 2)
        px(dst + 1) = bytes(src + 1)
        px(dst + 2) = bytes(src)
        src += 3; dst += 3; x += 1
      }
      row += 1
    }
    Some(RawImage(w, h, px))
  }

  // ------------------------------------------------------------------
  // Transform + encode
  // ------------------------------------------------------------------

  /** Box-filter downsample by an integer factor: each output pixel is
    * the per-channel rounded mean of the (up to) factor x factor source
    * block. Edge blocks average only the pixels that exist, so any
    * dimensions divide cleanly. factor = 1 is the identity. */
  def downsample(img: RawImage, factor: Int): RawImage = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    if (factor == 1) return img
    val ow = (img.width + factor - 1) / factor
    val oh = (img.height + factor - 1) / factor
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        val x0 = ox * factor; val y0 = oy * factor
        val x1 = math.min(x0 + factor, img.width)
        val y1 = math.min(y0 + factor, img.height)
        var sr = 0; var sg = 0; var sb = 0
        var y = y0
        while (y < y1) {
          var x = x0
          var o = (y * img.width + x) * 3
          while (x < x1) {
            sr += img.pixels(o) & 0xff
            sg += img.pixels(o + 1) & 0xff
            sb += img.pixels(o + 2) & 0xff
            o += 3; x += 1
          }
          y += 1
        }
        val cnt = (x1 - x0) * (y1 - y0)
        val d = (oy * ow + ox) * 3
        out(d) = ((sr + cnt / 2) / cnt).toByte
        out(d + 1) = ((sg + cnt / 2) / cnt).toByte
        out(d + 2) = ((sb + cnt / 2) / cnt).toByte
        ox += 1
      }
      oy += 1
    }
    RawImage(ow, oh, out)
  }

  /** Serialize to binary PPM — the canonical output container for the
    * resize stage regardless of input format (PPM round-trips the raw
    * raster losslessly and decodes with [[decodePpm]]). */
  /** Box-average resample to a FIXED grid (the perceptual-hash front
    * end): target cell (tx, ty) averages the source rectangle
    * [⌊tx·W/w⌋, ⌊(tx+1)·W/w⌋) × [⌊ty·H/h⌋, ⌊(ty+1)·H/h⌋) per channel
    * with integer floor division — exact, deterministic, and when the
    * source is block-constant (the test/oracle construction) the
    * average IS the block value. */
  def gridResample(img: RawImage, w: Int, h: Int): RawImage = {
    require(w >= 1 && h >= 1 && w <= img.width && h <= img.height,
      s"target ${w}x$h must be within source ${img.width}x${img.height}")
    val out = new Array[Byte](w * h * 3)
    var ty = 0
    while (ty < h) {
      val y0 = ty * img.height / h
      val y1 = (ty + 1) * img.height / h
      var tx = 0
      while (tx < w) {
        val x0 = tx * img.width / w
        val x1 = (tx + 1) * img.width / w
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val o = (y * img.width + x) * 3
            sr += img.pixels(o) & 0xff
            sg += img.pixels(o + 1) & 0xff
            sb += img.pixels(o + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0).toLong
        val to = (ty * w + tx) * 3
        out(to) = (sr / n).toByte
        out(to + 1) = (sg / n).toByte
        out(to + 2) = (sb / n).toByte
        tx += 1
      }
      ty += 1
    }
    RawImage(w, h, out)
  }

  def encodePpm(img: RawImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Serialize to a bottom-up 24-bit uncompressed BMP (used by tests
    * and fixture generation; exercises the padded-row path). */
  def encodeBmp24(img: RawImage): Array[Byte] = {
    val rowStride = ((img.width * 3 + 3) / 4) * 4
    val dataSize = rowStride * img.height
    val out = new Array[Byte](54 + dataSize)
    def putU16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putU32(2, 54 + dataSize) // file size
    putU32(10, 54) // pixel data offset
    putU32(14, 40) // BITMAPINFOHEADER size
    putU32(18, img.width)
    putU32(22, img.height) // positive => bottom-up
    putU16(26, 1) // planes
    putU16(28, 24) // bpp
    putU32(30, 0) // BI_RGB
    putU32(34, dataSize)
    var row = 0
    while (row < img.height) {
      val srcRow = img.height - 1 - row
      var src = srcRow * img.width * 3
      var dst = 54 + row * rowStride
      var x = 0
      while (x < img.width) { // RGB -> BGR
        out(dst) = img.pixels(src + 2)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src)
        src += 3; dst += 3; x += 1
      }
      row += 1
    }
    out
  }
}
