package graft.operators

/** Pure-JVM codec for a minimal raw-frame video container — the video
  * analogue of [[ImageCodec]] (P6/BMP) and [[AudioCodec]] (RIFF/WAVE):
  * real header parsing with total-over-junk-bytes semantics, so the
  * [[Multimodal]] frame-sampling stage does genuine container work.
  * Production video formats (MP4/H.264, WebM/VP9) need an FFI decoder
  * that is not in this container; they would plug into the same
  * `decode` signature, exactly like the JPEG arm of the image path.
  *
  * Container layout ("GVID", little-endian, deliberately MJPEG-shaped:
  * a header followed by independently decodable frames):
  *
  * {{{
  *   bytes 0-3   magic "GVID"
  *   bytes 4-5   width  (u16 LE, >= 1)
  *   bytes 6-7   height (u16 LE, >= 1)
  *   bytes 8-9   frame count (u16 LE, >= 0)
  *   then frameCount frames of width*height 8-bit luminance bytes
  * }}}
  */
object VideoCodec {

  /** Decoded clip: 8-bit luminance frames, all width×height. */
  final case class Clip(width: Int, height: Int, frames: Array[Array[Byte]]) {
    def nFrames: Int = frames.length
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Parse a GVID payload; None for anything this codec cannot handle
    * (wrong magic, zero dims, truncated frame data — total over junk
    * bytes, the [[AudioCodec.decode]] contract). All size arithmetic
    * is Long so crafted headers cannot wrap an Int bound check. */
  def decode(bytes: Array[Byte]): Option[Clip] = {
    if (bytes == null || bytes.length < 10) return None
    if (bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' ||
      bytes(3) != 'D') return None
    val w = le16(bytes, 4)
    val h = le16(bytes, 6)
    val f = le16(bytes, 8)
    if (w < 1 || h < 1) return None
    val frameLen = w.toLong * h.toLong
    if (10L + frameLen * f.toLong > bytes.length.toLong) return None
    val frames = Array.tabulate(f) { i =>
      val off = 10L + frameLen * i.toLong
      java.util.Arrays.copyOfRange(bytes, off.toInt, (off + frameLen).toInt)
    }
    Some(Clip(w, h, frames))
  }

  /** Encode luminance frames as a GVID payload. All frames must be
    * width*height bytes. */
  def encode(width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(frames.length <= 0xffff, s"too many frames: ${frames.length}")
    require(frames.forall(_.length == width * height),
      "frame size mismatch")
    val b = java.nio.ByteBuffer
      .allocate(10 + width * height * frames.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GVID".getBytes("US-ASCII"))
    b.putShort(width.toShort).putShort(height.toShort)
    b.putShort(frames.length.toShort)
    frames.foreach(b.put)
    b.array()
  }
}
