package graft.operators

/** Pure-JVM RIFF/WAVE PCM16 codec — the audio analogue of
  * [[ImageCodec]]: real header parsing (RIFF container walk, `fmt `
  * chunk fields, arbitrary chunk order, unknown chunks skipped with
  * word alignment), little-endian 16-bit sample decode, and the
  * matching encoder. Closes the disclosed audio-fallback gap in
  * [[Multimodal]]'s scaladoc: decodable WAV payloads get REAL sample
  * work; other audio containers (MP3/OGG/FLAC) would plug a JNI/FFI
  * decoder into the same `decode` signature.
  *
  * Public format reference: the canonical WAVE structure —
  * "RIFF" <riffSize> "WAVE" then chunks; `fmt ` carries
  * (audioFormat=1 for PCM, channels, sampleRate, byteRate, blockAlign,
  * bitsPerSample); `data` carries the interleaved samples. Chunks are
  * word-aligned (odd-sized chunks pad one byte).
  */
object AudioCodec {

  /** Decoded PCM16 audio (mono or interleaved multi-channel). */
  final case class Pcm(
      sampleRate: Int,
      channels: Int,
      samples: Array[Short]) {
    /** frames = samples per channel. */
    def nFrames: Int = samples.length / channels
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE PCM16 payload; None for anything this codec
    * cannot handle (wrong magic, compressed formats, truncated data —
    * a media lake's decode stage must be total over junk bytes). */
  def decode(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes == null || bytes.length < 44 ||
      tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var off = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var fmtOk = false
    var data: Option[(Int, Int)] = None // (offset, byteLen)
    while (off + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
      val id = tag(bytes, off)
      val len = le32(bytes, off + 4)
      // Long arithmetic: a corrupt len near Int.MaxValue would wrap the
      // Int sum negative and slip past the bound check.
      if (len < 0 || off.toLong + 8L + len.toLong > bytes.length.toLong)
        return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = le16(bytes, off + 8)
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1 && rate > 0
          if (!fmtOk) return None
        case "data" => data = Some((off + 8, len))
        case _      => () // skip unknown chunks (LIST, fact, cue ...)
      }
      off += 8 + len + (len & 1) // word alignment
    }
    data match {
      case Some((dOff, dLen)) if fmtOk =>
        val n = dLen / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = le16(bytes, dOff + 2 * i).toShort
          i += 1
        }
        Some(Pcm(rate, channels, out))
      case _ => None
    }
  }

  /** Encode mono PCM16 as a canonical 44-byte-header WAV. */
  def encodePcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(sampleRate).putInt(sampleRate * 2) // byteRate
    b.putShort(2).putShort(16) // blockAlign, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }
}
