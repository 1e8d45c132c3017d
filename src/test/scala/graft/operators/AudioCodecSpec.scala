package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form coverage of the pure-JVM WAV PCM16 codec: encode →
  * decode round trip, chunk-walk robustness (unknown chunks, odd-size
  * word alignment, chunk order), and totality over junk bytes. */
class AudioCodecSpec extends AnyFunSuite {

  test("encode → decode round-trips samples, rate, and channel count") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1234, -4321)
    val bytes = AudioCodec.encodePcm16Mono(44100, samples)
    val pcm = AudioCodec.decode(bytes).get
    assert(pcm.sampleRate === 44100)
    assert(pcm.channels === 1)
    assert(pcm.nFrames === 7)
    assert(pcm.samples.toSeq === samples.toSeq)
  }

  test("unknown chunks are skipped with word alignment") {
    // canonical file, then splice a 3-byte 'junk' chunk (padded to 4)
    // between fmt and data — the walk must skip it and still find data
    val base = AudioCodec.encodePcm16Mono(8000, Array[Short](5, -5))
    val (head, rest) = base.splitAt(36) // RIFF..fmt chunk end
    val junk = "junk".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // padded odd chunk
    val spliced = head ++ junk ++ rest
    // fix the RIFF size field (offset 4, little-endian)
    val b = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(4, spliced.length - 8)
    val pcm = AudioCodec.decode(spliced).get
    assert(pcm.samples.toSeq === Seq[Short](5, -5))
  }

  test("junk bytes, truncation, and compressed formats decode to None") {
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decode("RIFFxxxxNOPE".getBytes("US-ASCII") ++
      new Array[Byte](40)).isEmpty)
    val good = AudioCodec.encodePcm16Mono(8000, Array[Short](1, 2, 3, 4))
    assert(AudioCodec.decode(good.dropRight(3)).isEmpty,
      "truncated data chunk must be rejected, not mis-read")
    // flip audioFormat to 2 (ADPCM) — must refuse
    val adpcm = good.clone()
    adpcm(20) = 2
    assert(AudioCodec.decode(adpcm).isEmpty)
  }

  test("null payload and overflow-crafted chunk length decode to None") {
    assert(AudioCodec.decode(null).isEmpty)
    // chunk length near Int.MaxValue: off + 8 + len wraps negative in
    // Int arithmetic and would slip past the bound check, then blow up
    // in the sample copy — the Long-arithmetic check must reject it
    val good = AudioCodec.encodePcm16Mono(8000, Array[Short](1, 2, 3, 4))
    val crafted = good.clone()
    val b = java.nio.ByteBuffer.wrap(crafted)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(16, Int.MaxValue - 4) // fmt chunk length
    assert(AudioCodec.decode(crafted).isEmpty)
    val crafted2 = good.clone()
    val b2 = java.nio.ByteBuffer.wrap(crafted2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b2.putInt(40, Int.MaxValue - 4) // data chunk length
    assert(AudioCodec.decode(crafted2).isEmpty)
  }

  test("negative and max-magnitude samples survive the LE round trip") {
    val edge = Array.tabulate(256)(i => ((i * 257) - 32768).toShort)
    val pcm = AudioCodec.decode(AudioCodec.encodePcm16Mono(16000, edge)).get
    assert(pcm.samples.toSeq === edge.toSeq)
  }
}
