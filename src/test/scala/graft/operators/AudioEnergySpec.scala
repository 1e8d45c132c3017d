package graft.operators

import graft.SparkTestBase

class AudioEnergySpec extends SparkTestBase {

  import spark.implicits._

  private def windows(rows: Seq[(Long, Array[Byte])], w: Int) =
    Multimodal.audioEnergyWindows(
      rows.toDF("doc_id", "payload"), "payload", windowSamples = w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap

  test("windows carry exact energies; a short tail window keeps its true size") {
    // 10 samples, window 4: [3,3,3,3] [0,0,0,0] [5,5] — energies
    // 4·9=36, 0 (silent), 2·25=50
    val samples = Array.fill(4)(3.toShort) ++ Array.fill(4)(0.toShort) ++
      Array.fill(2)(5.toShort)
    val wav = AudioCodec.encodePcm16Mono(8000, samples)
    val got = windows(Seq(1L -> wav), w = 4)
    assert(got === Map(
      (1L, 0L) -> ((4L, 36L, false)),
      (1L, 1L) -> ((4L, 0L, true)),
      (1L, 2L) -> ((2L, 50L, false))))
  }

  test("negative samples square positively (no sign leakage)") {
    val wav = AudioCodec.encodePcm16Mono(8000, Array[Short](-7, 7))
    val got = windows(Seq(1L -> wav), w = 2)
    assert(got((1L, 0L)) === ((2L, 98L, false)))
  }

  test("null and junk payloads emit no windows but kill nothing") {
    val ok = AudioCodec.encodePcm16Mono(8000, Array[Short](1))
    val got = windows(
      Seq(1L -> null, 2L -> "not a wav".getBytes("UTF-8"), 3L -> ok), w = 8)
    assert(got.keySet === Set((3L, 0L)))
  }
}
