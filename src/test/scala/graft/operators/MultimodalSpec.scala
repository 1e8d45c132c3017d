package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("sniffFormat recognizes public magic bytes on binary payloads") {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val riff = "RIFF1234WAVE".getBytes("UTF-8")
    val text = "hello world".getBytes("UTF-8")
    val df = Seq(
      (1L, png), (2L, jpeg), (3L, riff), (4L, text)).toDF("doc_id", "payload")
    val got = df.select(col("doc_id"), Multimodal.sniffFormat(col("payload")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "unknown"))
  }

  test("withMediaMeta computes sizes and stable digests") {
    import spark.implicits._
    val df = Seq((1L, "abcdef".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val row = Multimodal.withMediaMeta(df, "payload").head
    assert(row.getAs[Long]("n_bytes") === 6L)
    // md5("abcdef")
    assert(row.getAs[String]("content_md5") === "e80b5017098950fc58aad83c8c14978e")
    // payload shorter than the second frame → md5 of empty slice
    assert(row.getAs[String]("frame1_md5") === "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("resize decodes a real BMP, box-downsamples pixels, re-encodes as PPM") {
    import spark.implicits._
    val bmp = Files.readAllBytes(Paths.get(fixture("gradient.bmp")))
    val ppm = Files.readAllBytes(Paths.get(fixture("gradient.ppm")))
    val df = Seq((1L, bmp), (2L, ppm)).toDF("doc_id", "payload")
    val out = Multimodal.resize(df, "payload", factor = 2)
    assert(out.schema("resized").dataType.simpleString === "binary")
    val byId = out.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized")).toMap
    // both formats decode to the same 8x6 gradient -> same 4x3 output
    for (id <- Seq(1L, 2L)) {
      val img = ImageCodec.decode(byId(id)).get // output container is PPM
      assert(img.width === 4 && img.height === 3)
      // fixture pixel (x,y) = (30x, 40y, 10(x+y)); 2x2 box means:
      for (oy <- 0 until 3; ox <- 0 until 4)
        assert(img.rgb(ox, oy) === (60 * ox + 15, 80 * oy + 20, 20 * ox + 20 * oy + 10),
          s"doc $id at ($ox,$oy)")
    }
  }

  test("resize falls back to stride-sampling for non-image payloads") {
    import spark.implicits._
    val df = Seq((1L, (0 until 100).map(_.toByte).toArray)).toDF("doc_id", "payload")
    val out = Multimodal.resize(df, "payload", factor = 4)
    val r = out.head.getAs[Array[Byte]]("resized")
    assert(r.length === 25)
    assert(r.toSeq === (0 until 100 by 4).map(_.toByte))
  }

  test("extractFeatures yields a real luminance histogram for decodable images") {
    import spark.implicits._
    val ppm = Files.readAllBytes(Paths.get(fixture("gradient.ppm")))
    val df = Seq((1L, ppm)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "payload", dim = 8)
    assert(feats.schema("features").dataType.simpleString === "array<float>")
    val got = feats.head.getSeq[Float](1)
    // independent expectation from the gradient closed form
    val counts = new Array[Int](8)
    for (y <- 0 until 6; x <- 0 until 8) {
      val luma = (299 * (30 * x) + 587 * (40 * y) + 114 * (10 * (x + y))) / 1000
      counts(math.min(luma * 8 / 256, 7)) += 1
    }
    val expected = counts.map(_.toFloat / 48).toSeq
    assert(got === expected)
    assert(math.abs(got.sum - 1.0f) < 1e-5)
  }

  test("extractFeatures: hash fallback keeps schema, dim and determinism") {
    import spark.implicits._
    val df = Seq(
      (1L, "first payload".getBytes("UTF-8")),
      (2L, "second payload".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "payload", dim = 8)
    assert(feats.schema("features").dataType.simpleString === "array<float>")
    val rows = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1L).length === 8)
    assert(rows(1L) !== rows(2L)) // payload-dependent
    val again = Multimodal.extractFeatures(df, "payload", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again === rows) // deterministic
  }

  test("gridResample: box averages are exact; block-constant images pass through") {
    // 4x2 -> 2x1: each target cell averages a 2x2 box
    val px = Array[Int](
      10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40,
      50, 50, 50, 60, 60, 60, 70, 70, 70, 80, 80, 80).map(_.toByte)
    val g = ImageCodec.gridResample(ImageCodec.RawImage(4, 2, px), 2, 1)
    assert(g.rgb(0, 0) === (((10 + 20 + 50 + 60) / 4,
      (10 + 20 + 50 + 60) / 4, (10 + 20 + 50 + 60) / 4)))
    assert(g.rgb(1, 0) === (((30 + 40 + 70 + 80) / 4,
      (30 + 40 + 70 + 80) / 4, (30 + 40 + 70 + 80) / 4)))
  }

  test("dHash: noise-invariant within class, distinct across classes, null for junk") {
    import spark.implicits._
    def synth(id: Long): Array[Byte] = {
      val c = (id % 10L).toInt
      val px = new Array[Byte](36 * 32 * 3)
      for (y <- 0 until 32; x <- 0 until 36) {
        val (bx, by) = (x / 4, y / 4)
        val asc = ((c >> (by % 4)) & 1) == 1
        val base = if (asc) 30 + bx * 20 else 190 - bx * 20
        val noise = (((id * 131L + bx * 17L + by * 7L) % 17L) - 8L).toInt
        val o = (y * 36 + x) * 3
        val v = (base + noise).toByte
        px(o) = v; px(o + 1) = v; px(o + 2) = v
      }
      ImageCodec.encodePpm(ImageCodec.RawImage(36, 32, px))
    }
    // ids 0..29: three docs per class, all byte-distinct
    val df = (0L until 30L).map(id => (id, synth(id))).toDF("doc_id", "payload")
    val h = Multimodal.dHash(df, "payload").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach { id =>
      assert(h(id) === h(id % 10L),
        "same class must hash together despite per-doc pixel noise")
    }
    assert((0L until 10L).map(h).distinct.size === 10,
      "the ten classes must hash apart")
    // byte dedup would find NOTHING here — every payload is distinct
    assert((0L until 30L).map(id => synth(id).toSeq).distinct.size === 30)
    val junk = Seq((1L, "not an image".getBytes("UTF-8")),
      (2L, null: Array[Byte])).toDF("doc_id", "payload")
    val hj = Multimodal.dHash(junk, "payload").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(hj === Map(1L -> true, 2L -> true))
  }

  test("audioMeta and resize are total over null payload cells") {
    import spark.implicits._
    val wav = graft.operators.AudioCodec
      .encodePcm16Mono(8000, Array[Short](100, -100))
    val df = Seq((1L, wav), (2L, null: Array[Byte]))
      .toDF("doc_id", "payload")
    val meta = Multimodal.audioMeta(df, "payload").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(meta === Map(1L -> false, 2L -> true),
      "a null binary cell must yield the null stats row, not kill the stage")
    val resized = Multimodal.resize(df, "payload", factor = 2).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(resized === Map(1L -> false, 2L -> true))
  }
}
