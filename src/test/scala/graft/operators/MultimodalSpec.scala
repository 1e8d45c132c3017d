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
