package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Pixel-level tests for the pure-JVM codec over the checked-in
  * fixtures (tools/make_image_fixtures.py): an 8x6 gradient where
  * pixel (x, y) = (R = 30x, G = 40y, B = 10(x+y)) — every assertion
  * below re-derives values from that closed form independently of the
  * decoder. */
class ImageCodecSpec extends SparkTestBase {

  private def bytesOf(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(fixture(name)))

  private def expectedRgb(x: Int, y: Int): (Int, Int, Int) =
    (30 * x, 40 * y, 10 * (x + y))

  test("decodeBmp24 parses the fixture: header, dims, bottom-up BGR rows") {
    val img = ImageCodec.decode(bytesOf("gradient.bmp")).get
    assert(img.width === 8 && img.height === 6)
    for (y <- 0 until 6; x <- 0 until 8)
      assert(img.rgb(x, y) === expectedRgb(x, y), s"at ($x,$y)")
  }

  test("decodePpm parses the fixture: comment line, dims, raw RGB") {
    val img = ImageCodec.decode(bytesOf("gradient.ppm")).get
    assert(img.width === 8 && img.height === 6)
    for (y <- 0 until 6; x <- 0 until 8)
      assert(img.rgb(x, y) === expectedRgb(x, y), s"at ($x,$y)")
  }

  test("BMP and PPM fixtures decode to the identical raster") {
    val a = ImageCodec.decode(bytesOf("gradient.bmp")).get
    val b = ImageCodec.decode(bytesOf("gradient.ppm")).get
    assert(a.pixels.toSeq === b.pixels.toSeq)
  }

  test("downsample by 2 box-averages pixels (closed-form check)") {
    val img = ImageCodec.decode(bytesOf("gradient.ppm")).get
    val small = ImageCodec.downsample(img, 2)
    assert(small.width === 4 && small.height === 3)
    // mean of {30*2ox, 30*(2ox+1)} over a 2x2 block rounds to 60ox+15;
    // G likewise 80oy+20; B = 10*(2ox+2oy)+10.
    for (oy <- 0 until 3; ox <- 0 until 4)
      assert(small.rgb(ox, oy) === (60 * ox + 15, 80 * oy + 20, 20 * ox + 20 * oy + 10),
        s"at ($ox,$oy)")
  }

  test("downsample handles non-dividing edges by averaging what exists") {
    val img = ImageCodec.decode(bytesOf("gradient.ppm")).get // 8x6
    val small = ImageCodec.downsample(img, 3) // -> 3x2; last col block is 2 wide
    assert(small.width === 3 && small.height === 2)
    // output (2,0): x in {6,7}, y in {0,1,2} -> R mean = 30*6.5 = 195
    val (r, g, b) = small.rgb(2, 0)
    assert(r === 195)
    assert(g === 40) // y mean = 1 -> 40
    // B mean over x in {6,7}, y in {0,1,2}: 10*(x+y), mean = 10*(6.5+1) = 75
    assert(b === 75)
  }

  test("encodePpm/encodeBmp24 round-trip the raster losslessly") {
    val img = ImageCodec.decode(bytesOf("gradient.bmp")).get
    val viaPpm = ImageCodec.decode(ImageCodec.encodePpm(img)).get
    val viaBmp = ImageCodec.decode(ImageCodec.encodeBmp24(img)).get
    assert(viaPpm.width === img.width && viaPpm.height === img.height)
    assert(viaPpm.pixels.toSeq === img.pixels.toSeq)
    assert(viaBmp.pixels.toSeq === img.pixels.toSeq)
  }

  test("PPM maxval < 255 rescales samples to the canonical range") {
    // 1x1 pixel, maxval 100, sample 50 -> (50*255 + 50)/100 = 128
    val bytes = "P6\n1 1\n100\n".getBytes("US-ASCII") ++ Array[Byte](50, 100, 0)
    val img = ImageCodec.decodePpm(bytes).get
    assert(img.rgb(0, 0) === (128, 255, 0))
  }

  test("malformed payloads return None instead of mis-decoding") {
    assert(ImageCodec.decode("hello world".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode("P6\n4 4\n255\nxx".getBytes("UTF-8")).isEmpty) // truncated raster
    assert(ImageCodec.decode("P6\n0 4\n255\n".getBytes("UTF-8")).isEmpty) // zero dim
    assert(ImageCodec.decode("P6\n1 1\n65535\n".getBytes("UTF-8")).isEmpty) // 2-byte samples
    assert(ImageCodec.decode(Array[Byte]('B', 'M', 1, 2, 3)).isEmpty) // truncated BMP
    val bmp8bpp = bytesOf("gradient.bmp").clone()
    bmp8bpp(28) = 8 // claim 8 bpp -> unsupported, must refuse
    assert(ImageCodec.decode(bmp8bpp).isEmpty)
  }
}
