package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a decode/feature-extract
  * stage. The image path is REAL: [[ImageCodec]] parses binary PPM
  * (P6) and 24-bit uncompressed BMP payloads in pure JVM code — header
  * parse, dimension extraction, pixel decode, box-filter downsample —
  * so `resize` and `extractFeatures` do actual pixel work on decodable
  * payloads. The audio path is real too: [[AudioCodec]] parses
  * RIFF/WAVE PCM16 and [[audioMeta]] computes integer-exact per-clip
  * statistics. Payloads in formats this container has no codec for
  * (JPEG/PNG/MP3) fall back to a deterministic byte-level transform,
  * clearly marked below — a production deployment swaps that fallback
  * for a JNI/FFI codec with the same signature.
  *
  * Scale notes: payload bytes never leave the executor (no collect);
  * metadata extraction is codegen'd expressions over the binary column;
  * the decode stage is mapPartitions so decoder/model init amortizes
  * once per partition (the Scala analogue of a Pandas UDF over
  * mapInPandas batches).
  */
object Multimodal {

  /** Magic-byte format sniffing on a binary payload — real logic, the
    * kind a media lake runs on ingest. Prefixes are the public file
    * signatures (PNG/JPEG/RIFF-WAV/PDF). */
  def sniffFormat(payload: Column): Column = {
    def pfx(n: Int): Column = hex(substring(payload, 1, n))
    when(pfx(4) === "89504E47", "png")
      .when(pfx(2) === "FFD8", "jpeg")
      .when(pfx(4) === "52494646", "riff")
      .when(pfx(4) === "25504446", "pdf")
      .otherwise("unknown")
  }

  /** Typed metadata for an opaque payload: size, format tag, content
    * digest, and a fixed-stride sample digest ("frame" hashes — the
    * cheap integrity/dedup signal for media). */
  def withMediaMeta(df: DataFrame, payloadCol: String): DataFrame =
    df
      .withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      .withColumn("format", sniffFormat(col(payloadCol)))
      .withColumn("content_md5", md5(col(payloadCol)))
      .withColumn("frame0_md5", md5(substring(col(payloadCol), 1, 64)))
      .withColumn("frame1_md5", md5(substring(col(payloadCol), 65, 64)))

  /** Fixed-stride frame sampling: digest of each `frameBytes`-wide
    * slice, as an array column — the media analogue of "sample every
    * Nth frame and fingerprint it". Slices past the payload end digest
    * the empty slice (same on every engine). `payloadCol` is spliced
    * into a SQL lambda because `substring` with a computed position is
    * expression-level only. */
  def sampleFrames(df: DataFrame, payloadCol: String,
      frameBytes: Int, nFrames: Int): DataFrame =
    df.withColumn("frames", expr(
      s"transform(sequence(0, ${nFrames - 1}), " +
        s"i -> md5(substring($payloadCol, i * $frameBytes + 1, $frameBytes)))"))

  /** Feature-extraction stage. Decodable images (PPM/BMP via
    * [[ImageCodec]]) yield REAL pixel-derived features: a normalized
    * `dim`-bin luminance histogram — deterministic, pixel-exact, and
    * useful as a cheap perceptual signature. Non-image payloads fall
    * back to a deterministic byte-hash embedding (the stand-in for a
    * model forward pass on formats without an in-container codec).
    * The mapPartitions boundary, row schema, and per-partition
    * batching are the production shape either way.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withId = df.select(col("doc_id"), col(payloadCol).as("payload"))
    val out = withId
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would happen here (decoder handle, model)
        it.map { case (id, bytes) =>
          val feats = ImageCodec.decode(bytes) match {
            case Some(img) => luminanceHistogram(img, dim)
            case None      => hashFeatures(bytes, dim)
          }
          (id, feats)
        }
      }
      .toDF("doc_id", "features")
    out.withColumn("features", col("features").cast("array<float>"))
  }

  /** Resize stage: binary in, binary out, executed per-partition like
    * [[extractFeatures]]. Decodable images (PPM/BMP) get a REAL
    * box-filter downsample by `factor` and are re-encoded as binary
    * PPM (lossless raster container; see [[ImageCodec.encodePpm]]).
    * Payloads that are not decodable images fall back to byte
    * stride-sampling — a disclosed stand-in for codecs this container
    * lacks; a JPEG/video decoder plugs into the same match arm. */
  def resize(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val resized = ImageCodec.decode(bytes) match {
          case Some(img) => ImageCodec.encodePpm(ImageCodec.downsample(img, factor))
          case None      => if (bytes == null) null else strideSample(bytes, factor)
        }
        (id, resized)
      })
      .toDF("doc_id", "resized")
  }

  /** Real audio metadata + sample statistics over a binary payload
    * column: [[AudioCodec]] parses RIFF/WAVE PCM16 (header walk,
    * chunk skip, little-endian sample decode) and this stage reports
    * per-clip (n_samples, sample_rate, duration_us, sum_sq, peak) —
    * the ingest profile an audio lake computes per object. Total over
    * junk bytes: undecodable payloads yield null stats. Same decode
    * boundary as the image path: mapPartitions, payload bytes never
    * leave the executor, integer-exact statistics (sum of squares and
    * peak over 16-bit samples — no floating point, so the numbers are
    * partitioning- and engine-independent). */
  /** Perceptual difference-hash (dHash) over a binary image column —
    * the image-modality near-dup key: decode, box-resample to a 9×8
    * luminance grid ([[ImageCodec.gridResample]]; integer-exact), then
    * one bit per adjacent-pixel comparison (g[x+1] > g[x]) → a 64-bit
    * BIGINT. Perceptually-equal images (same content, small pixel
    * noise, different bytes) hash together while EXACT byte dedup
    * would not — n126 gates exactly that separation. Luminance is the
    * integer (299r + 587g + 114b)/1000 the feature path uses. Same
    * mapPartitions decode boundary as the other media ops; null and
    * undecodable payloads yield a null hash. */
  def dHash(df: DataFrame, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageCodec.decode(bytes) match {
          case Some(img) if img.width >= 9 && img.height >= 8 =>
            val g = ImageCodec.gridResample(img, 9, 8)
            var h = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val (r0, g0, b0) = g.rgb(x, y)
                val (r1, g1, b1) = g.rgb(x + 1, y)
                val l0 = (299 * r0 + 587 * g0 + 114 * b0) / 1000
                val l1 = (299 * r1 + 587 * g1 + 114 * b1) / 1000
                h = (h << 1) | (if (l1 > l0) 1L else 0L)
                x += 1
              }
              y += 1
            }
            (id, Some(h))
          case _ => (id, None)
        }
      })
      .toDF("doc_id", "phash")
  }

  def audioMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        AudioCodec.decode(bytes) match {
          case Some(pcm) =>
            var sumSq = 0L
            var peak = 0L
            pcm.samples.foreach { v =>
              sumSq += v.toLong * v.toLong
              if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
            }
            (id, Some(pcm.nFrames.toLong), Some(pcm.sampleRate.toLong),
              Some(pcm.nFrames.toLong * 1000000L / pcm.sampleRate),
              Some(sumSq), Some(peak))
          case None => (id, None, None, None, None, None)
        }
      })
      .toDF("doc_id", "n_samples", "sample_rate", "duration_us",
        "sum_sq", "peak")
  }

  /** Windowed audio energy segmentation over a binary WAV column — the
    * silence/activity profile a speech pipeline computes per clip
    * before any model touches it: fixed sample windows, integer
    * sum-of-squares energy per window, exact silence flag. Same
    * mapPartitions decode boundary and integer-exact discipline as
    * [[audioMeta]] (no floating point → partitioning- and
    * engine-independent numbers). Null or undecodable payloads emit no
    * windows (an activity profile of junk is the empty profile; the
    * clip-level null-stats row lives in audioMeta). */
  def audioEnergyWindows(
      df: DataFrame, payloadCol: String, windowSamples: Int): DataFrame = {
    require(windowSamples >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val pcm = if (bytes == null) None else AudioCodec.decode(bytes)
        pcm match {
          case Some(p) =>
            p.samples.grouped(windowSamples).zipWithIndex.map {
              case (w, wi) =>
                var sumSq = 0L
                w.foreach(v => sumSq += v.toLong * v.toLong)
                (id, wi.toLong, w.length.toLong, sumSq, sumSq == 0L)
            }
          case None => Iterator.empty
        }
      })
      .toDF("doc_id", "win", "n", "sum_sq", "is_silent")
  }

  /** Strided frame sampling + per-frame statistics over a binary video
    * column — the video-modality ingest profile: [[VideoCodec]] parses
    * the GVID raw-frame container (real header walk, bounds-checked
    * frame extraction) and every `stride`-th frame reports integer-
    * exact (n_pixels, sum_luma, peak_luma). Frame striding is THE
    * video-scale move: a training pipeline never featurizes every
    * frame, it samples (decode cost and output rows drop by the stride
    * factor before anything downstream runs). Same mapPartitions
    * decode boundary as [[audioMeta]]; payload bytes never leave the
    * executor; null/undecodable payloads emit no frames (the
    * audioEnergyWindows convention — a frame profile of junk is the
    * empty profile). */
  def videoFrameStats(
      df: DataFrame, payloadCol: String, stride: Int): DataFrame = {
    require(stride >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val clip = if (bytes == null) None else VideoCodec.decode(bytes)
        clip match {
          case Some(c) =>
            (0 until c.nFrames by stride).iterator.map { fi =>
              val frame = c.frames(fi)
              var sum = 0L
              var peak = 0L
              frame.foreach { b =>
                val v = (b & 0xff).toLong
                sum += v
                if (v > peak) peak = v
              }
              (id, c.nFrames.toLong, fi.toLong, frame.length.toLong, sum, peak)
            }
          case None => Iterator.empty
        }
      })
      .toDF("doc_id", "n_frames", "frame_idx", "n_pixels",
        "sum_luma", "peak_luma")
  }

  /** Fallback for non-image payloads: keep every `factor`-th byte.
    * Deterministic and size-reducing, so the pipeline stays total over
    * mixed-media corpora; real codecs replace this per-format. */
  private[operators] def strideSample(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Real pixel features: `dim`-bin histogram of Rec.601 luma
    * (0.299 R + 0.587 G + 0.114 B, integer arithmetic), normalized to
    * sum 1 — a compact, deterministic perceptual signature. */
  private[operators] def luminanceHistogram(
      img: ImageCodec.RawImage, dim: Int): Array[Float] = {
    val counts = new Array[Int](dim)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val o = i * 3
      val luma = (299 * (img.pixels(o) & 0xff) +
        587 * (img.pixels(o + 1) & 0xff) +
        114 * (img.pixels(o + 2) & 0xff)) / 1000 // 0..255
      counts(math.min(luma * dim / 256, dim - 1)) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = counts(j).toFloat / n; j += 1 }
    out
  }

  /** Fallback embedding for payloads without an in-container decoder:
    * deterministic bytes→floats (splitmix-style), payload-dependent. */
  private[operators] def hashFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1125899906842597L
    var i = 0
    while (i < bytes.length) { acc = acc * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      acc = acc * 6364136223846793005L + 1442695040888963407L
      out(j) = ((acc >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }
}
