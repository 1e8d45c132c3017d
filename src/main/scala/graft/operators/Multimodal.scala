package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a decode/feature-extract
  * stage whose Spark-side shape (schema, batching, partitioning) is
  * real while the codec itself is STUBBED — this container has no
  * image/audio libraries, so `decodeStub` below is a deterministic
  * fake standing in for a JNI/FFI decoder. Everything around it
  * (binary columns, fixed-stride frame sampling, per-partition batch
  * processing, explicit output schema) is the production plumbing.
  *
  * Scale notes: payload bytes never leave the executor (no collect);
  * metadata extraction is codegen'd expressions over the binary column;
  * the decode stage is mapPartitions so a real decoder would amortize
  * model/codec init once per partition (the Scala analogue of a Pandas
  * UDF over mapInPandas batches).
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

  /** Feature-extraction stage with a STUBBED decoder.
    *
    * Real deployment: replace `decodeStub` with the codec/model call;
    * the mapPartitions boundary, row schema, and per-partition batching
    * are unchanged. The stub derives `dim` deterministic floats from the
    * payload bytes so tests exercise the full plumbing end-to-end.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withId = df.select(col("doc_id"), col(payloadCol).as("payload"))
    val out = withId
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would happen here (decoder handle, model)
        it.map { case (id, bytes) => (id, decodeStub(bytes, dim)) }
      }
      .toDF("doc_id", "features")
    out.withColumn("features", col("features").cast("array<float>"))
  }

  /** Resize stage with a STUBBED transform: binary in, binary out,
    * executed per-partition like [[extractFeatures]]. The stub
    * stride-samples every `factor`-th byte — a real image resize
    * (libvips/PIL equivalent) plugs in with the same signature and the
    * Spark-side shape (schema, partition batching) is unchanged. */
  def resize(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, resizeStub(bytes, factor)) })
      .toDF("doc_id", "resized")
  }

  private[operators] def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** STUB decoder — deterministic bytes→features fake. A real decoder
    * (libjpeg/ffmpeg/model forward pass) plugs in with this signature. */
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
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
