package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine function registration through the public
  * SparkSessionExtensions injection point (wired in graft.Sessions).
  * SQL surface:
  *   graft_minhash_bands(baseHash, numHashes, bands) → array<bigint>
  *   graft_minhash_sig(shingles, numHashes)           → array<bigint>
  *   graft_minhash_band_mix(sig, bands)               → array<bigint>
  *   graft_simhash(wordHash)                          → bigint
  *   graft_simhash_of(words)                          → bigint
  *   graft_hash60(str)                                → bigint
  *   graft_cosine(vecA, vecB)                         → double
  *   graft_dot(vecA, vecB)                            → double
  *   graft_nearest_cell(vec, centroidMatrix)          → int
  *   graft_kmv(hash, k)                               → array<bigint>
  *   graft_cms(hash31, depth, width)                  → array<bigint>
  *   graft_bloom(hash31, numBits, numHashes)          → array<bigint>
  *   graft_bloom_contains(words, key, numBits, numHashes) → boolean
  *   graft_shingles(words, n)                         → array<string>
  *   graft_pos_fps(words, n)                          → array<struct<p,fp>>
  *   graft_shingle_tfs(words, n)                      → array<struct<sh,tf>>
  *   graft_nfc(str)                                   → string (UAX #15 NFC)
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandSketch].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) =>
        MinHashBandSketch(args(0),
          intLit(args(1), "numHashes"), intLit(args(2), "bands"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHashAgg(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_of"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash_of"),
      (args: Seq[Expression]) => SimHashSignature(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
      (args: Seq[Expression]) => Hash60(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSignature(args(0), intLit(args(1), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_band_mix"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_band_mix"),
      (args: Seq[Expression]) =>
        MinHashBands(args(0), intLit(args(1), "bands"))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
      (args: Seq[Expression]) => NearestCell(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_space_saving"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "graft_space_saving"),
      (args: Seq[Expression]) =>
        SpaceSavingAgg(args(0), intLit(args(1), "capacity"))))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv"),
      (args: Seq[Expression]) =>
        KmvAgg(args(0), intLit(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "graft_cms"),
      (args: Seq[Expression]) =>
        CountMinSketchAgg(args(0),
          intLit(args(1), "depth"), intLit(args(2), "width"))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom"),
      (args: Seq[Expression]) =>
        BloomFilterAgg(args(0),
          intLit(args(1), "numBits"), intLit(args(2), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (args: Seq[Expression]) =>
        BloomMightContain(args(0), args(1),
          intLit(args(2), "numBits"), intLit(args(3), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSetFromTokens].getName, "graft_shingles"),
      (args: Seq[Expression]) =>
        ShingleSetFromTokens(args(0), intLit(args(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("graft_pos_fps"),
      new ExpressionInfo(classOf[PositionalFingerprints].getName, "graft_pos_fps"),
      (args: Seq[Expression]) =>
        PositionalFingerprints(args(0), intLit(args(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_tfs"),
      new ExpressionInfo(classOf[ShingleTfs].getName, "graft_shingle_tfs"),
      (args: Seq[Expression]) =>
        ShingleTfs(args(0), intLit(args(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (args: Seq[Expression]) =>
        CdcChunks(args(0), intLit(args(1), "divisor"))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))
  }
}
