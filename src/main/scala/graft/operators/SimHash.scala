package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 60-bit SimHash near-duplicate detection over word sets.
  *
  * Per document: every distinct word votes ±1 on each of 60 bit
  * positions (sign of the bit in the word's 60-bit md5-derived hash);
  * the simhash sets bit i iff the vote sum is positive. Similar word
  * sets differ in few votes, so near-duplicates land within a small
  * Hamming distance.
  *
  * Pair generation is exact, not probabilistic: the 60 bits are split
  * into 4 bands of 15; two hashes within Hamming distance 3 must agree
  * on at least one whole band (pigeonhole), so the band-bucket self-join
  * has zero false negatives for maxHamming ≤ 3 and the final
  * bit_count(xor) filter removes false positives. Same scale shape as
  * MinHash LSH: cost is quadratic only within a bucket.
  *
  * The word hash is md5-derived (TextOps.hexHash60), deliberately
  * engine-portable so the DuckDB oracle reproduces the simhash values
  * bit-for-bit (NorthStar n13 builds the mirror SQL programmatically).
  */
object SimHash {
  // 60 bits = full width of the portable md5-prefix word hash. The
  // earlier 32-bit/8-bit-band variant saturated its 4x256-bucket band
  // space once the corpus passed ~100k docs (the 100x drill measured
  // the band join going quadratic, 112x wall at 100x rows); 15-bit
  // bands keep expected bucket occupancy ~n/131k, and hamming<=3 over
  // a wider fingerprint is the standard Manku-et-al operating point.
  val bits = 60
  val bandCount = 4
  private val bandBits = bits / bandCount

  /** (id, simhash) with simhash in [0, 2^60).
    *
    * MAP-ONLY: one fused per-row loop (graft.functions.SimHashSignature
    * — per-row word dedup, portable md5-derived 60-bit word hash, 60
    * bit votes) replaces the explode → (doc, word) distinct → per-doc
    * vote aggregation, which shuffled one row per word occurrence
    * twice before any pairing work. Values are bit-identical (votes
    * commute; parity law in EngineLawsProps), so the DuckDB oracle's
    * mirrored votes still agree. The empty-token filter reproduces
    * explode's drop of empty/null token arrays. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("graft__ws"))
      .filter(size(col("graft__ws")) > 0)
      .select(col("doc_id"), expr("graft_simhash_of(graft__ws)").as("simhash"))

  /** Pairs within `maxHamming` (≤ 3 for exhaustive recall with 4 bands). */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bandCount,
      s"pigeonhole recall needs maxHamming < $bandCount bands")
    // Persisted: the band self-join references it on both sides; one
    // long per doc, so the cache is metadata-sized. Released by the
    // runner sweep (Materialize scaladoc — the shared release contract).
    val sh = Materialize.shared(simhash(docs, idCol, textCol))

    val banded = sh.select(
      col("doc_id") +: col("simhash") +:
        (0 until bandCount).map { b =>
          shiftright(col("simhash"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as(s"band$b")
        }: _*)
      .unpivot(
        Array(col("doc_id"), col("simhash")),
        (0 until bandCount).map(b => col(s"band$b")).toArray,
        "band", "band_val")

    banded.alias("l")
      .join(
        banded.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
