package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection via MinHash + banded LSH over word-shingle
  * sets — candidate pairs come only from shared LSH buckets, never from
  * an all-pairs product, and every candidate is verified with the exact
  * Jaccard before it is reported.
  *
  * Scale design (the whole point of the banding):
  *  - signatures: a map-only fused fold over each doc's shingle array
  *    (codegen'd MinHashSignature + MinHashBands) — no explode, no
  *    per-doc aggregation shuffle; the first exchange in the operator
  *    is the banded bucket join itself;
  *  - candidates: self-join on (band, bandValue) — cost is quadratic
  *    only within a bucket, and bucket sizes concentrate sharply for
  *    non-duplicate docs (expected pair count ≈ duplicates + noise);
  *  - verification: joins shingle sets only for candidate pairs.
  *  At 100 TB none of the stages materializes anything driver-side and
  *  every shuffle key (doc_id, band value) is high-cardinality/uniform.
  *
  * Probabilistic contract: with the default k=64 hashes in 16 bands ×
  * 4 rows the s-curve threshold is ≈0.5; a pair at Jaccard 0.8 is
  * missed with probability (1-0.8^4)^16 ≈ 2e-4, and pairs well above
  * the threshold essentially never. The signature prefilter adds
  * ~1e-3 miss mass for pairs AT the threshold (2.5σ cutoff), and the
  * exact-Jaccard filter removes all false positives, so output =
  * {pairs with J ≥ threshold} up to negligible false-negative mass
  * (the DuckDB oracle computes the exact set; see NorthStar n3).
  *
  * MinHash functions are xxhash64-based — engine-local is fine because
  * candidates are an internal detail; only the exact Jaccard (integer
  * arithmetic) must match the oracle.
  *
  * Resource note: the operator persists two small intermediates (the
  * shingle sets and the banded signatures) because both feed multiple
  * downstream branches; callers running many operators in one session
  * should release them afterwards (`spark.catalog.clearCache()` —
  * Verify/Bench do this between queries) or unpersist via the plans.
  */
object MinHashNearDup {

  /** How the two multiply-consumed intermediates (shingle sets, banded
    * signatures) are materialized. Takes (relation, short name), returns
    * the relation to read downstream. */
  type Materializer = (DataFrame, String) => DataFrame

  /** Default: executor cache, spilling to disk rather than OOMing
    * (release contract in [[Materialize]]). */
  val cacheMaterializer: Materializer = (df, _) => Materialize.shared(df)

  /** 100 TB variant: write the intermediate through a staging table and
    * read it back — unlike a cache this survives executor loss, frees
    * the memory a corpus-sized cache would pin, and lets the downstream
    * branches scan a properly partitioned parquet relation. Tables are
    * named `<prefix><name>` and overwritten per run (Warehouse.stage is
    * idempotent DELETE+COPY). */
  def stagedMaterializer(prefix: String): Materializer = (df, name) => {
    val table = s"$prefix$name"
    graft.warehouse.Warehouse.stage(df, table)
    df.sparkSession.table(table)
  }

  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      materialize: Materializer = cacheMaterializer): DataFrame =
    nearDupPairsFromTokens(
      Partitioning.spread(docs)
        .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("ws")),
      threshold, shingleWidth, numHashes, bands, materialize)

  /** Same contract over a pre-tokenized (doc_id, ws) relation — the
    * pipeline entry point: CorpusPipeline tokenizes the corpus ONCE and
    * feeds the same materialized relation here, to decontamination and
    * to the token gate, instead of each stage re-scanning and
    * re-splitting the text. */
  def nearDupPairsFromTokens(
      toks: DataFrame,
      threshold: Double,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      materialize: Materializer = cacheMaterializer): DataFrame =
    stages(toks, threshold, shingleWidth, numHashes, bands, materialize)
      .verified

  /** The operator's three stage relations, for drills/diagnostics that
    * decompose wall time into workload growth (candidate/verified pair
    * counts) vs machinery cost: `candidates` is the post-bucket-join
    * distinct pair set, `plausible` the sketch-prefilter survivors,
    * `verified` the exact-Jaccard output (what [[nearDupPairsFromTokens]]
    * returns). Counting a stage re-executes the plan up to it — drill
    * cost, not production cost. */
  private[graft] final case class Stages(
      candidates: DataFrame, plausible: DataFrame, verified: DataFrame)

  private[graft] def stages(
      toks: DataFrame,
      threshold: Double,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      materialize: Materializer = cacheMaterializer): Stages = {
    require(numHashes % bands == 0, "bands must divide numHashes")

    // Materialized: referenced by the signature path AND both sides of
    // the exact-verify join — without materialization Spark would
    // recompute the scan→tokenize→shingle subtree three times. The
    // relation is (id, shingle array), ~the corpus size; the default
    // cache spills rather than OOMs, and a 100 TB deployment passes
    // `stagedMaterializer` to swap it for a staging table.
    val shingled = materialize(
      toks
        .select(col("doc_id"),
          TextOps.shinglesFromTokens(col("ws"), shingleWidth).as("sh"))
        .filter(size(col("sh")) > 0),
      "shingled")

    // Sketches are MAP-ONLY: the fused codegen'd per-row fold
    // (graft.functions.MinHashSignature — hash each shingle once,
    // update all k minima in place) plus the native FNV band mix
    // (graft.functions.MinHashBands). Bit-identical to the former
    // explode → graft_minhash_bands aggregation (EngineLawsProps
    // parity law) but with no shingle explode and NO SHUFFLE — at
    // corpus scale the per-doc aggregation exchange (one row per
    // shingle into a hash partitioning) was the stage's entire
    // data movement.
    //
    // Materialized: the signature table feeds the bucket self-join (both
    // sides) AND the estimate prefilter; without it each branch would
    // recompute the whole scan→shingle→hash→sketch chain.
    // numHashes+bands longs per doc — tiny.
    val sketches = materialize(
      shingled
        .select(col("doc_id"),
          expr(s"graft_minhash_sig(sh, $numHashes)").as("sig"))
        .withColumn("bh", expr(s"graft_minhash_band_mix(sig, $bands)")),
      "sketches")

    stagesFromSketched(shingled, sketches, threshold, numHashes)
  }

  /** Within-set pairs over an ALREADY-materialized (doc_id, sh, sig,
    * bh) sketch relation — the shared-sketch entry point: a caller
    * that already sketched the docs for another stage (the registry's
    * ingest sketches its delta ONCE for the index probe, this
    * within-delta join, and the index append) reuses that relation
    * instead of re-running the scan→shingle→sketch chain per
    * consumer. Same contract as [[nearDupPairs]]; the relation must
    * come from [[BandIndex.sketchRelation]] (or equal construction)
    * with the SAME numHashes/bands the caller compares against. */
  private[graft] def pairsFromSketched(
      sk: DataFrame, threshold: Double, numHashes: Int): DataFrame =
    stagesFromSketched(
      sk.select(col("doc_id"), col("sh")),
      sk.select(col("doc_id"), col("sig"), col("bh")),
      threshold, numHashes).verified

  private def stagesFromSketched(
      shingled: DataFrame,
      sketches: DataFrame,
      threshold: Double,
      numHashes: Int): Stages = {
    val banded = sketches
      .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "band_val")))

    val candidates = banded.alias("l")
      .join(
        banded.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()

    // Sketch-estimate prefilter: matching signature positions estimate
    // Jaccard with σ = sqrt(J(1-J)/k); filtering 2.5σ under the
    // threshold keeps true pairs (miss mass ~1e-3 AT the threshold,
    // far less above it) while discarding the background candidates
    // that band collisions admit — the verify stage then touches the
    // heavy shingle arrays only for plausible pairs. This matters when
    // the corpus has nontrivial baseline similarity (bigrams, small
    // vocabularies): band geometry alone can admit a candidate flood.
    val sigMargin = 2.5 * math.sqrt(threshold * (1 - threshold) / numHashes)
    val minMatches = math.floor((threshold - sigMargin) * numHashes).toLong
    val sigA = sketches.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val sigB = sketches.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val plausible = candidates
      .join(sigA, "id_a")
      .join(sigB, "id_b")
      .withColumn("est",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"))
      .filter(col("est") >= minMatches)
      .select(col("id_a"), col("id_b"))

    val setsA = shingled.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val setsB = shingled.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))

    val verified = plausible
      .join(setsA, "id_a")
      .join(setsB, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

    Stages(candidates, plausible, verified)
  }
}
