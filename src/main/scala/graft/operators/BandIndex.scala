package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored MinHash band index — the warehouse layout behind INCREMENTAL
  * near-duplicate detection (the s23/s26/s28 stored-layout discipline
  * applied to the near-dup family).
  *
  * [[MinHashNearDup]] answers "which pairs in THIS corpus are near-dups"
  * in one job; a production ingest asks a different question every
  * batch: "which docs of this delta near-duplicate something ALREADY IN
  * the corpus?" Re-sketching the indexed corpus per batch is the n50
  * anti-pattern (the incremental-dedup lesson, applied to LSH). The
  * index stores what the corpus side of the band join and the sketch
  * prefilter need, computed once at build:
  *
  *  - `postings/` (band_val, doc_id) partitioned by `band` — the LSH
  *    bucket membership relation. The delta probe joins it on
  *    (band, band_val); partition dirs keep each band's postings
  *    co-located, rows sorted by band_val for row-group pruning.
  *  - `sigs/` (doc_id, sig) — the k-minima signatures backing the
  *    estimate prefilter, joined candidate-sized only.
  *  - `meta/` one row (num_hashes, bands, shingle_n) — the index is
  *    self-describing (the round-11 LexicalIndex lesson: a disagreeing
  *    caller parameter must not be possible).
  *
  * The probe never reads corpus TEXT except in the final exact-verify
  * stage, and there only candidate-sized: the candidate corpus ids are
  * semi-joined back onto the corpus (the n132 rehydration pattern), so
  * the text re-shingled per batch is O(candidates), not O(corpus).
  * Exchanges carry ids, band longs and signatures — never text
  * (plan-pinned in QueryPlansSpec).
  *
  * 100 TB shape: build is the one corpus-sized pass (map-only sketches,
  * one partitioned write); per-batch probe cost is delta-sized sketching
  * + a join against the pruned posting partitions + candidate-sized
  * verify. Appending the delta's own postings afterwards (so the next
  * batch sees it) is `append`, delta-sized, LSM-free because postings
  * are immutable facts.
  */
object BandIndex {

  /** Sketch the corpus ONCE and write the postings/sigs/meta layout. */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sk = sketch(docs, idCol, textCol, shingleWidth, numHashes, bands)
    sk.select(col("doc_id"), col("sig"))
      .write.mode("overwrite").parquet(s"$path/sigs")
    sk.select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "band_val")))
      .repartition(col("band"))
      .sortWithinPartitions(col("band_val"))
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$path/postings")
    docs.sparkSession.range(1)
      .select(lit(numHashes.toLong).as("num_hashes"),
        lit(bands.toLong).as("bands"),
        lit(shingleWidth.toLong).as("shingle_n"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Index the delta batch too (the next batch must see this one):
    * postings/sigs are immutable append-only facts — delta-sized
    * appends, no merge, no read-side fold. */
  def append(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = delta.sparkSession
    val (numHashes, bands, shingleWidth) = metaOf(spark, path)
    val sk = sketch(delta, idCol, textCol, shingleWidth, numHashes, bands)
    sk.select(col("doc_id"), col("sig"))
      .write.mode("append").parquet(s"$path/sigs")
    sk.select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "band_val")))
      .repartition(col("band"))
      .sortWithinPartitions(col("band_val"))
      .write.mode("append").partitionBy("band")
      .parquet(s"$path/postings")
  }

  /** Delta-vs-corpus near-dup pairs served from the stored index:
    * (delta_id, corpus_id, jaccard) for every delta doc whose exact
    * word-shingle Jaccard against an indexed doc reaches `threshold`
    * (up to the LSH band geometry's negligible false-negative mass —
    * the [[MinHashNearDup]] probabilistic contract; false positives are
    * removed by the exact verify). `corpus` is the indexed relation the
    * candidate TEXT rehydrates from; only candidate ids touch it.
    */
  def probe(
      corpus: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      threshold: Double): DataFrame = {
    val spark = delta.sparkSession
    val (numHashes, bands, shingleWidth) = metaOf(spark, path)

    // delta side: map-only fused sketch + its shingle sets, computed
    // once and reused by the prefilter and the exact verify
    val dsk = Materialize.shared(
      delta
        .select(col(idCol).as("delta_id"),
          TextOps.tokens(col(textCol)).as("graft__ws"))
        .select(col("delta_id"),
          TextOps.shinglesFromTokens(col("graft__ws"), shingleWidth).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("delta_id"), col("sh"),
          expr(s"graft_minhash_sig(sh, $numHashes)").as("sig"))
        .withColumn("bh", expr(s"graft_minhash_band_mix(sig, $bands)")))

    val deltaBands = dsk
      .select(col("delta_id"), posexplode(col("bh")).as(Seq("band", "band_val")))

    // the band join against the STORED postings — the only stage that
    // touches the index's corpus-sized relation, and it reads two longs
    // + an id per row
    val candidates = deltaBands
      .join(postings(spark, path),
        Seq("band", "band_val"))
      .select(col("delta_id"), col("doc_id").as("corpus_id"))
      .distinct()

    // sketch-estimate prefilter (MinHashNearDup's 2.5σ margin) — the
    // corpus signatures come from the index, candidate-sized
    val sigMargin = 2.5 * math.sqrt(threshold * (1 - threshold) / numHashes)
    val minMatches = math.floor((threshold - sigMargin) * numHashes).toLong
    val plausible = candidates
      .join(dsk.select(col("delta_id"), col("sig").as("sig_d")), "delta_id")
      .join(spark.read.parquet(s"$path/sigs")
        .select(col("doc_id").as("corpus_id"), col("sig").as("sig_c")),
        "corpus_id")
      .withColumn("est",
        expr("size(filter(zip_with(sig_d, sig_c, (x, y) -> x = y), v -> v))"))
      .filter(col("est") >= minMatches)
      .select(col("delta_id"), col("corpus_id"))

    // exact verify: corpus text rehydrated CANDIDATE-sized (semi-join on
    // the candidate ids), then the exact integer Jaccard
    val candCorpus = corpus
      .join(plausible.select(col("corpus_id")).distinct(),
        col(idCol) === col("corpus_id"), "left_semi")
      .select(col(idCol).as("corpus_id"),
        TextOps.shinglesFromTokens(
          TextOps.tokens(col(textCol)), shingleWidth).as("sh_c"))

    plausible
      .join(dsk.select(col("delta_id"), col("sh").as("sh_d")), "delta_id")
      .join(candCorpus, "corpus_id")
      .withColumn("inter",
        size(array_intersect(col("sh_d"), col("sh_c"))).cast("long"))
      .withColumn("uni",
        size(col("sh_d")).cast("long") + size(col("sh_c")).cast("long") -
          col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("delta_id"), col("corpus_id"), col("jaccard"))
  }

  /** The stored band-membership relation (band, band_val, doc_id). */
  def postings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/postings")

  private def metaOf(spark: SparkSession, path: String): (Int, Int, Int) = {
    // one row of layout constants — plan-time metadata, like the s23
    // probe-set derivation
    val m = spark.read.parquet(s"$path/meta").head()
    (m.getAs[Long]("num_hashes").toInt, m.getAs[Long]("bands").toInt,
      m.getAs[Long]("shingle_n").toInt)
  }

  private def sketch(
      docs: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int, numHashes: Int, bands: Int): DataFrame =
    Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("graft__ws"))
      .select(col("doc_id"),
        TextOps.shinglesFromTokens(col("graft__ws"), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        expr(s"graft_minhash_sig(sh, $numHashes)").as("sig"))
      .withColumn("bh", expr(s"graft_minhash_band_mix(sig, $bands)"))
}
