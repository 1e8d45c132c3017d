package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that is
  * NOT near-dup dedup: flag corpus documents sharing any word n-gram
  * with a benchmark/eval set, so eval data never leaks into training.
  * (Standard practice since GPT-2/C4: exact long-n-gram collision, no
  * similarity threshold — one shared n-gram is already contamination.)
  *
  * Scale design: the benchmark side is an eval suite — thousands of
  * documents against a 100 TB corpus — so its distinct shingle set is
  * broadcast and the corpus side never shuffles: tokenize → shingle →
  * explode → broadcast-hash semi-lookup, all partition-local. If the
  * benchmark outgrows broadcast size, the same plan degrades gracefully
  * to a shuffle join on the shingle (or a bloom-filter prefilter +
  * exact confirm); the corpus is still read exactly once.
  */
object Decontaminate {

  /** Per-contaminated-doc collision stats against the benchmark.
    *
    * @return (doc_id, n_hits, n_shingles, hit_ratio) — one row per
    *         corpus doc with ≥1 shared n-gram; `hit_ratio` is the
    *         exact-integer ratio hits/shingles (bit-identical across
    *         engines).
    */
  def collisionStats(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    collisionStatsFromTokens(
      corpus
        .withColumn("graft__ws", TextOps.tokens(col(textCol)))
        .select(col(idCol).as("doc_id"), col("graft__ws").as("ws")),
      benchmark, textCol, n)

  /** Same contract with the CORPUS side pre-tokenized as (doc_id, ws) —
    * the pipeline entry point (one corpus tokenization shared across
    * stages; see CorpusPipeline). The benchmark side stays textual: an
    * eval suite is thousands of rows, its tokenization is free.
    */
  def collisionStatsFromTokens(
      corpusToks: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      n: Int): DataFrame = {
    val benchShingles = benchmark
      .withColumn("graft__ws", TextOps.tokens(col(textCol)))
      .select(
        explode(TextOps.shinglesFromTokens(col("graft__ws"), n)).as("shingle"))
      .distinct()
      .withColumn("graft__hit", lit(1))

    // ONE corpus pass: the broadcast left-lookup tags hits in place, so
    // totals and hit counts come out of the same partition-local
    // aggregation — no second scan, no extra shuffle.
    corpusToks
      .select(col("doc_id"),
        explode(TextOps.shinglesFromTokens(col("ws"), n)).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("graft__hit")).as("n_hits"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        (col("n_hits").cast("double") / col("n_shingles")).as("hit_ratio"))
  }

  /** Per-document NOVELTY against a reference corpus: the fraction of a
    * doc's distinct n-gram shingles absent from the reference — the
    * "new information rate" a curation pass ranks by (the inverse of
    * [[collisionStats]]'s contamination view, against a different-sized
    * opponent: an eval benchmark broadcasts, a REFERENCE CORPUS does
    * not). Lookup is therefore a distributed fp-keyed semi-join —
    * shuffle rows are (fp[, doc_id, n]) longs, text never in an
    * exchange; at 100 TB put a broadcast Bloom of the reference fps
    * below the join (the n51 machinery) so most probes never shuffle.
    *
    * Emits (doc_id, n_sh, n_new, novelty) for every scored doc with at
    * least one shingle; novelty is the exact-integer ratio.
    */
  def noveltyScore(
      scored: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    def shingled(df: DataFrame) = Partitioning.spread(df)
      .select(col(idCol).as("doc_id"),
        TextOps.shinglesFromTokens(TextOps.tokens(col(textCol)), n).as("sh"))
      .filter(size(col("sh")) > 0)

    val base = shingled(scored)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"),
        col("sh"))
    val scoredFps = base
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), TextOps.hexHash60(col("g")).as("fp"))
    val refFps = shingled(reference)
      .select(explode(col("sh")).as("g"))
      .select(TextOps.hexHash60(col("g")).as("fp"))
      .distinct()

    val nSeen = scoredFps
      .join(refFps, Seq("fp"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("graft__n_seen"))

    base.select(col("doc_id"), col("n_sh"))
      .join(nSeen, Seq("doc_id"), "left")
      .withColumn("n_new",
        col("n_sh") - coalesce(col("graft__n_seen"), lit(0L)))
      .select(col("doc_id"), col("n_sh"), col("n_new"),
        (col("n_new").cast("double") / col("n_sh")).as("novelty"))
  }
}
