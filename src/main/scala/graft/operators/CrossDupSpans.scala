package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicated-span operators — the decision signal and
  * the rewrite of exact-substring deduplication (Lee et al. 2021,
  * arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
  * Better", the ExactSubstr variant). [[coverage]] measures, per
  * document, the fraction of token positions covered by some n-gram
  * that also appears in at least one OTHER document — boilerplate,
  * licenses, templated headers; text a model would memorize because
  * the corpus repeats it across documents, not within one (n61 /
  * Gopher dup_ngram_frac is the within-doc axis). [[scrub]] applies
  * the dedup.
  *
  * (The full ExactSubstr algorithm builds a corpus suffix array; at
  * the fixed window length the covered-position set is identical to
  * this n-gram formulation, which distributes as plain relational
  * algebra — no suffix array needed.)
  *
  * Scale shape, stage by stage (the corpus TEXT never shuffles):
  *  1. positional n-gram fingerprints are a map-only per-row HOF
  *     projection (60-bit md5, the portable hash), shared by both
  *     downstream branches through ONE materialized (id, fps)
  *     projection — document text and tokens stay at the scan;
  *  2. the cross-doc test + keeper election is ONE fp-keyed aggregate:
  *     each doc contributes its per-row-DISTINCT fingerprints (an
  *     array_distinct, map-side — no (fp, doc) distinct shuffle), so
  *     count(*) IS the distinct-doc count and min(id) the keeper;
  *  3. occurrences equi-join the duplicated-fp set on the uniform
  *     hash key;
  *  4. matched positions collect per doc (bounded by doc length) and
  *     the interval-union expansion to covered positions happens
  *     IN-ROW — the ×n position blowup never enters an exchange.
  */
object CrossDupSpans {

  /** (tokenized base (id, ws, n), materialized fingerprint projection
    * (id, n, pf[])) shared by [[coverage]] and [[scrub]]. The cached
    * projection carries fingerprints and positions ONLY — at corpus
    * scale swap [[Materialize.shared]] for recomputation (two map
    * passes) if executor storage is tighter than CPU. */
  private def prepared(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): (DataFrame, DataFrame) = {
    require(n >= 2, s"span length must be >= 2: $n")
    val base = Partitioning.spread(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("graft__ws"))
      .withColumn("graft__n", size(col("graft__ws")).cast("long"))
    val pf = base
      .withColumn("graft__pf", expr(s"graft_pos_fps(graft__ws, $n)"))
      .select(col(idCol), col("graft__pf"))
    (base, Materialize.shared(pf))
  }

  /** The original SQL spelling of the positional-fingerprint stage —
    * kept as the parity witness for the fused codegen'd
    * [[graft.functions.PositionalFingerprints]] that replaced it (the
    * HOF chain is CodegenFallback and builds three strings per gram;
    * EngineLawsProps proves the fused form bit-equal). */
  private[graft] def posFpsHofSql(n: Int): String =
    s"""CASE WHEN size(graft__ws) >= $n THEN
       |  transform(sequence(1L, size(graft__ws) - ${n - 1}),
       |    p -> struct(p AS p, CAST(conv(substring(
       |           md5(array_join(slice(graft__ws, CAST(p AS INT), $n), ' ')),
       |           1, 15), 16, 10) AS BIGINT) AS fp))
       |ELSE CAST(array() AS ARRAY<STRUCT<p: BIGINT, fp: BIGINT>>) END"""
      .stripMargin

  /** The exploded (doc, pos, fp) occurrence stream. */
  private def occurrences(pf: DataFrame, idCol: String): DataFrame =
    pf.select(col(idCol), explode(col("graft__pf")).as("graft__g"))
      .select(col(idCol), col("graft__g.p").as("graft__p"),
        col("graft__g.fp").as("graft__fp"))

  /** Per-fp keeper + distinct-doc count in ONE exchange: per-row
    * array_distinct dedups a doc's fingerprints map-side, so the
    * grouped count is the distinct-doc count. Returns fps in >= 2
    * docs: (graft__fp, graft__keeper). */
  private def dupFpStats(pf: DataFrame, idCol: String): DataFrame =
    pf.select(col(idCol),
      explode(array_distinct(transform(col("graft__pf"),
        g => g.getField("fp")))).as("graft__fp"))
      .groupBy(col("graft__fp"))
      .agg(min(col(idCol)).as("graft__keeper"),
        count(lit(1)).as("graft__nd"))
      .filter(col("graft__nd") >= 2)
      .select(col("graft__fp"), col("graft__keeper"))

  /** Matched-position set per doc, expanded to the covered-position
    * array IN-ROW (the ×n position blowup never enters an exchange). */
  private def coveredPositions(
      occMatched: DataFrame, idCol: String, n: Int): DataFrame =
    occMatched
      .groupBy(col(idCol))
      .agg(collect_set(col("graft__p")).as("graft__ps"))
      .select(col(idCol),
        array_distinct(flatten(transform(col("graft__ps"),
          p => sequence(p, p + lit(n.toLong - 1))))).as("graft__cov"))

  /** (idCol, n_tokens, n_covered, dup_span_frac) for every doc. */
  def coverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val (base, pf) = prepared(docs, idCol, textCol, n)
    val dupFps = dupFpStats(pf, idCol).select(col("graft__fp"))
    val covered = coveredPositions(
      occurrences(pf, idCol).join(dupFps, Seq("graft__fp")), idCol, n)
      .select(col(idCol),
        size(col("graft__cov")).cast("long").as("graft__nc"))
    base
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("graft__n").as("n_tokens"),
        coalesce(col("graft__nc"), lit(0L)).as("n_covered"),
        (coalesce(col("graft__nc"), lit(0L)).cast("double") /
          col("graft__n")).as("dup_span_frac"))
  }

  /** The REWRITE half of exact-substring dedup (Lee et al. 2021 §4.2:
    * remove each duplicated substring from all but one occurrence):
    * every cross-doc duplicated n-gram keeps its occurrence in the
    * KEEPER document (min doc id containing the gram — deterministic)
    * and is scrubbed from every other document, dropping the covered
    * token positions. Output: (idCol, n_tokens, n_kept, clean_text)
    * for every document; `clean_text` is the kept tokens in order
    * (empty when everything was scrubbed — exact duplicates empty in
    * every non-keeper copy, the n1 semantics falling out of the span
    * rule).
    *
    * Scale shape beyond [[coverage]]'s: dropped positions collect per
    * doc (bounded by doc length) and join BACK to the tokenized scan
    * by id, so the rewrite itself is a per-row array filter — the
    * document text still never enters an exchange. */
  def scrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val (base, pf) = prepared(docs, idCol, textCol, n)
    val stats = dupFpStats(pf, idCol)
    val dropped = coveredPositions(
      occurrences(pf, idCol).join(stats, Seq("graft__fp"))
        .filter(col(idCol) =!= col("graft__keeper")),
      idCol, n)
    base
      .join(dropped, Seq(idCol), "left")
      // hash-set subtraction (array_except), not a per-position
      // array_contains probe — O(n + |cov|) per doc, not O(n·|cov|);
      // sequence has no duplicates so except ≡ ordered filter
      .withColumn("graft__keep",
        array_except(sequence(lit(1L), col("graft__n")),
          coalesce(col("graft__cov"),
            expr("CAST(array() AS ARRAY<BIGINT>)"))))
      .select(col(idCol), col("graft__n").as("n_tokens"),
        size(col("graft__keep")).cast("long").as("n_kept"),
        concat_ws(" ", transform(col("graft__keep"),
          p => element_at(col("graft__ws"), p.cast("int")))).as("clean_text"))
  }
}
