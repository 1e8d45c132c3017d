package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document duplicated-span coverage — the decision signal of
  * exact-substring deduplication (Lee et al. 2021, arXiv:2107.06499
  * "Deduplicating Training Data Makes Language Models Better", the
  * ExactSubstr variant): for every document, the fraction of its token
  * positions covered by some n-gram that also appears in at least one
  * OTHER document. Complements the within-document repetition signal
  * (n61 / Gopher dup_ngram_frac): this one catches boilerplate,
  * licenses, templated headers — text a model would memorize because
  * the corpus repeats it across documents, not within one.
  *
  * (The full ExactSubstr algorithm builds a corpus suffix array; at the
  * fixed window length the set of covered positions is identical to
  * this n-gram formulation, which distributes as plain relational
  * algebra — no suffix array needed.)
  *
  * Scale shape, stage by stage (the corpus TEXT never shuffles):
  *  1. positional n-gram fingerprints are a map-only per-row HOF
  *     projection (60-bit md5, the portable hash);
  *  2. the cross-doc test is a two-level aggregate — distinct
  *     (fp, doc) then fp → doc-count — whose exchanges carry pairs of
  *     longs with map-side partials;
  *  3. occurrences semi-join the duplicated-fp set on fp (equi,
  *     uniform key: fingerprints are hashes);
  *  4. coverage collects each doc's MATCHED positions only (bounded by
  *     doc length) and the interval union [p, p+n-1] is a per-row
  *     array expression — the position blowup never enters an
  *     exchange.
  */
object CrossDupSpans {

  /** (idCol, n_tokens, n_covered, dup_span_frac) for every doc. */
  def coverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span length must be >= 2: $n")
    val base = Partitioning.spread(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("graft__ws"))
      .withColumn("graft__n", size(col("graft__ws")).cast("long"))
    // positional fingerprints, exploded to the (doc, pos, fp) stream
    val occ = base
      .withColumn("graft__pf", expr(
        s"""CASE WHEN graft__n >= $n THEN
           |  transform(sequence(1L, graft__n - ${n - 1}),
           |    p -> struct(p AS p, CAST(conv(substring(
           |           md5(array_join(slice(graft__ws, CAST(p AS INT), $n), ' ')),
           |           1, 15), 16, 10) AS BIGINT) AS fp))
           |ELSE CAST(array() AS ARRAY<STRUCT<p: BIGINT, fp: BIGINT>>) END"""
          .stripMargin))
      .select(col(idCol), explode(col("graft__pf")).as("graft__g"))
      .select(col(idCol), col("graft__g.p").as("graft__p"),
        col("graft__g.fp").as("graft__fp"))
    // fingerprints seen in >= 2 distinct docs (two-level: the distinct
    // bounds any hot fingerprint's contribution at one row per doc)
    val dupFps = occ.select(col("graft__fp"), col(idCol)).distinct()
      .groupBy(col("graft__fp"))
      .agg(count(lit(1)).as("graft__nd"))
      .filter(col("graft__nd") >= 2)
      .select(col("graft__fp"))
    // matched positions per doc; interval union as a per-row array op
    val covered = occ
      .join(dupFps, Seq("graft__fp"))
      .groupBy(col(idCol))
      .agg(collect_set(col("graft__p")).as("graft__ps"))
      .select(col(idCol),
        size(array_distinct(flatten(transform(col("graft__ps"),
          p => sequence(p, p + lit(n.toLong - 1)))))).cast("long")
          .as("graft__nc"))
    base
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("graft__n").as("n_tokens"),
        coalesce(col("graft__nc"), lit(0L)).as("n_covered"),
        (coalesce(col("graft__nc"), lit(0L)).cast("double") /
          col("graft__n")).as("dup_span_frac"))
  }
}
