package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection by importance weighting (Xie et al. 2023,
  * arXiv:2302.03169 "Data Selection for Language Models via Importance
  * Resampling"): score every document by how much more likely its
  * tokens are under a TARGET distribution (the domain you want more
  * of) than under the BACKGROUND corpus distribution, then sample or
  * rank by that score. This implementation uses add-one-smoothed
  * unigram models and a sum of per-token likelihood ratios (the paper
  * uses hashed-n-gram log ratios; the sum-of-ratios variant keeps the
  * arithmetic libm-free so the score is bit-reproducible cross-engine
  * — the selection ORDERING it induces is the deliverable either way).
  *
  * Per token t: ratio(t) = (ct+1)(Nb+V) / ((cb+1)(Nt+V)) where ct/cb
  * are target/background occurrence counts, Nt/Nb the total token
  * masses, V the background vocabulary size. Each ratio is quantized
  * to the 1e-6 grid as ONE double division of exactly-representable
  * integer products (identical IEEE rounding on any engine), and a
  * document's score is the exact BIGINT sum of its tokens' quantized
  * ratios — associative, partitioning-independent.
  *
  * Scale shape: the token stream is a map-only explode; the two count
  * aggregates are vocabulary-sized with map-side partials (the shuffle
  * carries (token, count), never text); the ratio table is vocab-sized
  * → BROADCAST back onto the token stream, so the per-doc scoring pass
  * is map-only + one doc-keyed partial-agg exchange. The corpus text
  * itself never shuffles.
  */
object ImportanceWeights {

  /** (doc_id, n_tokens, score) for every document, higher = closer to
    * the target distribution. `isTarget` marks the target subset (it
    * must select a non-empty subset; background is ALL docs). */
  def unigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame = {
    val toks = docs.select(
      col(idCol),
      isTarget.as("graft__t"),
      explode(TextOps.tokens(col(textCol))).as("graft__w"))
    val counts = toks
      .groupBy(col("graft__w"))
      .agg(
        count(lit(1)).as("graft__cb"),
        sum(when(col("graft__t"), 1L).otherwise(0L)).as("graft__ct"))
    val totals = counts.agg(
      sum(col("graft__cb")).as("graft__nb"),
      sum(col("graft__ct")).as("graft__nt"),
      count(lit(1)).as("graft__v"))
    // one double division of exact integer products; the product may
    // exceed 2^53 at extreme scales, but CAST-to-double rounds
    // identically on any IEEE engine so the quantized ratio still
    // matches bit-for-bit
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("graft__w"),
        round(
          lit(1000000.0) *
            ((col("graft__ct") + 1L).cast("double") *
              (col("graft__nb") + col("graft__v")).cast("double")) /
            ((col("graft__cb") + 1L).cast("double") *
              (col("graft__nt") + col("graft__v")).cast("double")))
          .cast("long").as("graft__r"))
    toks
      .join(broadcast(ratios), Seq("graft__w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("graft__r")).as("score"))
  }
}
