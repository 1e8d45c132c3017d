package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture reweighting in the DoReMi mold (Xie et al. 2023,
  * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining"): per-domain EXCESS LOSS against the corpus mean
  * drives a multiplicative-weights update, the result is normalized
  * and smoothed toward uniform. DoReMi's exp(η·excess) step is
  * replaced by the classic linear multiplicative-weights form
  * (1 + excess, clamped) in 1e-6 BIGINT fixed point — the same
  * no-libm discipline as the k-means/logreg trainers, so every
  * intermediate is exact and the DuckDB oracle replays the whole
  * computation bit-for-bit (exp() ULP drift across libms can't).
  *
  * All divisions are non-negative BIGINT / BIGINT, where Spark `div`
  * and DuckDB `//` agree exactly (truncation == floor for ≥ 0).
  *
  * Scale shape: the per-doc loss proxy is map-only; the ONLY
  * data-sized exchange is one groupBy(domain) with map-side partials
  * (k domains out); the corpus mean and the normalizer are 1-row
  * aggregates broadcast back — nothing driver-side, nothing
  * quadratic, and the output is k rows regardless of corpus size.
  */
object DomainReweight {

  /** Per-domain mixture weights from a per-document integer loss
    * proxy (1e6 fixed-point scale).
    *
    * @param lossCol      integer (1e6-scaled) per-document loss proxy
    * @param minW         clamp floor for the multiplicative weight —
    *                     keeps a strongly below-average domain sampled
    * @param smoothingPct percent mixed back toward the uniform
    *                     distribution (DoReMi's smoothing step)
    * @return (domain, excess, alpha): excess loss and the final
    *         1e6-scaled mixture weight, both BIGINT
    */
  def weights(
      docs: DataFrame,
      domainCol: String,
      lossCol: Column,
      minW: Long = 1000L,
      smoothingPct: Int = 10): DataFrame = {
    require(smoothingPct >= 0 && smoothingPct <= 100)
    val s = docs.select(col(domainCol).as("domain"), lossCol.as("score"))

    val dom = s.groupBy(col("domain"))
      .agg(count(lit(1)).as("cnt"), sum(col("score")).as("ssum"))
    val g = s.agg(expr("sum(score) div count(1)").as("gmean"))

    val e = dom.crossJoin(broadcast(g))
      .withColumn("excess", expr("ssum div cnt") - col("gmean"))
      .withColumn("w", greatest(lit(1000000L) + col("excess"), lit(minW)))

    val tk = e.agg(sum(col("w")).as("tot"), count(lit(1)).as("k"))

    e.crossJoin(broadcast(tk))
      .withColumn("norm", expr("(w * 1000000) div tot"))
      .withColumn("alpha",
        expr(s"((${100 - smoothingPct} * norm) + " +
          s"($smoothingPct * (1000000 div k))) div 100"))
      .select(col("domain"), col("excess"), col("alpha"))
  }
}
