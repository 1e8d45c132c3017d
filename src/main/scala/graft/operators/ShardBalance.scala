package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Size-balanced shard assignment for training-data writers: assign
  * every document to one of `nShards` output shards so the per-shard
  * token mass is balanced, DETERMINISTICALLY (same inputs → same
  * shards on any cluster size or partitioning — a training run's shard
  * layout must be reproducible).
  *
  * The rule is the boustrophedon ("snake draft") fold: rank documents
  * by size descending (ties to the lower id, so the order is total),
  * then deal rank r to shard fold((r-1) mod 2S) where the fold
  * reverses direction every S picks — shard s receives the s-th and
  * (2S−1−s)-th pick of every window of 2S, so each window contributes
  * the same number of docs to every shard and pairs a large pick with
  * a small one. For monotone size sequences this is the classic
  * near-LPT guarantee: per-window shard masses differ by at most the
  * within-window size spread, and the greedy-LPT optimum is
  * approached without LPT's inherently sequential state.
  *
  * Scale shape: the global rank is [[SurrogateKey.denseRowNumber]] —
  * range repartition on the (size, id) key, per-partition numbering,
  * broadcast metadata-sized offsets — NOT a single-partition
  * row_number window (the canonical 100 TB funnel). Everything after
  * the rank is per-row modular arithmetic plus one nShards-sized
  * aggregate.
  */
object ShardBalance {

  /** Per-document assignment: (idCol, sizeCol, shard). */
  def assign(
      docs: DataFrame,
      idCol: String,
      sizeCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val ranked = SurrogateKey.denseRowNumber(
      docs.select(col(idCol), col(sizeCol).cast("long").as(sizeCol)),
      "graft__rank",
      col(sizeCol).desc, col(idCol))
    val pos = (col("graft__rank") - 1L) % lit(2L * nShards)
    ranked.select(
      col(idCol), col(sizeCol),
      when(pos < nShards, pos)
        .otherwise(lit(2L * nShards - 1L) - pos).as("shard"))
  }

  /** Per-shard balance report: (shard, n_docs, total_size). */
  def report(
      docs: DataFrame,
      idCol: String,
      sizeCol: String,
      nShards: Int): DataFrame =
    assign(docs, idCol, sizeCol, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("total_size"))
}
