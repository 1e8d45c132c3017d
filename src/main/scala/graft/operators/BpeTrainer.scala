package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016): k rounds of [count adjacent symbol pairs → merge the most
  * frequent pair everywhere], starting from characters. n57 mines ONE
  * round of candidates; this is the actual training loop that produces
  * an ordered merge table.
  *
  * Scale design (the standard trainer shape):
  *  - the corpus collapses to the WEIGHTED VOCABULARY once (word → freq,
  *    one corpus shuffle); every round after that touches |vocab| rows,
  *    never the corpus;
  *  - per round: pair counts partial-aggregate map-side, the argmax is
  *    a TakeOrdered(1) — no global sort — and the merge application is
  *    a map-only higher-order fold over each word's symbol array;
  *  - the chosen pair reaches the merge lambda via a broadcast 1-row
  *    crossJoin, never a driver-side string: the loop is control-flow
  *    only, no data-path collect;
  *  - per-round localCheckpoint with eager release of superseded rounds
  *    (the DedupClusters/n58 iterative discipline) — without truncation
  *    the plan doubles per round. k is FIXED (a tokenizer budget), not
  *    convergence-driven, so there is no cap to fail loudly at; the
  *    deterministic tie-break (count DESC, then pair lexicographic)
  *    makes the whole merge table reproducible run-to-run.
  *  - k is an UPPER BOUND: if the vocabulary exhausts mergeable pairs
  *    before round k (every word reduced to a single symbol), the loop
  *    stops early and returns the merges trained so far plus the intact
  *    vocabulary — the empty argmax must never reach the crossJoin,
  *    where it would silently wipe the symbol table.
  *  - checkpoint hygiene: the k per-round 1-row argmax checkpoints are
  *    copied into ONE final merge-table checkpoint and released, so an
  *    invocation retains at most two tiny persisted RDDs (merges +
  *    vocab); [[TrainResult.release]] frees both when the caller is
  *    done (Bench/Verify additionally sweep leftover RDD persists
  *    between queries).
  *
  * Greedy-leftmost semantics: a merged occurrence consumes its symbols,
  * so overlapping matches resolve left-to-right ("aaa" under merge
  * (a,a) → [aa, a]). The fold implements this exactly: merging with the
  * accumulator's LAST element reproduces leftmost-first, because a
  * consumed position's symbol is replaced by the (longer) merged symbol
  * and can no longer match as the pair's left side.
  *
  * Output: (merge_rank, sym_a, sym_b, n) — one row per round, rank
  * 1-based in training order, n the pair's weighted count at merge time.
  * n is non-increasing in rank (new pairs created by a merge are bounded
  * by the merged pair's own count — the EngineLawsProps monotonicity
  * law).
  */
object BpeTrainer {

  /** `merges`: (merge_rank, sym_a, sym_b, n), one row per round
    * actually trained (≤ k when pairs exhaust early).
    * `vocab`: (w, f, syms) — the weighted vocabulary with every merge
    * applied, i.e. the trained tokenizer's encoding of each word.
    * Both are localCheckpoint'd; `release()` frees their persisted
    * blocks once the caller has consumed them. */
  final case class TrainResult(
      merges: DataFrame,
      vocab: DataFrame,
      private val retained: scala.collection.Set[Int]) {
    def release(): Unit =
      BpeTrainer.release(merges.sparkSession.sparkContext, retained)
  }

  /** The merge-application fold: references `a`/`b` (the round's chosen
    * pair) as COLUMNS bound by the broadcast crossJoin. */
  private val mergeFold =
    """aggregate(
      |  syms,
      |  cast(array() as array<string>),
      |  (acc, x) -> CASE
      |    WHEN size(acc) > 0 AND element_at(acc, -1) = a AND x = b
      |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))
      |    ELSE concat(acc, array(x)) END)""".stripMargin

  private def release(
      sc: org.apache.spark.SparkContext,
      ids: scala.collection.Set[Int]): Unit = ids.foreach { id =>
    sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
  }

  /** Train up to `k` merges over the whitespace-token vocabulary of
    * `docs(textCol)`; the encoded vocabulary is released. The returned
    * merges frame is a LOCAL relation: the merge table is ≤ k rows by
    * construction (one per trained round — a driver-sized model
    * artifact, like a centroid set, not corpus data), so it is pinned
    * to the driver and EVERY checkpoint block is released before
    * returning. Library callers can hold the result indefinitely with
    * no executor storage leaked; callers who also need the encoded
    * vocabulary (corpus-sized — stays distributed) use [[trainVocab]]
    * and own its lifetime via [[TrainResult.release]]. */
  def train(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    val (result, vocabIds) = trainImpl(docs, textCol, k)
    val rows = java.util.Arrays.asList(result.merges.collect(): _*)
    val schema = result.merges.schema
    release(spark.sparkContext, vocabIds)
    result.release()
    spark.createDataFrame(rows, schema)
  }

  /** Train AND keep the encoded vocabulary (checkpointed — the caller
    * owns its lifetime via [[TrainResult.release]]; Verify/Bench sweep
    * leftover persists between queries). */
  def trainVocab(docs: DataFrame, textCol: String, k: Int): TrainResult =
    trainImpl(docs, textCol, k)._1

  private def trainImpl(
      docs: DataFrame,
      textCol: String,
      k: Int): (TrainResult, scala.collection.Set[Int]) = {
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    // stats-resetting checkpoint — the inherited sizeInBytes would
    // otherwise compound across rounds (see IterationCheckpoint)
    def checkpointed(df: DataFrame): (DataFrame, scala.collection.Set[Int]) =
      IterationCheckpoint.local(df)

    // corpus → weighted vocab → initial character symbols. Empty words
    // (consecutive separators) are excluded: they carry no symbols, so
    // they can neither merge nor count — and the SQL twin's positional
    // table drops them implicitly, so excluding keeps parity exact.
    var (syms, symsIds) = checkpointed(
      docs
        .select(explode(TextOps.tokens(col(textCol))).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy(col("w"))
        .agg(count(lit(1)).as("f"))
        .select(col("w"), col("f"),
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            .as("syms")))

    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val roundIds = scala.collection.mutable.Set.empty[Int]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val pairCounts = syms
        .select(col("f"), explode(TextOps.bigrams(col("syms"))).as("p"))
        .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
        .agg(sum(col("f")).as("n"))
      // the round's decision: 1 row, materialized once (it steers the
      // merge below AND is this round's output row)
      val (top, topIds) = checkpointed(
        pairCounts.orderBy(col("n").desc, col("a"), col("b")).limit(1))
      if (top.isEmpty) {
        // pairs exhausted before the budget: every word is a single
        // symbol. Stop with the merges trained so far — feeding the
        // empty argmax to the crossJoin would wipe the symbol table.
        release(sc, topIds)
        exhausted = true
      } else {
        roundIds ++= topIds
        val (next, nextIds) = checkpointed(
          syms
            .crossJoin(broadcast(top.select(col("a"), col("b"))))
            .select(col("w"), col("f"), expr(mergeFold).as("syms")))
        release(sc, symsIds)
        syms = next
        symsIds = nextIds
        rounds += top.select(lit(r.toLong).as("merge_rank"),
          col("a").as("sym_a"), col("b").as("sym_b"), col("n"))
        r += 1
      }
    }
    // copy the ≤ k one-row argmax frames into ONE merge-table
    // checkpoint, then release them — repeated invocations must not
    // accumulate per-round persisted blocks
    val mergesRaw =
      if (rounds.isEmpty)
        spark.range(0).select(
          col("id").as("merge_rank"),
          lit(null).cast("string").as("sym_a"),
          lit(null).cast("string").as("sym_b"),
          lit(null).cast("long").as("n"))
      else rounds.reduce(_ union _)
    val (merges, mergesIds) = checkpointed(mergesRaw)
    release(sc, roundIds)
    (TrainResult(merges, syms, mergesIds ++ symsIds), symsIds)
  }
}
