package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-truncation dedup: find document pairs where one text is a
  * STRICT prefix of another — the signature of truncated re-crawls,
  * cut-off mirrors, and length-capped copies. Jaccard-style near-dup
  * misses short-prefix cases for the same reason it misses
  * sub-documents (n127): the shingle overlap ratio shrinks with the
  * length gap, while the prefix relation stays exact.
  *
  * Two-stage shape (the CrossDupSpans discipline):
  *  1. candidates from a narrow block join on hash60 of the first
  *     `blockLen` characters — the exchange carries (block fp, id,
  *     length) longs only, never text. Any true prefix pair shares
  *     this key because every corpus text is at least `blockLen`
  *     chars (enforced; shorter corpora pick a smaller blockLen).
  *  2. exact verify rehydrates text BY ID for candidate pairs only —
  *     text shuffles only for the candidate set, which blocking has
  *     already collapsed to near-output size.
  */
object PrefixDedup {

  def prefixPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockLen: Int = 32): DataFrame = {
    val base = Partitioning.spread(docs)
      .select(col(idCol).as("graft__id"), col(textCol).as("graft__text"),
        length(col(textCol)).cast("long").as("graft__len"))

    val keyed = base.select(
      col("graft__id"), col("graft__len"),
      TextOps.hexHash60(substring(col("graft__text"), 1, blockLen))
        .as("graft__bk"))

    val cand = keyed.alias("a")
      .join(keyed.alias("b"),
        col("a.graft__bk") === col("b.graft__bk") &&
          col("b.graft__len") > col("a.graft__len"))
      .select(col("a.graft__id").as("id_prefix"),
        col("b.graft__id").as("id_full"))

    // Rehydration is candidate-sized BY CONSTRUCTION: the candidate id
    // set (near-output-sized after blocking) broadcasts into a semi-join
    // that prunes the text relation map-side, so the only exchange that
    // ever carries text holds candidate rows, not the corpus. If a
    // corpus has degenerate blocks (a boilerplate 32-char header shared
    // corpus-wide), cap them upstream — such a block is exactly the
    // cross-dup-span signature n102 handles.
    val candIds = cand.select(col("id_prefix").as("graft__id"))
      .union(cand.select(col("id_full").as("graft__id")))
      .distinct()
    val hydrated = base.join(broadcast(candIds), Seq("graft__id"), "left_semi")

    cand
      .join(hydrated.select(col("graft__id").as("id_prefix"),
        col("graft__text").as("graft__ta"),
        col("graft__len").as("prefix_len")), "id_prefix")
      .join(hydrated.select(col("graft__id").as("id_full"),
        col("graft__text").as("graft__tb"),
        col("graft__len").as("full_len")), "id_full")
      .filter(col("graft__tb").startsWith(col("graft__ta")))
      .select(col("id_prefix"), col("id_full"),
        col("prefix_len"), col("full_len"))
  }
}
