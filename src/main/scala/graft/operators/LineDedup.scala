package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide line-level exact deduplication — the second dedup axis
  * production LLM pipelines run alongside document-level near-dup
  * (CCNet, Wenzek et al. LREC 2020 §4.1; Dolma): repeated boilerplate
  * (headers, navigation, license blurbs) lives INSIDE otherwise-distinct
  * documents, so it survives any whole-document dedup. Each line keeps
  * only its first corpus occurrence (ordered by (doc_id, line index))
  * and the surviving lines are reassembled per document in original
  * order. Documents whose every line was seen earlier disappear.
  *
  * "Lines" are fixed `lineTokens`-token blocks (the synthetic corpus has
  * no newlines); with a newline-delimited corpus the splitter swaps for
  * `split(text, '\n')` and nothing else changes.
  *
  * Scale design:
  *  - First occurrence is `groupBy(line).agg(min(struct(doc_id, lid)))`,
  *    NOT a row_number window over `PARTITION BY line`: the window form
  *    ships every copy of a hot boilerplate line to one reducer, while
  *    the aggregate collapses duplicates map-side, so the exchange
  *    carries one row per distinct line per map task and skew cannot
  *    concentrate. (At 100 TB, prefix the group key with a 60-bit line
  *    fingerprint so shuffle comparisons ride on 8 bytes.)
  *  - The keeper rows already carry the line text, so reassembly needs
  *    no join back to the corpus: one `groupBy(doc_id)` with an
  *    `array_sort` over (lid, line) structs restores document order
  *    without a per-document window.
  *  - Per-document line totals come from the pre-explode token count
  *    (map-only) and join agg-output-sized relations, never the corpus.
  *
  * Per-document bound: the slice start index is Int-typed, so a single
  * document may hold at most Int.MaxValue tokens (~2 GiB of text — far
  * past any sane document, but a 100 TB corpus will contain pathological
  * rows). Rather than silently wrapping (or throwing only under ANSI),
  * an oversized document raises a labeled error naming its doc_id.
  *
  * Output: (doc_id, clean_text, n_kept, n_dropped).
  */
object LineDedup {

  def dedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lineTokens: Int = 8): DataFrame = {
    require(lineTokens > 0, "lineTokens must be positive")
    val k = lineTokens.toLong
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("graft__ws"))
      .withColumn("graft__n", size(col("graft__ws")).cast("long"))
    val lastLid: Column = expr(s"(graft__n - 1) div $k")
    val nLines = toks
      .select(col("doc_id"), (lastLid + 1L).as("graft__nlines"))
    // slice start is Int-typed: fail loudly on a pathological document
    // instead of wrapping (non-ANSI) or throwing an anonymous cast
    // error (ANSI) — see the per-document bound in the scaladoc
    val startLong = col("graft__lid") * k + 1L
    val start = when(startLong > lit(Int.MaxValue.toLong),
      raise_error(concat(
        lit("LineDedup: doc_id "), col("doc_id").cast("string"),
        lit(s" exceeds the per-document Int.MaxValue token bound"))))
      .otherwise(startLong).cast("int")
    val lines = toks
      .select(col("doc_id"), col("graft__ws"),
        explode(sequence(lit(0L), lastLid)).as("graft__lid"))
      .select(col("doc_id"), col("graft__lid"),
        concat_ws(" ", slice(col("graft__ws"), start, lit(lineTokens)))
          .as("graft__line"))
    val keepers = lines
      .groupBy(col("graft__line"))
      .agg(min(struct(col("doc_id"), col("graft__lid"))).as("graft__k"))
      .select(col("graft__k.doc_id").as("doc_id"),
        col("graft__k.graft__lid").as("graft__lid"), col("graft__line"))
    keepers
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(
            struct(col("graft__lid"), col("graft__line")))),
          e => e.getField("graft__line"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(nLines, Seq("doc_id"))
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        (col("graft__nlines") - col("n_kept")).as("n_dropped"))
  }
}
