package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation: given two versions of a document
  * table (last crawl vs this crawl, last release vs this release),
  * classify every id as `added` (new only), `removed` (old only),
  * `changed` (both, different content), or `unchanged` — the diff
  * every incremental training-data release is built from, and the
  * audit trail data governance asks for.
  *
  * Content identity is the md5 of the text (the repo's portable hash),
  * computed BEFORE the join — so the join ships (id, 32-char digest)
  * and never document bodies, and the comparison cost is independent
  * of document size. The join is full-outer equi on the id: both
  * sides shuffle-partition by id once (or not at all if both
  * snapshots are stored bucketed by id — the s10 layout), and every
  * downstream consumer (the added/changed slice feeding the
  * incremental pipeline) is a filter on the already-partitioned
  * result.
  */
object SnapshotDiff {

  /** Per-id verdicts: (idCol, status), `unchanged` included so the
    * result is a total function of the id universe; filter it away for
    * the delta feed. */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def digest(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol), md5(col(textCol)).as(s"graft__$side"))
    digest(oldSnap, "old")
      .join(digest(newSnap, "new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("graft__old").isNull, "added")
          .when(col("graft__new").isNull, "removed")
          .when(col("graft__old") === col("graft__new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Roll-up of [[diff]]: (status, n_docs). */
  def summary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))
}
