package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match entity resolution — the record-linkage primitive
  * (Fellegi & Sunter 1969 framing; Christen 2012 survey for the
  * blocking taxonomy): candidate pairs come only from shared BLOCKS,
  * never from the corpus cross product, and candidates are scored with
  * an exact edit distance.
  *
  * Scale shape: the one exchange is the block-keyed self-join; the
  * quadratic term is bounded per block (pick block keys so the hottest
  * block stays executor-sized — phonetic keys, attribute equality,
  * sorted-neighborhood windows all fit this signature; a skewed block
  * gets the SkewJoin salting treatment). Levenshtein runs only inside
  * blocks, pairs are emitted once (idA < idB), and the output is
  * (ids, distance) — no names in the result, so downstream joins stay
  * narrow.
  */
object EntityResolution {

  def blockedFuzzyPairs(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String,
      maxDist: Int): DataFrame = {
    val r = Partitioning.spread(records)
      .select(col(blockCol).as("graft__bk"), col(idCol).as("graft__id"),
        col(nameCol).as("graft__name"))
    r.alias("a")
      .join(r.alias("b"),
        col("a.graft__bk") === col("b.graft__bk") &&
          col("a.graft__id") < col("b.graft__id"))
      .select(
        col("a.graft__id").as("id_a"),
        col("b.graft__id").as("id_b"),
        levenshtein(col("a.graft__name"), col("b.graft__name"))
          .cast("long").as("lev"))
      .filter(col("lev") <= maxDist)
  }
}
