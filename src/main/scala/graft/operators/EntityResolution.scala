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

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995): sort by a
    * key, compare each record only to its `window − 1` successors in
    * rank order. Where equality blocking needs a good partition key,
    * sorted-neighborhood catches near-matches that STRADDLE block
    * boundaries (typos in the blocking attribute itself) — the two
    * schemes are complementary and real linkage pipelines run both.
    *
    * Scale shape: the global rank comes from
    * [[SurrogateKey.denseRowNumber]] (range repartition + broadcast
    * offsets — never a one-reducer window); the neighbor pairing is an
    * EQUI-join on rank after a w−1-way explode of the left side, so
    * the exchange is hash-partitioned on a dense unique key — no skew,
    * no range join, shuffle volume (w−1)·rows of (rank, id, name).
    */
  def sortedNeighborhoodPairs(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      window: Int,
      maxDist: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = SurrogateKey.denseRowNumber(
      records.select(col(idCol).as("graft__id"), col(nameCol).as("graft__name")),
      "graft__rk", col("graft__name"), col("graft__id"))
    val probes = ranked.select(
      col("graft__id").as("id_a"), col("graft__name").as("graft__na"),
      explode(sequence(col("graft__rk") + 1,
        col("graft__rk") + (window - 1))).as("graft__rk"))
    probes
      .join(ranked.select(col("graft__rk"), col("graft__id").as("id_b"),
        col("graft__name").as("graft__nb")), "graft__rk")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("graft__na"), col("graft__nb")).cast("long").as("lev"))
      .filter(col("lev") <= maxDist)
  }
}
