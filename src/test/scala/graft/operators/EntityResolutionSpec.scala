package graft.operators

import graft.SparkTestBase

class EntityResolutionSpec extends SparkTestBase {

  import spark.implicits._

  private def pairs(rows: Seq[(Long, String, Int)], maxDist: Int) =
    EntityResolution.blockedFuzzyPairs(
      rows.toDF("id", "name", "blk"), "id", "name", "blk", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("finds near-identical names within a block, each pair once") {
    val rows = Seq(
      (1L, "smith john", 7), (2L, "smith jhon", 7), (3L, "smyth john", 7),
      (4L, "totally different", 7))
    val got = pairs(rows, maxDist = 2)
    // (2,3) is distance 3 (y-sub plus the transposed "jhon"/"john"
    // costing two substitutions) — over the bar
    assert(got === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L))
  }

  test("blocking is a hard wall: identical names in different blocks never pair") {
    val rows = Seq((1L, "same name", 1), (2L, "same name", 2))
    assert(pairs(rows, maxDist = 0).isEmpty)
  }

  test("maxDist 0 reduces to exact-name dedup within the block") {
    val rows = Seq((1L, "alpha", 1), (2L, "alpha", 1), (3L, "alphb", 1))
    assert(pairs(rows, maxDist = 0) === Map((1L, 2L) -> 0L))
  }

  private def snPairs(rows: Seq[(Long, String)], window: Int, maxDist: Int) =
    EntityResolution.sortedNeighborhoodPairs(
      rows.toDF("id", "name"), "id", "name", window, maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("sorted-neighborhood catches the near-match equality blocking drops") {
    // "aaron" / "aaror" differ in the (hypothetical) blocking attribute
    // itself, but sort adjacently — the window pairs them.
    val rows = Seq(1L -> "aaron", 2L -> "aaror", 3L -> "zzz")
    assert(snPairs(rows, window = 2, maxDist = 1) === Map((1L, 2L) -> 1L))
  }

  test("window is a hard wall in rank space") {
    // four names sort as b1 < b2 < b3 < b4; window=2 pairs only
    // rank-adjacent ones, so (b1, b3) is out even at distance 1
    val rows = Seq(1L -> "ba", 2L -> "bb", 3L -> "bc", 4L -> "bd")
    val got = snPairs(rows, window = 2, maxDist = 1)
    assert(got.keySet === Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("matches row_number semantics: each unordered pair appears once") {
    val rows = Seq(1L -> "x", 2L -> "x", 3L -> "x")
    val got = snPairs(rows, window = 3, maxDist = 0)
    // ties broken by id: ranks 1,2,3 → pairs (1,2),(1,3),(2,3)
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
