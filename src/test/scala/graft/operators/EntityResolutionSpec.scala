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
}
