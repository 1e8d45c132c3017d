package graft.operators

import graft.SparkTestBase

class NoveltyScoreSpec extends SparkTestBase {

  import spark.implicits._

  private def run(scored: Seq[(Long, String)], ref: Seq[(Long, String)]) =
    Decontaminate.noveltyScore(
      scored.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
      "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("novelty is the exact fraction of shingles absent from the reference") {
    val ref = Seq(100L -> "a b c d e") // shingles: abc bcd cde
    // doc 1: "a b c d" -> {abc, bcd}, both seen -> novelty 0
    // doc 2: "a b c x y" -> {abc, bcx, cxy} -> 2 of 3 new
    // doc 3: "p q r s" -> {pqr, qrs} -> all new
    val got = run(Seq(1L -> "a b c d", 2L -> "a b c x y", 3L -> "p q r s"), ref)
    assert(got(1L) === ((2L, 0L, 0.0)))
    assert(got(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) === ((2L, 2L, 1.0)))
  }

  test("fully-seen docs still emit a row (the left join keeps zeros)") {
    val ref = Seq(100L -> "x y z w")
    val got = run(Seq(1L -> "x y z w"), ref)
    assert(got(1L)._3 === 0.0)
  }

  test("docs shorter than the shingle width emit nothing on either side") {
    val got = run(Seq(1L -> "one two"), Seq(100L -> "a b"))
    assert(got.isEmpty)
  }
}
