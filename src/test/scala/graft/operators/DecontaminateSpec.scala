package graft.operators

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {

  test("collisionStats: exact n-gram collision with correct hit ratios") {
    import spark.implicits._
    val corpus = Seq(
      // 6 tokens → 2 distinct 5-grams; the first one is in the benchmark
      (1L, "alpha beta gamma delta epsilon zeta"),
      // clean doc, no shared 5-gram
      (2L, "one two three four five six seven"),
      // shorter than n → zero shingles, never flagged
      (3L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "PRE alpha beta gamma delta epsilon POST"))
      .toDF("doc_id", "text")

    val got = Decontaminate
      .collisionStats(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 1L, 2L, 0.5)))
  }

  test("collisionStats: duplicate benchmark shingles do not double-count hits") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e tail")).toDF("doc_id", "text")
    // the same 5-gram appears in two benchmark docs — dedup on the
    // bench side must keep the corpus-side counts exact
    val bench = Seq(
      (100L, "x a b c d e y"),
      (101L, "z a b c d e w")).toDF("doc_id", "text")
    val got = Decontaminate
      .collisionStats(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, 2L)))
  }
}
