package graft.operators

import graft.SparkTestBase

class ContainmentSpec extends SparkTestBase {

  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], threshold: Double,
      maxDf: Option[Long] = None) =
    Containment.containmentPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      threshold = threshold, maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("catches a sub-document whose Jaccard is far below any near-dup bar") {
    // doc 1 = 6 tokens -> 4 distinct 3-shingles, all present in doc 2
    // (30 tokens, 28 shingles): containment(1->2) = 1.0 while
    // Jaccard = 4/28 = 0.14 — the pair n3-style resemblance LSH
    // structurally misses.
    val sub = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 24).map(i => s"w$i").mkString(" ")
    val docs = Seq(1L -> sub, 2L -> s"$sub $filler", 3L -> filler)
    val got = pairs(docs, threshold = 0.9)
    assert(got.keySet.contains((1L, 2L)))
    assert(got((1L, 2L)) === 1.0)
    // the big doc is NOT contained in the small one
    assert(!got.keySet.contains((2L, 1L)))
  }

  test("near-identical docs appear in both directions; unrelated in none") {
    val a = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(1L -> a, 2L -> a, 3L -> "completely different text about nothing at all here")
    val got = pairs(docs, threshold = 0.9)
    assert(got.keySet === Set((1L, 2L), (2L, 1L)))
    assert(got.values.forall(_ === 1.0))
  }

  test("maxDf drops ubiquitous grams so stop-gram-only evidence vanishes") {
    // Every doc shares the gram "common common common" (df = 4 > cap 3);
    // after suppression docs 3/4 share nothing, while the genuine
    // sub-document pair (1 in 2) keeps its unique evidence.
    val stop = "common common common"
    val sub = "alpha beta gamma delta epsilon"
    val docs = Seq(
      1L -> s"$sub $stop",
      2L -> s"$sub extra words here and more $stop",
      3L -> s"unrelated one thing $stop",
      4L -> s"another distinct body $stop")
    val capped = pairs(docs, threshold = 0.5, maxDf = Some(3L))
    assert(capped.keySet.contains((1L, 2L)))
    assert(!capped.keySet.exists { case (a, b) =>
      Set(a, b) == Set(3L, 4L) })
  }

  test("docs shorter than the shingle width yield no rows and no errors") {
    val docs = Seq(1L -> "one two", 2L -> "three words exactly here")
    assert(pairs(docs, threshold = 0.1).isEmpty)
  }
}
