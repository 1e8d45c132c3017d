package graft.operators

import graft.SparkTestBase

class BinaryAnnSpec extends SparkTestBase {

  import spark.implicits._

  private def vec(f: Int => Double): Array[Float] =
    Array.tabulate(64)(j => f(j).toFloat)

  private def topk(corpus: Seq[(Long, Array[Float])],
      query: Seq[(Long, Array[Float])], shortlist: Int, k: Int) =
    Similarity.binaryHammingTopK(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      query.toDF("vec_id", "embedding"), "embedding", shortlist, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("hamming distances count exact sign flips across both 32-bit halves") {
    val q = Seq(0L -> vec(_ => 1.0))
    val corpus = Seq(
      1L -> vec(_ => 0.5),                          // all signs agree: ham 0
      2L -> vec(j => if (j == 3 || j == 40) -1 else 1), // one flip per half
      3L -> vec(_ => -1.0))                         // every bit flips
    val got = topk(corpus, q, shortlist = 3, k = 3)
    assert(got.map(r => r._1 -> r._2).toMap ===
      Map(1L -> 0L, 2L -> 2L, 3L -> 64L))
  }

  test("the exact rerank restores cosine order inside the Hamming shortlist") {
    // both candidates have hamming 0 to the query, but different true
    // cosine: the rerank must order by cosine, not by id or hamming
    val q = Seq(0L -> vec(j => if (j < 32) 1.0 else 0.5))
    val corpus = Seq(
      1L -> vec(_ => 1.0),                    // positive everywhere, lower cos
      2L -> vec(j => if (j < 32) 2.0 else 1.0)) // parallel to q: cos 1.0
    val got = topk(corpus, q, shortlist = 2, k = 2)
    assert(got.map(_._1).toSeq === Seq(2L, 1L))
    assert(got.head._3 === 1.0)
  }

  test("shortlist is a hard wall: a high-cosine far-Hamming vector is excluded") {
    // candidate 9 has the best cosine but the worst hamming; with a
    // shortlist of 1 only the hamming-nearest reaches the rerank — the
    // documented recall trade of the coarse stage
    val q = Seq(0L -> vec(j => if (j == 0) 1.0 else -0.01))
    val corpus = Seq(
      1L -> vec(j => if (j == 0) 0.5 else -0.5), // signs match q: ham 0
      9L -> vec(j => if (j == 0) 1.0 else 0.01)) // cos ≈ 1 but 63 flips
    val got = topk(corpus, q, shortlist = 1, k = 1)
    assert(got.map(_._1).toSeq === Seq(1L))
  }
}
