package graft.operators

import graft.SparkTestBase

/** Closed-form coverage for the second round-10 batch: cross-document
  * span coverage, snapshot diff, and PQ-ADC retrieval. */
class CrossDupSnapshotPqSpec extends SparkTestBase {
  import spark.implicits._

  test("cross-doc spans: only n-grams shared across DISTINCT docs count") {
    // docs 1 and 2 share the 5-gram "a b c d e" (covers positions 1-5
    // of each); doc 3 repeats its own 5-gram twice WITHIN itself but
    // shares nothing cross-doc -> coverage 0 (the n61 axis, not this).
    val docs = Seq(
      (1L, "a b c d e x y"),
      (2L, "z a b c d e"),
      (3L, "q w e r t q w e r t"))
      .toDF("doc_id", "text")
    val got = CrossDupSpans.coverage(docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((7L, 5L)), // "a b c d e" at pos 1 covers 1..5
      2L -> ((6L, 5L)), // at pos 2 covers 2..6
      3L -> ((10L, 0L))))
  }

  test("cross-doc spans: overlapping shared grams union, not double-count") {
    // both docs contain "a b c d e f" -> two shared 5-grams at pos 1,2
    // covering the union 1..6 = 6 positions
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val got = CrossDupSpans.coverage(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // (doc 2's third gram "c d e f g" is unshared, contributing nothing)
    assert(got === Map(1L -> 6L, 2L -> 6L))
  }

  test("span scrub keeps the min-id occurrence, scrubs the rest") {
    // docs 1,2 share "a b c d e": keeper is doc 1 (kept verbatim);
    // doc 2 loses positions 2..6, keeping only "z". Doc 3 untouched.
    val docs = Seq(
      (1L, "a b c d e x y"),
      (2L, "z a b c d e"),
      (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    val got = CrossDupSpans.scrub(docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got === Map(
      1L -> ((7L, "a b c d e x y")),
      2L -> ((1L, "z")),
      3L -> ((6L, "p q r s t u"))))
  }

  test("span scrub empties exact-duplicate copies (the n1 semantics)") {
    val docs = Seq(
      (5L, "one two three four five six"),
      (9L, "one two three four five six"))
      .toDF("doc_id", "text")
    val got = CrossDupSpans.scrub(docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got === Map(
      5L -> ((6L, "one two three four five six")),
      9L -> ((0L, ""))))
  }

  test("snapshot diff classifies all four statuses") {
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "alpha"), (2L, "BETA2"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val sum = SnapshotDiff.summary(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map(
      "unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("pqTopK codes by integer argmax-dot and scores via the LUT") {
    // width-1 subspaces with codebook {+1, -1} make the arithmetic
    // inspectable: v=(2,-3) codes to (0,1), v=(-1,-1) to (1,1),
    // v=(5,0.5) to (0,0); query (1,1) LUT = ([1000,-1000],[1000,-1000])
    // -> scores 0, -2000, 2000.
    val emb = Seq(
      (10L, Seq(2.0f, -3.0f)),
      (11L, Seq(-1.0f, -1.0f)),
      (12L, Seq(5.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val query = Seq((0L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(
      emb, "vec_id", "embedding", query, "embedding",
      codebook = Seq(Seq(1), Seq(-1)), subspaces = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((12L, 2000L), (10L, 0L), (11L, -2000L)))
  }

  test("pqAdc over stored codes equals pqTopK end-to-end") {
    val emb = (1 to 120)
      .map(i => (i.toLong, Seq.tabulate(8)(j => (i * 0.031f - j * 0.09f))))
      .toDF("vec_id", "embedding")
    val query = Seq((0L, Seq.fill(8)(0.25f))).toDF("vec_id", "embedding")
    val cb = Similarity.hyperplanes(4, 4)
    val direct = Similarity.pqTopK(
      emb, "vec_id", "embedding", query, "embedding", cb, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val codes = Similarity.pqCodes(emb, "vec_id", "embedding", cb, 2)
    val viaCodes = Similarity.pqAdc(
      codes, "vec_id", query, "embedding", cb, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(direct === viaCodes)
  }

  test("pqTopK is partitioning-invariant (exact integer scores)") {
    val emb = (1 to 300)
      .map(i => (i.toLong, Seq.tabulate(8)(j => (i * 0.017f - j * 0.11f))))
      .toDF("vec_id", "embedding")
    val query = (0 to 0).map(_ => (0L, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.hyperplanes(4, 2)
    def run(parts: Int) = Similarity.pqTopK(
      emb.repartition(parts), "vec_id", "embedding", query, "embedding",
      codebook = cb, subspaces = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) === run(13))
  }
}
