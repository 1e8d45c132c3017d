package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Closed-form coverage for the stored lexical index: build contents,
  * refresh ≡ rebuild, the driver-side literal spellings vs the engine
  * spellings, and a hand-computed BM25 fixture. The DuckDB oracles
  * (s28–s31, n122) gate the serving answers end-to-end; these pin the
  * pieces. */
class LexicalIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c a b"),   // grams(2): "a b"(tf 2), "b c", "c a"; dl 5
    (2L, "a b x"),       // grams(2): "a b", "b x"; dl 3
    (3L, "zz"),          // shorter than n: no postings, still in meta
    (4L, "b c b c"))     // grams(2): "b c"(tf 2), "c b"; dl 4
    .toDF("doc_id", "text")

  test("build: postings carry exact ns/dl/tf; lexicon df; meta counts") {
    val path = "target/test_lexidx/build"
    LexicalIndex.build(corpus, "doc_id", "text", path, n = 2, buckets = 4)
    val post = LexicalIndex.postings(spark, path)
      .select("doc_id", "ns", "dl", "shingle", "tf")
      .collect()
      .map(r => (r.getLong(0), r.getString(3)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(post === Map(
      (1L, "a b") -> ((3L, 5L, 2L)),
      (1L, "b c") -> ((3L, 5L, 1L)),
      (1L, "c a") -> ((3L, 5L, 1L)),
      (2L, "a b") -> ((2L, 3L, 1L)),
      (2L, "b x") -> ((2L, 3L, 1L)),
      (4L, "b c") -> ((2L, 4L, 2L)),
      (4L, "c b") -> ((2L, 4L, 1L))))
    val lex = spark.read.parquet(s"$path/lexicon")
      .collect().map(r => r.getAs[String]("shingle") -> r.getAs[Long]("df")).toMap
    assert(lex === Map("a b" -> 2L, "b c" -> 2L, "c a" -> 1L,
      "b x" -> 1L, "c b" -> 1L))
    val meta = spark.read.parquet(s"$path/meta").collect().head
    assert((meta.getAs[Long]("n_docs"), meta.getAs[Long]("n_tokens")) ===
      ((4L, 5L + 3L + 1L + 4L))) // doc 3 counts even with no postings
  }

  test("refresh == rebuild: postings set, lexicon and meta all converge") {
    val inc = "target/test_lexidx/inc"
    val full = "target/test_lexidx/full"
    val base = corpus.filter(col("doc_id") <= 2)
    val delta = corpus.filter(col("doc_id") > 2)
    LexicalIndex.build(base, "doc_id", "text", inc, n = 2, buckets = 4)
    LexicalIndex.refresh(delta, "doc_id", "text", inc)
    LexicalIndex.build(corpus, "doc_id", "text", full, n = 2, buckets = 4)
    def posts(p: String) = LexicalIndex.postings(spark, p)
      .select("doc_id", "ns", "dl", "shingle", "tf", "bucket")
      .collect().map(_.toSeq).toSet
    def lexi(p: String) = LexicalIndex.lexicon(spark, p)
      .select("shingle", "df").collect().map(_.toSeq).toSet
    def meta(p: String) = LexicalIndex.metaRow(spark, p)
      .select("n_docs", "n_tokens").collect().map(_.toSeq).toSet
    assert(posts(inc) === posts(full))
    assert(lexi(inc) === lexi(full))
    assert(meta(inc) === meta(full))
    // the refresh appended a generation (LSM) — compaction folds it
    // back to one without changing the logical relations
    assert(spark.read.parquet(s"$inc/meta").count() === 2L)
    LexicalIndex.compact(spark, inc)
    assert(spark.read.parquet(s"$inc/meta").count() === 1L)
    assert(posts(inc) === posts(full))
    assert(lexi(inc) === lexi(full))
    assert(meta(inc) === meta(full))
    val lexRows = spark.read.parquet(s"$inc/lexicon").count()
    assert(lexRows === lexi(full).size.toLong,
      "compacted lexicon must hold exactly one row per shingle")
  }

  test("literalShingles and bucketOf match the engine spellings exactly") {
    val texts = Seq("a b c a b", "x  y  z", "", "single", "héllo wörld ✓ tail")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val engine = df
      .select(col("i"),
        TextOps.shinglesFromTokens(TextOps.tokens(col("t")), 2).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(LexicalIndex.literalShingles(t, 2) === engine(i),
        s"driver-side shingling diverged for: '$t'")
    }
    val allSh = engine.values.flatten.toSeq.distinct
    if (allSh.nonEmpty) {
      val engineBuckets = allSh.toDF("sh")
        .select(col("sh"), pmod(TextOps.hexHash60(col("sh")), lit(16L)).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      allSh.foreach { sh =>
        assert(LexicalIndex.bucketOf(sh, 16) === engineBuckets(sh),
          s"driver-side bucket diverged for: '$sh'")
      }
    }
  }

  test("bm25TopK matches the hand-computed closed form on a tiny corpus") {
    // corpus above, query doc 1, n = 2. Query grams: "a b", "b c", "c a".
    // N = 4, T = 13. idf grid: w(sh) = round(1e6 * N / df).
    //   w("a b") = round(1e6*4/2) = 2000000; w("b c") = 2000000;
    //   w("c a") = 1000000 * 4 = 4000000.
    // term(w, tf, dl) = round(w * 22.0 * T * tf / (10*T*tf + 3*T + 9*dl*N))
    // doc 2 (dl 3): shares "a b" tf 1 →
    //   round(2e6*22*13*1 / (130 + 39 + 108)) = round(572000000/277)
    // doc 4 (dl 4): shares "b c" tf 2 →
    //   round(2e6*22*13*2 / (260 + 39 + 144)) = round(1144000000/443)
    val path = "target/test_lexidx/bm25"
    LexicalIndex.build(corpus, "doc_id", "text", path, n = 2, buckets = 4)
    val got = LexicalIndex.bm25TopK(spark, path, queryDocId = 1L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d2 = math.round(2000000.0 * 22.0 * 13.0 * 1.0 / (130 + 39 + 108))
    val d4 = math.round(2000000.0 * 22.0 * 13.0 * 2.0 / (260 + 39 + 144))
    assert(got === Map(2L -> d2, 4L -> d4))
    assert(got(4L) > got(2L), "higher tf must outrank at similar idf mass")
  }

  test("pointProbe on a stored doc's text ranks exactly like the idf-sum for its shingles") {
    val path = "target/test_lexidx/probe"
    LexicalIndex.build(corpus, "doc_id", "text", path, n = 2, buckets = 4)
    // query text = doc 1's text; probe includes doc 1 itself (the
    // point probe has no self-exclusion — the query is ad hoc)
    val got = LexicalIndex.pointProbe(spark, path, "a b c a b", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // w as in the bm25 fixture; idf-sum per doc over SHARED distinct
    // grams: doc1 all three = 2e6+2e6+4e6; doc2 "a b" = 2e6;
    // doc4 "b c" = 2e6
    assert(got === Map(1L -> 8000000L, 2L -> 2000000L, 4L -> 2000000L))
  }

  test("tombstone == rebuild on the remaining corpus; compact drops rows physically") {
    val del = "target/test_lexidx/forget"
    val rem = "target/test_lexidx/remain"
    LexicalIndex.build(corpus, "doc_id", "text", del, n = 2, buckets = 4)
    LexicalIndex.tombstone(
      corpus.filter(col("doc_id") === 1), "doc_id", "text", del)
    LexicalIndex.build(
      corpus.filter(col("doc_id") =!= 1), "doc_id", "text", rem,
      n = 2, buckets = 4)
    def posts(p: String) = LexicalIndex.postings(spark, p)
      .select("doc_id", "ns", "dl", "shingle", "tf", "bucket")
      .collect().map(_.toSeq).toSet
    def lexi(p: String) = LexicalIndex.lexicon(spark, p)
      .select("shingle", "df").collect().map(_.toSeq).toSet
    def meta(p: String) = LexicalIndex.metaRow(spark, p)
      .select("n_docs", "n_tokens").collect().map(_.toSeq).toSet
    assert(posts(del) === posts(rem))
    assert(lexi(del) === lexi(rem))
    assert(meta(del) === meta(rem))
    // "c a" existed only in doc 1 — its df folded to 0 and it must have
    // left the logical vocabulary
    assert(!lexi(del).exists(_.head == "c a"))
    // the PHYSICAL postings still hold doc 1's rows until compaction
    val physBefore = spark.read.parquet(s"$del/postings").count()
    LexicalIndex.compact(spark, del)
    val physAfter = spark.read.parquet(s"$del/postings").count()
    assert(physAfter < physBefore,
      "compact must drop the tombstoned postings physically")
    assert(!new java.io.File(s"$del/tombstones").exists(),
      "compact must clear the forget-set")
    assert(posts(del) === posts(rem))
    assert(lexi(del) === lexi(rem))
    assert(meta(del) === meta(rem))
  }

  test("tombstone is idempotent: a re-delivered delete subtracts nothing twice") {
    val once = "target/test_lexidx/forget_once"
    val twice = "target/test_lexidx/forget_twice"
    Seq(once, twice).foreach { p =>
      LexicalIndex.build(corpus, "doc_id", "text", p, n = 2, buckets = 4)
      LexicalIndex.tombstone(
        corpus.filter(col("doc_id") === 1), "doc_id", "text", p)
    }
    // the retry: same forget-set again (plus an already-deleted overlap)
    LexicalIndex.tombstone(
      corpus.filter(col("doc_id") === 1), "doc_id", "text", twice)
    def lexi(p: String) = LexicalIndex.lexicon(spark, p)
      .select("shingle", "df").collect().map(_.toSeq).toSet
    def meta(p: String) = LexicalIndex.metaRow(spark, p)
      .select("n_docs", "n_tokens").collect().map(_.toSeq).toSet
    assert(lexi(twice) === lexi(once),
      "a double delete must not subtract df twice")
    assert(meta(twice) === meta(once),
      "a double delete must not shrink meta twice")
    // and the tombstone list holds the id once
    assert(spark.read.parquet(s"$twice/tombstones").count() === 1L)
  }

  test("tombstoned serving answers match the rebuilt index's answers") {
    val del = "target/test_lexidx/forget_serve"
    val rem = "target/test_lexidx/remain_serve"
    LexicalIndex.build(corpus, "doc_id", "text", del, n = 2, buckets = 4)
    LexicalIndex.tombstone(
      corpus.filter(col("doc_id") === 2), "doc_id", "text", del)
    LexicalIndex.build(
      corpus.filter(col("doc_id") =!= 2), "doc_id", "text", rem,
      n = 2, buckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(LexicalIndex.moreLikeThis(spark, del, 1L, 10)) ===
      rows(LexicalIndex.moreLikeThis(spark, rem, 1L, 10)))
    assert(rows(LexicalIndex.lexicalTopK(spark, del, 1L, 10)) ===
      rows(LexicalIndex.lexicalTopK(spark, rem, 1L, 10)))
    assert(rows(LexicalIndex.bm25TopK(spark, del, 1L, 10)) ===
      rows(LexicalIndex.bm25TopK(spark, rem, 1L, 10)))
    assert(rows(LexicalIndex.pointProbe(spark, del, "a b x", 10)) ===
      rows(LexicalIndex.pointProbe(spark, rem, "a b x", 10)))
  }
}
