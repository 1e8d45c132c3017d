package graft.operators

import graft.SparkTestBase

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference BPE: same greedy-leftmost fold, same
    * (count DESC, pair ASC) tie-break. Returns the merge table and the
    * fully-encoded vocabulary. */
  private def refTrainVocab(
      words: Seq[String],
      k: Int): (Seq[(Long, String, String, Long)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        w.split("").toSeq -> ws.size.toLong
      }
    val merges = (1 to k).map { r =>
      val counts = vocab.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (syms, f) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b)
            acc.init :+ (a + b)
          else acc :+ x
        } -> f
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap // merged forms may collide
      (r.toLong, a, b, n)
    }
    (merges, vocab)
  }

  private def refTrain(words: Seq[String], k: Int): Seq[(Long, String, String, Long)] =
    refTrainVocab(words, k)._1

  private def train(words: Seq[String], k: Int) =
    BpeTrainer.train(words.map(w => Tuple1(w)).toDF("text"), "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
      .sortBy(_._1)

  test("matches the reference trainer on a hand-checkable corpus") {
    // 'lo' appears in low/lower/lowest (5+4+3=12 times via word freqs)
    val words = Seq.fill(5)("low") ++ Seq.fill(4)("lower") ++
      Seq.fill(3)("lowest") ++ Seq.fill(2)("newer") ++ Seq.fill(6)("wider")
    val got = train(words, 5)
    assert(got === refTrain(words, 5))
    // first merge is (e,r): newer+wider+lower = 2+6+4 = 12, ties with
    // (l,o)/(o,w) at 12 but 'er' wins the lexicographic tie-break
    assert(got.head === ((1L, "e", "r", 12L)))
  }

  test("greedy-leftmost overlap: runs of a repeated symbol merge pairwise") {
    // 'aaaa' under merge (a,a) must become [aa][aa], not three overlaps
    val words = Seq.fill(3)("aaaa") ++ Seq.fill(1)("aab")
    val got = train(words, 2)
    assert(got === refTrain(words, 2))
    // round 1: (a,a) appears 3*3 + 1 = 10 times
    assert(got.head === ((1L, "a", "a", 10L)))
    // round 2 on ['aa','aa'] x3 + ['aa','b']: pair (aa,aa)=3, (aa,b)=1
    assert(got(1) === ((2L, "aa", "aa", 3L)))
  }

  test("deterministic across runs and frequency-monotone on mixed corpora") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    val words = Seq.fill(300)(
      (0 to rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(5))).mkString)
    val g1 = train(words, 6)
    val g2 = train(words, 6)
    assert(g1 === g2)
    assert(g1 === refTrain(words, 6))
    // merge counts never increase with rank: a merge's new pairs are
    // bounded by its own occurrence count
    val ns = g1.map(_._4)
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
  }

  test("trainVocab: encoded vocabulary matches the reference encoder") {
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(200)(
      (0 to rnd.nextInt(5)).map(_ => "abcd"(rnd.nextInt(4))).mkString)
    val got = BpeTrainer.trainVocab(
      words.map(Tuple1(_)).toDF("text"), "text", 4)
    val gotVocab = got.vocab.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getSeq[String](2).toVector))
    val (_, refVocab) = refTrainVocab(words, 4)
    // symbols concatenate back to the word, and each word's encoding
    // equals the reference encoder's
    gotVocab.foreach { case (w, f, syms) =>
      assert(syms.mkString === w, s"symbols must reassemble '$w'")
      assert(refVocab.getOrElse(syms, -1L) === f,
        s"encoding of '$w' ($syms) must appear in the reference vocab with freq $f")
    }
    assert(gotVocab.length === refVocab.size)
  }

  test("retains only the single merge-table checkpoint after training") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = BpeTrainer.train(
      Seq.fill(50)("abcabc").map(Tuple1(_)).toDF("text"), "text", 4)
    out.collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    // the per-round argmax checkpoints are copied into one final
    // merge-table checkpoint and released; the vocab-sized symbol
    // tables must all be gone too
    assert(leaked.size <= 1)
  }

  test("release() frees every checkpoint trainVocab retained") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val got = BpeTrainer.trainVocab(
      Seq.fill(30)("abab").map(Tuple1(_)).toDF("text"), "text", 3)
    got.merges.collect()
    got.vocab.collect()
    got.release()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("stops early when pairs exhaust before the budget") {
    // single-character words have no adjacent pairs after round 0:
    // 'ab' merges once, then every word is one symbol — k=5 must yield
    // exactly 1 merge and an intact (not wiped) vocabulary
    val got = BpeTrainer.trainVocab(
      (Seq.fill(4)("ab") ++ Seq.fill(2)("a")).map(Tuple1(_)).toDF("text"),
      "text", 5)
    val merges = got.merges.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq((1L, "a", "b", 4L)))
    val vocab = got.vocab.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getSeq[String](2).toVector))
      .sortBy(_._1)
    assert(vocab.toSeq === Seq(
      ("a", 2L, Vector("a")), ("ab", 4L, Vector("ab"))))
    got.release()
  }

  test("a corpus with no mergeable pairs at all yields an empty merge table") {
    val got = BpeTrainer.trainVocab(
      Seq("a", "b", "c").map(Tuple1(_)).toDF("text"), "text", 3)
    assert(got.merges.count() === 0)
    assert(got.merges.columns.toSeq ===
      Seq("merge_rank", "sym_a", "sym_b", "n"))
    assert(got.vocab.count() === 3) // intact, not wiped
    got.release()
  }
}
