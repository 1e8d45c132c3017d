package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental cluster maintenance: merge-by-bridge, id stability,
  * retry idempotency, and the no-pair batch. The n177 oracle gates
  * build∘ingest ≡ batch closure end-to-end; these pin the mechanics
  * on a hand-computed fixture. */
class ClusterRegistrySpec extends SparkTestBase {
  import spark.implicits._

  private def run(lo: Int, hi: Int, extra: String = ""): String =
    ((lo to hi).map(i => s"b$i").mkString(" ") +
      (if (extra.nonEmpty) " " + extra else "")).trim

  // corpus: docs 1,2 near-dups (J = 16/20 = 0.8), doc 3 a shifted run
  // below threshold vs both, doc 4 unrelated
  private def corpus = Seq(
    (1L, run(1, 20)),
    (2L, run(3, 22)),
    (3L, run(6, 25)),
    (4L, (1 to 20).map(i => s"z$i").mkString(" ")))
    .toDF("doc_id", "text")

  // delta doc 10 sits BETWEEN clusters {1,2} and {3}: J(10,2) =
  // J(10,3) = 17/20 = 0.85 — the bridge that must merge them
  private def delta = Seq((10L, run(4, 24))).toDF("doc_id", "text")

  private def assigned(p: String) =
    ClusterRegistry.assignments(spark, p)
      .as[(Long, Long)].collect().toMap

  test("hand fixture: the exact Jaccards are what the comment claims") {
    def sh(t: String) = LexicalIndex.literalShingles(t, 3).toSet
    def j(a: String, b: String) = {
      val (x, y) = (sh(a), sh(b))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    assert(j(run(1, 20), run(3, 22)) === 16.0 / 20.0)
    assert(j(run(3, 22), run(6, 25)) < 0.8)
    assert(j(run(1, 20), run(6, 25)) < 0.8)
    assert(j(run(4, 24), run(3, 22)) === 17.0 / 20.0)
    assert(j(run(4, 24), run(6, 25)) === 17.0 / 20.0)
    assert(j(run(4, 24), run(1, 20)) < 0.8)
  }

  test("build clusters the corpus; a bridging ingest merges with the min id; singletons persist") {
    val p = "target/test_clusterreg/merge"
    ClusterRegistry.build(corpus, "doc_id", "text", p, threshold = 0.8)
    assert(assigned(p) === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
    ClusterRegistry.ingest(corpus, delta, "doc_id", "text", p,
      batchId = "b1")
    // doc 10 bridges {1,2} (id 1) and {3}: everything merges to 1;
    // the absorbed cluster's member (doc 3) was RE-MAPPED by append
    assert(assigned(p) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 10L -> 1L))
    // ≡ a from-scratch build over the union corpus
    val full = "target/test_clusterreg/full"
    ClusterRegistry.build(
      corpus.unionByName(delta), "doc_id", "text", full, threshold = 0.8)
    assert(assigned(p) === assigned(full))
  }

  test("ingest is idempotent under clean retry and marker-less replay") {
    val p = "target/test_clusterreg/retry"
    ClusterRegistry.build(corpus, "doc_id", "text", p, threshold = 0.8)
    ClusterRegistry.ingest(corpus, delta, "doc_id", "text", p,
      batchId = "b1")
    val want = assigned(p)
    val phys = spark.read.parquet(s"$p/assignments").count()
    ClusterRegistry.ingest(corpus, delta, "doc_id", "text", p,
      batchId = "b1")
    assert(assigned(p) === want)
    assert(spark.read.parquet(s"$p/assignments").count() === phys)
    new java.io.File(s"$p/_applied/b1").delete()
    ClusterRegistry.ingest(corpus, delta, "doc_id", "text", p,
      batchId = "b1")
    assert(assigned(p) === want,
      "a replayed ingest must reproduce the same assignment")
    assert(spark.read.parquet(s"$p/assignments").count() === phys,
      "a replayed ingest must replace its generation, not append")
  }

  test("a batch with no near-dups assigns singletons and leaves everything else alone") {
    val p = "target/test_clusterreg/nopairs"
    ClusterRegistry.build(corpus, "doc_id", "text", p, threshold = 0.8)
    val before = assigned(p)
    val lone = Seq((20L, (1 to 20).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    ClusterRegistry.ingest(corpus, lone, "doc_id", "text", p,
      batchId = "b1")
    assert(assigned(p) === before + (20L -> 20L))
    // and a SECOND batch duplicating the first batch's doc pairs into
    // the now-appended band generation (stable id = 20, the min)
    val dup20 = Seq((21L, (1 to 20).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    ClusterRegistry.ingest(corpus.unionByName(lone), dup20,
      "doc_id", "text", p, batchId = "b2")
    assert(assigned(p) === before + (20L -> 20L) + (21L -> 20L),
      "the second batch must find the first batch's doc through the appended index")
  }
}
