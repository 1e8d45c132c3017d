package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Closed-form unit coverage for the round-10 operators: recall@k
  * audit, Gramian power step, DSIR importance weights, keep-best
  * cluster representative, and boustrophedon shard balancing. The
  * sf0.01 oracle gate covers the registry spellings; these pin the
  * operator semantics on hand-computable inputs plus the
  * partitioning-invariance claims the scaladocs make. */
class Round10OpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------- recallAtK
  test("recallAtK counts intersections and keeps zero-hit queries") {
    val exact = Seq(
      (0L, 10L), (0L, 11L), (1L, 20L), (1L, 21L), (2L, 30L), (2L, 31L))
      .toDF("query_id", "vec_id")
    val approx = Seq(
      (0L, 10L), (0L, 11L), (1L, 21L), (1L, 99L), (2L, 98L), (2L, 99L))
      .toDF("query_id", "vec_id")
    val got = Similarity.recallAtK(exact, approx, "query_id", "vec_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0L, 2L, 1.0), (1L, 1L, 0.5), (2L, 0L, 0.0)))
  }

  // ------------------------------------------------------ gramPowerStep
  test("gramPowerStep matches the closed-form Gramian product") {
    // v1=(1.0, 2.0), v2=(0.5, -1.0): grid 1e-3 → q1=(1000,2000) s=3000;
    // q2=(500,-1000) s=-500. y1 = 1000*3000 + 500*(-500) = 2_750_000;
    // y2 = 2000*3000 + (-1000)*(-500) = 6_500_000.
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(0.5f, -1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.gramPowerStep(emb, "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2750000L, 2L -> 6500000L))
  }

  test("gramPowerStep is partitioning-invariant (exact BIGINT sums)") {
    val emb = (1 to 200)
      .map(i => (i.toLong, Seq.tabulate(8)(j => (i * 0.013f - j * 0.07f))))
      .toDF("vec_id", "embedding")
    val a = Similarity.gramPowerStep(emb.repartition(1), "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.gramPowerStep(emb.repartition(13), "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b && a.size === 8)
  }

  // ------------------------------------------------- ImportanceWeights
  test("importance weights match hand-computed smoothed ratios") {
    // background: a:2 b:1 c:1, Nb=4, V=3; target (doc 1): a:1 b:1, Nt=2.
    // ratio(a)=round(1e6*(2*7)/(3*5))=933333, ratio(b)=round(1e6*14/10)
    // =1400000, ratio(c)=round(1e6*7/10)=700000.
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a c", "fr")).toDF("doc_id", "text", "lang")
    val got = ImportanceWeights
      .unigram(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((2L, 933333L + 1400000L)),
      2L -> ((2L, 933333L + 700000L))))
  }

  test("target-slice docs outscore off-target docs with disjoint vocab") {
    val docs = (1 to 30).map { i =>
      if (i % 2 == 0) (i.toLong, "x y z x", "en")
      else (i.toLong, "p q r p", "fr")
    }.toDF("doc_id", "text", "lang")
    val rows = ImportanceWeights
      .unigram(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val (en, fr) = rows.partition(_._1 % 2 == 0)
    assert(en.map(_._2).min > fr.map(_._2).max)
  }

  // ----------------------------------------------------- bestPerCluster
  test("bestPerCluster keeps the max-score doc, ties to the lower id") {
    // cluster {1,2,3}: scores 5,9,9 → rep 2 (tie 2 vs 3 → lower id);
    // cluster {7,8}: scores 4,1 → rep 7; singleton 9 (score 6) → itself.
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 1L), (9L, 6L))
      .toDF("doc_id", "score")
    val got = DedupClusters
      .bestPerCluster(pairs, "id_a", "id_b", docs, "doc_id", "score")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 9L, 3L)),
      7L -> ((7L, 4L, 2L)),
      9L -> ((9L, 6L, 1L))))
  }

  // ------------------------------------------------------- ShardBalance
  test("boustrophedon assignment deals the exact snake order") {
    // 4 docs, 2 shards: ranks 1..4 (size desc) → pos 0,1,2,3 →
    // shards 0,1,1,0. Sizes 40,30,20,10 → shard0={40,10}, shard1={30,20}.
    val docs = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))
      .toDF("doc_id", "sz")
    val got = ShardBalance.assign(docs, "doc_id", "sz", nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    val rep = ShardBalance.report(docs, "doc_id", "sz", nShards = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep === Map(0L -> ((2L, 50L)), 1L -> ((2L, 50L))))
  }

  test("shard masses balance within the max document size") {
    // near-LPT bound for the snake deal: with every 2S-window pairing a
    // large pick with a small one, total spread stays within the
    // largest single document.
    val docs = (1 to 500).map(i => (i.toLong, ((i * 7919) % 997 + 1).toLong))
      .toDF("doc_id", "sz")
    val totals = ShardBalance.report(docs, "doc_id", "sz", nShards = 8)
      .collect().map(_.getLong(2))
    assert(totals.length === 8)
    assert(totals.max - totals.min <= 997L)
  }

  test("shard assignment is partitioning-invariant") {
    val docs = (1 to 300).map(i => (i.toLong, ((i * 131) % 50 + 1).toLong))
      .toDF("doc_id", "sz")
    val a = ShardBalance.assign(docs.repartition(1), "doc_id", "sz", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = ShardBalance.assign(docs.repartition(17), "doc_id", "sz", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
  }
}
