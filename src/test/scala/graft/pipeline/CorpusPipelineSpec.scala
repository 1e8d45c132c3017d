package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusPipelineSpec extends SparkTestBase {

  private def text(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("trainingSet: each stage drops exactly the planted offenders, packs the rest") {
    import spark.implicits._
    val base = text("w", 60)
    val nearDup = text("w", 59) + " zz" // ~0.93 Jaccard vs base
    val docs = Seq(
      (1L, base, "en", "web"),
      (2L, base, "en", "web"), // exact dup of 1 → dropped
      (3L, nearDup, "en", "web"), // near dup of 1 → dropped (1 is rep)
      (4L, "eval leak alpha beta gamma delta epsilon tail", "en", "web"), // contaminated
      (5L, "too short", "en", "web"), // under minTokens
      (6L, text("u", 40), "de", "web"),
      (7L, text("v", 40), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val benchmark = Seq(
      (100L, "prefix eval leak alpha beta gamma suffix"))
      .toDF("doc_id", "text")

    val out = CorpusPipeline.trainingSet(
      docs, benchmark,
      CorpusPipeline.Config(minTokens = 5L, packTokens = 50L, shards = 2))
      .select("doc_id", "lang", "shard", "pack", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)

    assert(out.map(_._1).toSeq === Seq(1L, 6L, 7L))
    // packing: shard = doc_id % 2 → shard 0: [6], shard 1: [1, 7];
    // doc 1 starts at offset 0 → pack 0; doc 7 starts at 60 → pack 1
    val byDoc = out.map(r => r._1 -> (r._3, r._4)).toMap
    assert(byDoc(1L) === (1L, 0L))
    assert(byDoc(7L) === (1L, 1L))
    assert(byDoc(6L) === (0L, 0L))
  }

  test("trainingSet: stratified rates downsample only the configured language") {
    import spark.implicits._
    val docs = (1L to 60L).map(i =>
      (i, text(s"d${i}x", 30), if (i % 2 == 0) "en" else "de", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val benchmark = Seq((999L, "unrelated benchmark words only here"))
      .toDF("doc_id", "text")

    val out = CorpusPipeline.trainingSet(
      docs, benchmark,
      CorpusPipeline.Config(
        minTokens = 1L,
        sampleRatesPer10k = Map("en" -> 0L))) // drop ALL en, keep all de
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))

    assert(out.forall(_._2 == "de"))
    assert(out.length === 30)
  }
}
