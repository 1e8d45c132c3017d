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

  test("dropProvenance labels every doc with the FIRST dropping rule") {
    import spark.implicits._
    val base = text("w", 60)
    val docs = Seq(
      (1L, base, "en", "web"),
      (2L, base, "en", "web"), // exact dup of 1
      (3L, text("w", 59) + " zz", "en", "web"), // near dup of 1
      (4L, "eval leak alpha beta gamma delta epsilon tail", "en", "web"),
      (5L, "too short", "en", "web"),
      (6L, text("u", 40), "de", "web"),
      (7L, text("v", 40), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val benchmark = Seq(
      (100L, "prefix eval leak alpha beta gamma suffix"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline.dropProvenance(
      docs, benchmark, CorpusPipeline.Config(minTokens = 5L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "contaminated", 5L -> "length_gate",
      6L -> "kept", 7L -> "kept"))
    // the verdict relation is total over the input: same ids in = out
    assert(got.keySet === (1L to 7L).toSet)
  }

  test("trainingSet: staged materializer (the 100 TB swap) matches the cached default") {
    import spark.implicits._
    val base = text("w", 60)
    val docs = Seq(
      (1L, base, "en", "web"),
      (2L, base, "en", "web"),
      (3L, text("w", 59) + " zz", "en", "web"),
      (6L, text("u", 40), "de", "web"),
      (7L, text("v", 40), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val benchmark = Seq((100L, "prefix eval leak alpha beta gamma suffix"))
      .toDF("doc_id", "text")
    def run(m: graft.operators.MinHashNearDup.Materializer) =
      CorpusPipeline.trainingSet(docs, benchmark,
        CorpusPipeline.Config(minTokens = 5L, packTokens = 50L, shards = 2,
          materialize = m))
        .select("doc_id", "shard", "pack", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    val cached = run(graft.operators.MinHashNearDup.cacheMaterializer)
    val staged = run(graft.operators.MinHashNearDup.stagedMaterializer("cps_"))
    assert(staged === cached)
    assert(staged.map(_._1) === Seq(1L, 6L, 7L))
  }

  test("trainingSet: corpus-scale near-dup drop list (AQE path, no forced broadcast)") {
    import spark.implicits._
    // 3/4 of the corpus is one near-dup cluster — the shape where a
    // forced broadcast of the drop list would OOM at real scale and the
    // pipeline deliberately leaves the join strategy to AQE
    // (CorpusPipeline.scala drop-list NOTE). 30 variants of one base doc
    // (base + one distinct trailing word each) collapse to rep doc 1;
    // docs 31-40 are mutually unrelated and all survive.
    val base = text("w", 60)
    val docs = (
      (1L to 30L).map(i => (i, s"$base z$i", "en", "web")) ++
        (31L to 40L).map(i => (i, text(s"u${i}x", 40), "en", "web")))
      .toDF("doc_id", "text", "lang", "source")
    val benchmark = Seq((999L, "unrelated benchmark words only here"))
      .toDF("doc_id", "text")

    val out = CorpusPipeline.trainingSet(
      docs, benchmark, CorpusPipeline.Config(minTokens = 5L))

    // the drop-list anti-joins themselves must not carry a broadcast
    // hint — their strategy is AQE's runtime call (other stages DO hint
    // deliberately: the benchmark shingle set, rate dims)
    // (only the TOP of the drop-list subtree matters: stages deeper in
    // the pipeline hint deliberately, e.g. the benchmark shingle set)
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project, ResolvedHint}
    def topOp(p: LogicalPlan): LogicalPlan = p match {
      case pr: Project => topOp(pr.child)
      case other => other
    }
    val hintedAnti = out.queryExecution.analyzed.collect {
      case j: Join if j.joinType.sql == "LEFT ANTI" => topOp(j.right)
    }.collect { case h: ResolvedHint => h }
    assert(hintedAnti.isEmpty, "drop-list anti-join must be left to AQE")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === (1L +: (31L to 40L)).toArray)
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
