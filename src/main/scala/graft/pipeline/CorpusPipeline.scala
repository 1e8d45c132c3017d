package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, DedupClusters, MinHashNearDup, Partitioning, TextOps}

/** The LLM-training-data pipeline as one composed program — the
  * north-star counterpart to [[BikesharePipeline]]: every stage is an
  * operator this library ships, chained the way a production corpus
  * build chains them.
  *
  *   raw docs
  *     → exact dedup           (hash-keyed, body never shuffles)
  *     → near-dup dedup        (MinHash-LSH pairs → clusters → keep
  *                              one representative per cluster)
  *     → decontamination       (drop docs sharing an n-gram with the
  *                              benchmark/eval set)
  *     → quality gate          (token-count bounds)
  *     → stratified sampling   (per-language md5-residue rates)
  *     → sequence packing      (sharded running-offset 2048-token packs)
  *
  * Everything except the cluster fixpoint (inherently iterative, see
  * DedupClusters) is one lazy plan; no stage materializes the corpus
  * driver-side. Stage order matters and is the standard one: dedup
  * before decontamination (fewer docs to shingle), quality before
  * sampling (rates apply to the clean pool), packing last (pack ids
  * depend on every upstream drop).
  *
  * Scan discipline: the corpus is scanned and tokenized ONCE, into a
  * materialized (per Config.materialize) relation that every stage
  * reads — the content hash, both shingle widths (near-dup 3-grams,
  * decontamination 5-grams), the token gate and the packing offsets
  * all derive from the same cached tokens. Without this each stage
  * re-reads the source and re-splits every document: at 100 TB that is
  * three extra corpus scans, and even at bench scale it dominated the
  * pipeline's steady state.
  */
object CorpusPipeline {

  final case class Config(
      nearDupThreshold: Double = 0.8,
      contaminationNgram: Int = 5,
      minTokens: Long = 10L,
      maxTokens: Long = 100000L,
      sampleRatesPer10k: Map[String, Long] = Map.empty, // lang → keep threshold
      defaultRatePer10k: Long = 10000L, // unlisted langs keep everything
      packTokens: Long = 2048L,
      shards: Int = 32,
      // executor cache by default; a 100 TB run passes
      // MinHashNearDup.stagedMaterializer to stage through the warehouse
      materialize: MinHashNearDup.Materializer = MinHashNearDup.cacheMaterializer)

  /** Every stage's survivor/drop relations, shared by [[trainingSet]]
    * (which packs the final pool) and [[dropProvenance]] (which labels
    * every input doc with the FIRST rule that dropped it). One
    * builder, so the two surfaces cannot drift. */
  private final case class Stages(
      tokenized: DataFrame,
      dupDrops: DataFrame,
      dropIds: DataFrame,
      contaminated: DataFrame,
      gated: DataFrame,
      sampled: DataFrame)

  /** docs(doc_id, text, lang, source, …) + benchmark(doc_id, text, …) →
    * training set with (shard, pack) assignment. */
  def trainingSet(
      docs: DataFrame,
      benchmark: DataFrame,
      config: Config = Config()): DataFrame = {
    val st = buildStages(docs, benchmark, config)

    // 6. sequence packing: sharded running offsets (n38 shape) — each
    //    shard packs independently, no global order
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    st.sampled
      .withColumn("shard", col("doc_id") % config.shards)
      .withColumn("graft__cum", sum(col("graft__n_tok")).over(w))
      .withColumn("pack",
        ((col("graft__cum") - col("graft__n_tok")) / config.packTokens)
          .cast("long"))
      .drop("graft__cum", "graft__ws", "graft__md5")
      .withColumnRenamed("graft__n_tok", "n_tokens")
  }

  /** Data-governance provenance: every input doc labeled with the
    * FIRST pipeline rule that dropped it (`exact_dup` → `near_dup` →
    * `contaminated` → `length_gate` → `sampled_out`) or `kept` — the
    * audit trail behind n40's training set, from the SAME stage
    * relations (one builder, no drift). Verdicts are id-keyed left
    * joins of the drop lists (16-byte rows, AQE-broadcast when small);
    * the priority chain is a per-row CASE. */
  def dropProvenance(
      docs: DataFrame,
      benchmark: DataFrame,
      config: Config = Config()): DataFrame = {
    val st = buildStages(docs, benchmark, config)
    def mark(df: DataFrame, name: String): DataFrame =
      df.select(col("doc_id"), lit(true).as(name))
    // gate and sampling are ROW-LOCAL predicates on the tokenized
    // relation (shared spellings: gatePass/sampleAdmit) — evaluating
    // them inline instead of joining st.gated/st.sampled id sets keeps
    // this to THREE drop-list joins; the naive spelling re-executed the
    // whole decontamination chain once per downstream mark (7.1s vs
    // ~3s at sf0.1 bench scale)
    st.tokenized.select(col("doc_id"), col("lang"), col("graft__n_tok"))
      .join(mark(st.dupDrops, "graft__ex"), Seq("doc_id"), "left")
      .join(mark(st.dropIds, "graft__nd"), Seq("doc_id"), "left")
      .join(mark(st.contaminated, "graft__ct"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("graft__ex"), "exact_dup")
          .when(col("graft__nd"), "near_dup")
          .when(col("graft__ct"), "contaminated")
          .when(!gatePass(config), "length_gate")
          .when(!sampleAdmit(config), "sampled_out")
          .otherwise("kept").as("verdict"))
  }

  /** Row-local admission predicates shared by the stage chain and the
    * provenance CASE — both read them from here so the spellings
    * cannot drift. */
  private def gatePass(config: Config) =
    col("graft__n_tok").between(config.minTokens, config.maxTokens)

  private def sampleAdmit(config: Config) = {
    val keepExpr = config.sampleRatesPer10k
      .foldLeft(lit(config.defaultRatePer10k)) { case (acc, (lang, rate)) =>
        when(col("lang") === lang, lit(rate)).otherwise(acc)
      }
    TextOps.hexHash60(col("doc_id").cast("string")) % 10000 < keepExpr
  }

  private def buildStages(
      docs: DataFrame,
      benchmark: DataFrame,
      config: Config): Stages = {
    val spark = docs.sparkSession

    // 0. the ONE corpus scan: tokens, token count and content hash
    //    materialize together; every stage below reads this relation
    val tokenized = config.materialize(
      Partitioning.spread(docs)
        .withColumn("graft__ws", TextOps.tokens(col("text")))
        .withColumn("graft__n_tok", size(col("graft__ws")).cast("long"))
        .withColumn("graft__md5", md5(col("text"))),
      "tokenized")

    // 1. exact dedup: min doc_id survives per content hash. The window
    //    runs over a (hash, id) PROJECTION of the tokenized relation —
    //    windowing the full frame would shuffle every body and token
    //    array by md5 — and the non-survivors come back as an anti-join
    //    drop list (16-byte rows; AQE broadcasts it when the dup
    //    fraction is small, the common corpus case), so the corpus body
    //    never enters the dedup exchange at all.
    val byHash = Window.partitionBy(col("graft__md5"))
    val dupDrops = tokenized
      .select(col("graft__md5"), col("doc_id"))
      .withColumn("graft__keep_id", min(col("doc_id")).over(byHash))
      .filter(col("doc_id") =!= col("graft__keep_id"))
      .select(col("doc_id"))
    val exactDeduped = tokenized
      .join(dupDrops, Seq("doc_id"), "left_anti")

    // 2. near-dup: pairs from banded LSH, clusters from the pair
    //    graph, keep the minimum-id representative of each cluster
    val pairs = MinHashNearDup.nearDupPairsFromTokens(
      exactDeduped.select(col("doc_id"), col("graft__ws").as("ws")),
      config.nearDupThreshold, materialize = config.materialize)
    // NOTE both drop lists join WITHOUT a broadcast hint: their size is
    // data-dependent (a heavily-duplicated or heavily-contaminated
    // corpus makes them corpus-scale), so forcing a broadcast is an
    // OOM at exactly the corpora dedup matters most for. AQE broadcasts
    // them anyway when they turn out small.
    val dropIds = DedupClusters
      .keepOnePerCluster(pairs, "id_a", "id_b")
      .filter(!col("keep"))
      .select(col("doc_id"))
    val nearDeduped = exactDeduped
      .join(dropIds, Seq("doc_id"), "left_anti")

    // 3. decontamination: any shared n-gram with the benchmark drops
    //    the doc (exact-collision policy; see Decontaminate) — corpus
    //    side reads the shared tokens, only the tiny benchmark splits
    val contaminated = Decontaminate
      .collisionStatsFromTokens(
        nearDeduped.select(col("doc_id"), col("graft__ws").as("ws")),
        benchmark, "text", config.contaminationNgram)
      .select(col("doc_id"))
    val clean = nearDeduped
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 4. quality gate: token-count bounds, already on the tokenized
    //    relation — no recompute
    val gated = clean.filter(gatePass(config))

    // 5. stratified sampling: per-lang keep thresholds over the same
    //    coordination-free md5 residue as n24/n32
    val sampled = gated.filter(sampleAdmit(config))

    Stages(tokenized, dupDrops, dropIds, contaminated, gated, sampled)
  }
}
