package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level maintenance orchestration — ONE call per lifecycle
  * event, fanned out to every stored layout a deployment keeps.
  *
  * The gap this closes (the round-13 review's #1 missing piece): a
  * production GDPR deletion request names USER DATA, not layouts. A
  * deployment that indexes one corpus six ways (near-dup registry,
  * standalone band index, lexical index, KMV overlap sketches, IVF
  * vectors, chunk store) must fan the delete out to six per-layout
  * forget calls — and forgetting five of six silently RETAINS the doc
  * in the sixth, exactly the failure mode no per-layout oracle can
  * see. [[forget]] takes one id set, one batch id, and applies it
  * everywhere.
  *
  * IDEMPOTENT UNDER PARTIAL FAILURE by construction: every per-layout
  * forget is already marker-gated (`_applied/ts-<batchId>` under its
  * own path — the [[LsmLayout]] at-least-once contract), so a
  * coordinator crash between layouts is repaired by re-running the
  * SAME call: layouts that committed no-op on their markers, layouts
  * the crash skipped apply now. The s55 oracle gates exactly that
  * (two layouts "crash-applied" individually, then the coordinator
  * completes and replays).
  *
  * Writer fencing: epochs are PATH-scoped ([[LsmLayout]]), so one
  * coordinator epoch cannot fence six paths; `epochOf` maps each
  * layout path to the epoch its maintenance loop holds (default
  * unfenced — batch jobs, tests).
  *
  * 100 TB shape: pure fan-out of forget-set-sized work — each layout
  * call writes one tombstone id list (plus the lexical negative-df
  * generation, recomputed map-only from the forget docs' text); no
  * stored relation is scanned or rewritten. [[compact]] fans out the
  * snapshot-atomic per-layout compacts when physical reclamation is
  * due — deliberately the corpus-sized pass, per the layout contract.
  */
object CorpusLifecycle {

  /** The stored-layout paths one corpus is indexed under; `None` =
    * the deployment does not keep that layout. */
  final case class CorpusLayouts(
      registry: Option[String] = None,
      band: Option[String] = None,
      lexical: Option[String] = None,
      kmv: Option[String] = None,
      ivf: Option[String] = None,
      chunks: Option[String] = None) {
    def paths: Seq[String] =
      Seq(registry, band, lexical, kmv, ivf, chunks).flatten
  }

  /** Right-to-be-forgotten across the whole corpus: ONE forget-set
    * (`forgetDocs`, carrying `idCol` everywhere and `textCol` for the
    * lexical negative-df recompute), ONE batch id, every layout. After
    * this returns, no serving path of any configured layout returns
    * the docs: the registry fold and canonical view, band probes and
    * point probes, lexical probes/idf/BM25, KMV group folds and the
    * overlap matrix, IVF top-k, and chunk reconstruction. Ids also
    * never resurface as candidates in later ingests. Retry with the
    * same batch id to complete a partially-failed fan-out. */
  def forget(
      forgetDocs: DataFrame, idCol: String, textCol: String,
      layouts: CorpusLayouts, batchId: String,
      epochOf: String => Option[Long] = _ => None): Unit = {
    val ids = forgetDocs.select(col(idCol))
    layouts.registry.foreach(p =>
      ClusterRegistry.forget(ids, idCol, p, batchId, epochOf(p)))
    layouts.band.foreach(p =>
      BandIndex.tombstone(ids, idCol, p, batchId, epochOf(p)))
    layouts.lexical.foreach(p =>
      LexicalIndex.tombstone(forgetDocs, idCol, textCol, p, batchId,
        epochOf(p)))
    layouts.kmv.foreach(p =>
      KmvLayout.tombstone(ids, idCol, p, batchId, epochOf(p)))
    layouts.ivf.foreach(p =>
      IvfLayout.tombstone(ids, idCol, p, batchId, epochOf(p)))
    layouts.chunks.foreach(p =>
      ChunkStore.tombstone(ids, idCol, p, batchId, epochOf(p)))
  }

  /** Fan out the snapshot-atomic compacts — physical reclamation of
    * every pending forget across the corpus (each layout writes a new
    * immutable base generation and flips its manifest; concurrent
    * readers are safe throughout, per the [[LsmLayout]] snapshot
    * contract). Each layout compacts independently; a crash mid-fan-out
    * leaves the remaining layouts' forget-sets pending (still correct
    * at serve time) for the next call. */
  def compact(
      spark: SparkSession, layouts: CorpusLayouts,
      epochOf: String => Option[Long] = _ => None): Unit = {
    layouts.registry.foreach(p =>
      ClusterRegistry.compact(spark, p, epochOf(p)))
    layouts.band.foreach(p => BandIndex.compact(spark, p, epochOf(p)))
    layouts.lexical.foreach(p => LexicalIndex.compact(spark, p, epochOf(p)))
    layouts.kmv.foreach(p => KmvLayout.compact(spark, p, epochOf(p)))
    layouts.ivf.foreach(p => IvfLayout.compact(spark, p, epochOf(p)))
    layouts.chunks.foreach(p => ChunkStore.compact(spark, p, epochOf(p)))
  }

  /** The deletion-audit relation: per layout, how many of `auditIds`
    * any serving path still returns (must be 0 after [[forget]]) and
    * how many documents survive — the report a compliance check reads,
    * computed from the REAL serving paths, not the tombstone lists.
    * One row per configured layout. */
  def forgetAudit(
      spark: SparkSession, layouts: CorpusLayouts,
      auditIds: DataFrame, idCol: String): DataFrame = {
    val ids = broadcast(
      auditIds.select(col(idCol).cast("string").as("graft__fid")))
    // string-typed key compare: the layouts key differently (doc ids,
    // group names, vec ids) — a silent numeric/string coercion must
    // not be possible
    def audit(name: String, served: DataFrame, docCol: String): DataFrame =
      served.select(col(docCol).cast("string").as("graft__d")).distinct()
        .join(ids, col("graft__d") === col("graft__fid"), "left")
        .agg(
          sum(when(col("graft__fid").isNotNull, 1L).otherwise(0L))
            .as("forgotten_served"),
          count(lit(1)).as("survivors"))
        .select(lit(name).as("layout"),
          col("forgotten_served"), col("survivors"))
    val parts =
      layouts.registry.map(p => audit("registry",
        ClusterRegistry.assignments(spark, p), "doc_id")).toSeq ++
      layouts.band.map(p => audit("band",
        BandIndex.signatures(spark, p), "doc_id")) ++
      layouts.lexical.map(p => audit("lexical",
        LexicalIndex.postings(spark, p), "doc_id")) ++
      layouts.kmv.map(p => audit("kmv",
        KmvLayout.sketches(spark, p), "group")) ++
      layouts.ivf.map(p => audit("ivf",
        IvfLayout.vectors(spark, p), "vec_id")) ++
      layouts.chunks.map(p => audit("chunks",
        ChunkStore.reconstruct(spark, p), "doc_id"))
    parts.reduce(_ unionByName _)
  }
}
