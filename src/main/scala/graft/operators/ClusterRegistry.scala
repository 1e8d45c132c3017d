package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup CLUSTER maintenance with STABLE ids — the
  * production question [[BandIndex.probe]]'s pairs feed: as batches
  * arrive, every document must hold a cluster assignment that (a)
  * equals what a from-scratch batch clustering over the union corpus
  * would produce, and (b) never renames a cluster except by merging
  * (ids are the MIN doc id ever seen in the cluster, so an id can only
  * ever decrease, and only when two clusters genuinely merge).
  * Re-clustering the corpus per batch is the n50 anti-pattern; this
  * registry does delta-sized work per batch.
  *
  * Layout under `path`:
  *  - `band/` — a [[BandIndex]] over everything ingested (the probe
  *    side of each batch);
  *  - `assignments/` (doc_id, cluster_id, gen) partitioned by `batch`
  *    — LSM: a merge APPENDS re-mapping rows for the absorbed
  *    cluster's members (bounded by the absorbed cluster, not the
  *    corpus); reads fold to the latest generation per doc.
  *
  * Ingest algebra (exact, not heuristic): the delta's near-dup pairs
  * against the indexed corpus collapse the corpus side to its CLUSTER
  * id (clusters are internally connected by construction, so one
  * vertex per touched cluster suffices), within-delta pairs join as
  * delta–delta edges, and connected components over that SMALL graph
  * (delta + touched clusters) give each component's new id as the min
  * vertex — which IS the min member doc id of the merged component,
  * because every cluster-id vertex is already the min of its members.
  * Untouched clusters never appear in the graph, so their rows are
  * never rewritten. Gated: n177 proves build∘ingest(with retry AND
  * marker-less replay) ≡ the batch recursive-closure clustering over
  * the union corpus, singletons included.
  *
  * Idempotent per the [[LsmLayout]] contract; the probe excludes the
  * batch's own band generation (a crashed first attempt may have
  * appended it — the delta must not probe against itself on replay).
  * Same LSH probabilistic caveat as [[MinHashNearDup]]/s37; final
  * pairs are exact-verified, so only candidate surfacing is
  * probabilistic.
  *
  * 100 TB shape: per batch — delta-sized sketching, a band join
  * against pruned posting partitions, candidate-sized verify,
  * CC over a (delta + touched clusters)-sized graph, and appends
  * bounded by |delta| + |absorbed clusters|. Nothing corpus-sized is
  * read except the band join's narrow posting stream.
  */
object ClusterRegistry {

  def build(
      docs: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.8): Unit = {
    val spark = docs.sparkSession
    LsmLayout.clearApplied(spark, path)
    BandIndex.build(docs, idCol, textCol, s"$path/band")
    val comp = DedupClusters.components(
      MinHashNearDup.nearDupPairs(docs, idCol, textCol, threshold),
      "id_a", "id_b")
      .select(col("id").as("doc_id"), col("comp"))
    docs.select(col(idCol).as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .withColumn("gen", lit(0L))
      .withColumn("batch", lit("base"))
      .write.mode("overwrite").partitionBy("batch")
      .parquet(s"$path/assignments")
    spark.range(1)
      .select(lit(threshold).as("threshold"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The current assignment: latest generation per doc. One narrow
    * aggregate over (doc_id, cluster_id, gen) rows. */
  def assignments(spark: SparkSession, path: String): DataFrame =
    assignmentsScoped(spark, path, None)

  private def assignmentsScoped(
      spark: SparkSession, path: String,
      excludeBatch: Option[String]): DataFrame = {
    val base = spark.read.parquet(s"$path/assignments")
    excludeBatch.fold(base)(b => base.filter(col("batch") =!= b))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("gen"), col("cluster_id"))).as("graft__l"))
      .select(col("doc_id"), col("graft__l.cluster_id").as("cluster_id"))
  }

  /** Ingest one batch: assign every delta doc a cluster id and merge
    * any corpus clusters the delta bridges. Doc ids must be new (the
    * re-ingest contract shared with the other layouts). */
  def ingest(
      corpus: DataFrame, delta: DataFrame, idCol: String, textCol: String,
      path: String, batchId: String): Unit = {
    val spark = delta.sparkSession
    LsmLayout.requireValidBatchId(batchId)
    if (!LsmLayout.isApplied(spark, path, batchId)) {
      val threshold = spark.read.parquet(s"$path/meta")
        .head().getAs[Double]("threshold")
      val nextGen = spark.read.parquet(s"$path/assignments")
        .filter(col("batch") =!= batchId)
        .agg(max(col("gen"))).head().getLong(0) + 1L
      // the registry state as of BEFORE this batch: a marker-less
      // replay would otherwise read its own (possibly partial) first
      // attempt's generation — e.g. an already-applied merge re-map —
      // and recompute a DIFFERENT row set, which the dynamic overwrite
      // would then replace the full generation with (dropping the
      // re-map). Excluding the batch's own partition makes the replay
      // input identical to the first attempt's, so the overwrite is a
      // bit-for-bit replacement. (The same discipline as the band
      // probe's excludeGen below and the KMV gen derivation.)
      val reg = assignmentsScoped(spark, path, Some(batchId))
      // delta ↔ indexed-corpus pairs, corpus side collapsed to its
      // cluster id; the probe skips this batch's own (possibly
      // partially appended) band generation so replays are
      // deterministic
      val edgesDC = BandIndex.probe(
        corpus, delta, idCol, textCol, s"$path/band", threshold,
        excludeGen = Some(batchId))
        .join(reg.withColumnRenamed("doc_id", "corpus_id"), Seq("corpus_id"))
        .select(col("delta_id").as("u"), col("cluster_id").as("v"))
      val edgesDD = MinHashNearDup
        .nearDupPairs(delta, idCol, textCol, threshold)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      val comp = Materialize.shared(DedupClusters.components(
        edgesDC.unionByName(edgesDD), "u", "v"))
      // delta assignments: component min if paired, else singleton
      val deltaAssign = delta.select(col(idCol).as("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      // absorbed clusters: a cluster-id vertex whose component is
      // smaller re-maps ALL its members (bounded by the absorbed
      // clusters — the merge appends, never rewrites the registry)
      val touched = edgesDC.select(col("v").as("id")).distinct()
      val remapTargets = comp
        .join(broadcast(touched), Seq("id"), "left_semi")
        .filter(col("comp") < col("id"))
        .select(col("id").as("cluster_id"), col("comp"))
      val remapRows = reg
        .join(broadcast(remapTargets), Seq("cluster_id"))
        .select(col("doc_id"), col("comp").as("cluster_id"))
      deltaAssign.unionByName(remapRows)
        .withColumn("gen", lit(nextGen))
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(s"$path/assignments")
      LsmLayout.markApplied(spark, path, batchId)
    }
    // the next batch must see this one in the band index (its own
    // idempotency marker lives inside BandIndex)
    BandIndex.append(delta, idCol, textCol, s"$path/band", batchId)
  }
}
