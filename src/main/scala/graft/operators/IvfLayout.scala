package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored IVF index — the s23 cell-partitioned vector layout promoted
  * to a MAINTAINED operator, completing the LSM lifecycle across the
  * stored-layout family (lexical s28+, band s37+, kmv s41+, chunk
  * store s42+, and now the ANN side): a deployed vector index is not
  * rebuilt per ingest batch; it is refreshed, forgotten-from, and
  * compacted, under the same at-least-once contract as everything
  * else ([[LsmLayout]]).
  *
  * Layout under `path`:
  *  - `vectors/` (vec_id, embedding, …) partitioned by (`gen`, `cell`)
  *    — cell is the coarse-quantizer assignment, so a probe reads
  *    nprobe/nlist of the data via CATALOG partition pruning (the s13
  *    mechanism; plan-pinned), and `gen` is the batch-keyed LSM
  *    generation (a probe's cell filter prunes across ALL generations
  *    — gens multiply directories, not rows read);
  *  - `centroids/` (cell, centroid: array<double>) — the index is
  *    self-describing (the LexicalIndex lesson): refreshes MUST
  *    assign with the build's centroids, or probe pruning would
  *    silently miss delta vectors;
  *  - `tombstones/` (vec_id) partitioned by delete batch — the s40
  *    forget discipline; vectors are per-id facts, so the delete is
  *    one id-list write and an anti-join on every read.
  *
  * Maintenance is idempotent per the shared contract (batch-keyed
  * dynamic overwrite + applied markers; gated by s48's fault-injected
  * oracle), and `compactAfterGenerations` bounds directory growth
  * (the s46 policy).
  *
  * 100 TB shape: build is one corpus pass (map-only codegen'd argmin
  * + one partitioned write); refresh is delta-sized (the delta is
  * assigned and written into its own generation — nothing stored is
  * read except the 16-row centroid table); a probe reads ≤ nprobe
  * cell directories of narrow vector rows and ends in TakeOrdered.
  * Centroids are plan-time metadata (nlist rows), collected driver-
  * side like every other layout's meta row — not a data-path collect.
  */
object IvfLayout {

  private val BaseGen = "base"

  def build(
      vecs: DataFrame, idCol: String, vecCol: String,
      path: String, centroids: Seq[Seq[Double]]): Unit = {
    val spark = vecs.sparkSession
    LsmLayout.deleteDir(spark, s"$path/tombstones")
    LsmLayout.clearApplied(spark, path)
    LsmLayout.clearSnapshots(spark, path)
    vecs
      .withColumn("cell",
        Similarity.nearestCell(Similarity.asDouble(col(vecCol)), centroids))
      .withColumn("gen", lit(BaseGen))
      .write.mode("overwrite").partitionBy("gen", "cell")
      .parquet(s"$path/vectors")
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** The stored centroid table, driver-side — nlist rows of plan-time
    * metadata (the metaRow discipline). */
  private def centroidsOf(
      spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .collect()
      .map(r => r.getSeq[Double](1).toSeq)
      .toSeq

  /** Delta ingest: assign the delta with the STORED centroids and
    * write it as a batch-keyed generation — delta-sized work, nothing
    * stored rewritten. Idempotent per the [[LsmLayout]] contract;
    * `compactAfterGenerations` (0 = off) folds the layout when the
    * generation count exceeds the threshold. */
  def refresh(
      delta: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: String,
      compactAfterGenerations: Int = 0,
      writerEpoch: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    LsmLayout.requireValidBatchId(batchId)
    if (!LsmLayout.isApplied(spark, path, batchId)) {
      val cents = centroidsOf(spark, path)
      delta
        .withColumn("cell",
          Similarity.nearestCell(Similarity.asDouble(col(vecCol)), cents))
        .withColumn("gen", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen", "cell")
        .parquet(s"$path/vectors")
      LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
      LsmLayout.markApplied(spark, path, batchId)
    }
    if (compactAfterGenerations > 0 &&
      LsmLayout.liveGenerationCount(spark, path, s"$path/vectors") >
        compactAfterGenerations)
      compact(spark, path, writerEpoch)
  }

  /** Right-to-be-forgotten deletes: an id list anti-joined on every
    * read — forget-set-sized work; [[compact]] drops the rows
    * physically. Idempotent at both levels (the band-index shape:
    * per-id facts, no stored aggregate to correct). */
  def tombstone(
      forgetIds: DataFrame, idCol: String,
      path: String, batchId: String,
      writerEpoch: Option[Long] = None): Unit = {
    val spark = forgetIds.sparkSession
    LsmLayout.requireValidBatchId(batchId)
    val gen = s"ts-$batchId"
    if (LsmLayout.isApplied(spark, path, gen)) return
    val ids = forgetIds.select(col(idCol).as("vec_id")).distinct()
    val fresh = LsmLayout.pendingTombstones(
      spark, path, LsmLayout.snapshot(spark, path)) match {
      case None => ids
      case Some(ts) => ids.join(
        broadcast(ts
          .filter(col("batch") =!= batchId)
          .select(col("vec_id"))),
        Seq("vec_id"), "left_anti")
    }
    val (forget, ckIds, nForget) = IterationCheckpoint.localCounted(fresh)
    if (nForget > 0L)
      forget
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(s"$path/tombstones")
    LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
    LsmLayout.markApplied(spark, path, gen)
    IterationCheckpoint.release(spark.sparkContext, ckIds)
  }

  /** Fold generations to one and drop tombstoned vectors physically;
    * markers kept, forget-set retired (the shared compact contract).
    * SNAPSHOT-ATOMIC for concurrent readers: new immutable base
    * generation + one manifest flip + one-cycle-deferred GC;
    * `writerEpoch` fences the flip and the GC. */
  def compact(
      spark: SparkSession, path: String,
      writerEpoch: Option[Long] = None): Unit = {
    val snap = LsmLayout.snapshot(spark, path)
    LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
    val newBase = snap.nextBase
    val (rows, ckIds, _) = IterationCheckpoint.localCounted(
      vectorsScoped(spark, path, snap))
    rows
      .withColumn("gen", lit(newBase))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gen", "cell")
      .parquet(s"$path/vectors")
    IterationCheckpoint.release(spark.sparkContext, ckIds)
    val folded = snap.folded ++ LsmLayout
      .liveGenerationNames(spark, s"$path/vectors", "gen=", snap)
      .filterNot(_ == snap.base)
    val next = LayoutSnapshot(snap.id + 1L, newBase, folded,
      snap.appliedTs ++ LsmLayout.liveTombstoneBatches(spark, path, snap))
    LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
    LsmLayout.commitSnapshot(spark, path, next)
    LsmLayout.gcSuperseded(spark, path,
      Seq((s"$path/vectors", "gen=")), snap, next)
  }

  /** The stored vector relation (vec_id, embedding, …, cell),
    * tombstones applied. Reading through here does NOT prune cells —
    * serving paths use [[topK]], whose literal probe filter is what
    * reaches the catalog. */
  def vectors(spark: SparkSession, path: String): DataFrame =
    vectorsScoped(spark, path, LsmLayout.snapshot(spark, path))

  private def vectorsScoped(
      spark: SparkSession, path: String, snap: LayoutSnapshot): DataFrame = {
    val live = LsmLayout.liveGenerationNames(
      spark, s"$path/vectors", "gen=", snap)
    LsmLayout.antiJoinTombstones(spark, path, snap,
      LsmLayout.readGenerations(spark, s"$path/vectors", "gen=", live)
        .drop("gen"),
      "vec_id")
  }

  /** The `nprobe` nearest cells to a literal query vector, from the
    * STORED centroids — same argmin arithmetic, same lower-index
    * tie-break, same left-to-right double fold as
    * [[Similarity.nearestCell]] (bit-identical cells; law-tested). */
  private[graft] def probeCellsOf(
      spark: SparkSession, path: String,
      query: Seq[Double], nprobe: Int): Seq[Int] = {
    val cents = centroidsOf(spark, path)
    // a wrong-dimension query would silently zip-truncate into a
    // plausible-looking but wrong cell set (and a wrong cosine in
    // topK's literal) — fail loudly instead
    cents.headOption.foreach(c0 => require(query.length == c0.length,
      s"query dimension ${query.length} != stored centroid dimension " +
        s"${c0.length} at $path"))
    cents.zipWithIndex.map { case (c, i) =>
      (c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum, i)
    }.sorted.take(nprobe).map(_._2)
  }

  /** Cosine top-k served from the stored layout: the probe-cell set is
    * driver-side arithmetic on the nlist-row centroid table (the query
    * vector is the ANN API's INPUT — a literal, not a data path), the
    * cell IN-list prunes the vector scan AT THE CATALOG (plan-pinned:
    * PartitionFilters carries it, ≤ nprobe cells read per generation),
    * and ranking ends in TakeOrdered. `excludeId` drops a query-by-id
    * self match. */
  def topK(
      spark: SparkSession, path: String,
      query: Seq[Double], nprobe: Int, k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val probes = probeCellsOf(spark, path, query, nprobe)
    val snap = LsmLayout.snapshot(spark, path)
    val live = LsmLayout.liveGenerationNames(
      spark, s"$path/vectors", "gen=", snap)
    val base = LsmLayout
      .readGenerations(spark, s"$path/vectors", "gen=", live)
      .filter(col("cell").isin(probes.map(_.toLong): _*))
    val scoped = LsmLayout.antiJoinTombstones(spark, path, snap, base, "vec_id")
    excludeId.fold(scoped)(id => scoped.filter(col("vec_id") =!= id))
      .select(col("vec_id"),
        round(Similarity.cosine(
          Similarity.asDouble(col("embedding")),
          array(query.map(lit): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
