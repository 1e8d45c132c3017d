package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored inverted shingle index — the warehouse layout behind lexical
  * retrieval serving (the s23/s26 discipline applied to the text side).
  *
  * The ad-hoc lexical queries (idf top-k, more-like-this, the RRF
  * lexical leg) rebuild the corpus shingle stream per query; the
  * measured wall of that family IS the per-row shingle build. At 100 TB
  * the shingle relation is an INDEX: computed once at build time and
  * stored, so a serving probe scans (doc_id, shingle, ns) — never the
  * corpus text.
  *
  * Layout under `path`:
  *  - `postings/` (doc_id, ns, dl, shingle, tf) partitioned by
  *    `bucket` = pmod(hash60(shingle), buckets), each bucket sorted by
  *    shingle — bucket dirs give catalog pruning for point-shingle
  *    probes, the sort gives parquet row-group min/max pruning within
  *    a bucket, and co-partitioned index↔index joins (bucket, shingle)
  *    never shuffle the posting stream. Per-doc stats are denormalized
  *    onto each posting so no probe needs a second doc table: `ns`
  *    (distinct-gram count) serves Jaccard, `dl` (token length) and
  *    `tf` (within-doc occurrences) serve BM25.
  *  - `lexicon/` (shingle, df) same bucketing — the document-frequency
  *    table idf ranking weighs by; derived from the STORED postings, so
  *    the text is shingled exactly once per build.
  *  - `meta/` one row (n_docs, n_tokens) — the corpus sizes the idf
  *    ratio and the BM25 length normalization need (counted over
  *    documents, not postings: docs shorter than the shingle width
  *    have no postings but still count).
  *
  * Serving probes are index-only: the query doc's shingles come from
  * the postings themselves (pushed doc_id filter), weights broadcast,
  * and the corpus side is one doc-keyed partial aggregate + TakeOrdered
  * — the n114/n118 shapes with the build amortized away. Plan-pinned
  * (QueryPlansSpec): no scan in a probe plan reads a text column.
  */
object LexicalIndex {

  /** Shingle the corpus ONCE and write the postings/lexicon/meta
    * layout. The postings stream is repartitioned by bucket before the
    * partitioned write so each task writes one bucket directory
    * (no small-files fan-out) with shingle-sorted row groups. */
  /** One posting row per distinct (doc, gram): (doc_id, ns = the doc's
    * distinct-gram count, dl = the doc's TOKEN length, shingle,
    * tf = within-doc occurrence count, bucket). ns serves Jaccard, dl
    * and tf serve BM25-style length/frequency normalization — all
    * denormalized at build so no probe needs a second table beyond the
    * lexicon. The fused graft_shingle_tfs expression emits the
    * counted distinct set in one pass, so tf costs NO extra aggregate. */
  private def postingProjection(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("graft__ws"))
      .select(col("doc_id"),
        size(col("graft__ws")).cast("long").as("dl"),
        expr(s"graft_shingle_tfs(graft__ws, $n)").as("graft__ts"))
      .select(col("doc_id"),
        size(col("graft__ts")).cast("long").as("ns"),
        col("dl"),
        explode(col("graft__ts")).as("graft__g"))
      .select(col("doc_id"), col("ns"), col("dl"),
        col("graft__g.sh").as("shingle"),
        col("graft__g.tf").as("tf"))
      .withColumn("bucket",
        pmod(TextOps.hexHash60(col("shingle")), lit(buckets.toLong)))

  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      n: Int = 3,
      buckets: Int = 16): Unit = {
    val spark = docs.sparkSession
    // a rebuild starts a fresh index life: pending tombstones and
    // applied-batch markers from the previous life must not survive it
    // — stale tombstones would silently exclude rebuilt postings while
    // the fresh lexicon/meta still count them, and stale markers would
    // skip the first refresh that reuses a batch id from the old life
    LsmLayout.deleteDir(spark, s"$path/tombstones")
    LsmLayout.clearApplied(spark, path)
    LsmLayout.clearSnapshots(spark, path)
    // meta/ is disjoint from the postings→lexicon chain (its counts
    // come from the DOCS, not the stored postings — docs shorter than
    // the shingle width have no postings but still count), so its
    // corpus scan runs CONCURRENTLY with the chain instead of
    // serializing as a third action after it
    Overlap.all(spark)(
      () => {
        postingProjection(docs, idCol, textCol, n, buckets)
          .withColumn("gen", lit(BaseGen))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("shingle"))
          .write.mode("overwrite").partitionBy("gen", "bucket")
          .parquet(s"$path/postings")
        // document frequency from the STORED postings — one groupBy
        // over the narrow index, no second pass over text
        spark.read.parquet(s"$path/postings")
          .groupBy(col("bucket"), col("shingle"))
          .agg(count(lit(1)).as("df"))
          .withColumn("gen", lit(BaseGen))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("shingle"))
          .write.mode("overwrite").partitionBy("gen", "bucket")
          .parquet(s"$path/lexicon")
      },
      () => docs
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
        .withColumn("buckets", lit(buckets.toLong))
        .withColumn("shingle_n", lit(n.toLong))
        .withColumn("gen", lit(BaseGen))
        .write.mode("overwrite").partitionBy("gen").parquet(s"$path/meta"))
  }

  /** The generation name the one-shot [[build]] writes. Incremental
    * writers key their generations by CALLER-SUPPLIED batch id —
    * the idempotency contract (see [[refresh]]). */
  private val BaseGen = "base"

  // the applied-batch markers + batch-id hygiene live in [[LsmLayout]]
  // (shared with BandIndex/KmvLayout so the idempotency contract cannot
  // drift between the stored layouts)
  private[graft] def isApplied(
      spark: SparkSession, path: String, gen: String): Boolean =
    LsmLayout.isApplied(spark, path, gen)

  private def markApplied(
      spark: SparkSession, path: String, gen: String): Unit =
    LsmLayout.markApplied(spark, path, gen)

  private def requireValidBatchId(batchId: String): Unit =
    LsmLayout.requireValidBatchId(batchId)

  /** The committed LIVE generation directories of the stored lexicon —
    * what the auto-compaction policy counts (physical dirs additionally
    * hold superseded generations awaiting GC). */
  private[graft] def generationCount(
      spark: SparkSession, path: String): Int =
    LsmLayout.liveGenerationCount(spark, path, s"$path/lexicon")

  /** One relation of a layout, scoped to a SNAPSHOT's live generations
    * — superseded base generations and folded generations awaiting GC
    * are invisible (reading them would double-count every df/meta sum
    * after a compact). */
  private def scopedRel(
      spark: SparkSession, path: String, rel: String,
      snap: LayoutSnapshot): DataFrame = {
    val live = LsmLayout
      .liveGenerationNames(spark, s"$path/$rel", "gen=", snap)
    LsmLayout.readGenerations(spark, s"$path/$rel", "gen=", live)
  }

  /** The stored posting relation (doc_id, ns, dl, shingle, tf, bucket),
    * minus tombstoned documents when a forget-set is pending — every
    * probe routes through here, so a [[tombstone]] call is visible on
    * all serving paths immediately, before [[compact]] rewrites
    * anything. The anti-join side is the forget-set id list (16 bytes a
    * row, broadcast while within the budget); the posting stream itself
    * is untouched. */
  def postings(spark: SparkSession, path: String): DataFrame =
    postingsScoped(spark, path, LsmLayout.snapshot(spark, path))

  private def postingsScoped(
      spark: SparkSession, path: String, snap: LayoutSnapshot): DataFrame =
    LsmLayout.antiJoinTombstones(spark, path, snap,
      scopedRel(spark, path, "postings", snap.ledgerView).drop("gen"),
      "doc_id")

  /** The LOGICAL document-frequency table: refresh appends delta df
    * generations LSM-style (never rewrites the stored table), so the
    * physical relation holds ≤ #generations rows per (bucket, shingle)
    * and reads fold them with one sum. [[compact]] collapses
    * generations back to one. */
  def lexicon(spark: SparkSession, path: String): DataFrame =
    lexiconScoped(spark, path, LsmLayout.snapshot(spark, path))

  private def lexiconScoped(
      spark: SparkSession, path: String, snap: LayoutSnapshot): DataFrame =
    scopedRel(spark, path, "lexicon", snap)
      .groupBy(col("bucket"), col("shingle"))
      .agg(sum(col("df")).as("df"))
      // a shingle whose documents were ALL tombstoned folds to df = 0
      // (negative generations) — it has left the vocabulary
      .filter(col("df") > 0)

  /** The LOGICAL meta row (n_docs, n_tokens, buckets, shingle_n):
    * counters sum across generations; the layout constants are
    * identical in every generation row. */
  def metaRow(spark: SparkSession, path: String): DataFrame =
    metaRowScoped(spark, path, LsmLayout.snapshot(spark, path))

  private def metaRowScoped(
      spark: SparkSession, path: String, snap: LayoutSnapshot): DataFrame =
    scopedRel(spark, path, "meta", snap)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("buckets")).as("buckets"),
        max(col("shingle_n")).as("shingle_n"))

  /** The layout CONSTANTS (shingle_n, buckets) — identical in every
    * meta generation row by construction, so they read from the
    * snapshot's BASE generation only, through the driver-side
    * fingerprint cache (one listStatus on a hit; the parquet read job
    * only on first touch or after a compact/rebuild rewrites the
    * base). Every maintenance call used to pay a full
    * `metaRow().head()` Spark job just to re-learn these build-time
    * constants. The summed counters (n_docs/n_tokens) are generational
    * and keep reading live via [[metaRow]]. */
  private[operators] def layoutConstants(
      spark: SparkSession, path: String, snap: LayoutSnapshot): (Int, Int) = {
    val row = LsmLayout.cachedMetaRow(spark, s"$path/meta/gen=${snap.base}")
    (row.getAs[Long]("shingle_n").toInt, row.getAs[Long]("buckets").toInt)
  }

  /** Driver-side shingling of a LITERAL query string — the serving
    * path's query side is plan-time constants, not a data scan. Same
    * semantics as the engine expression (single-space split keeping
    * empties, space-joined n-grams, first-occurrence distinct). */
  private[graft] def literalShingles(text: String, n: Int): Seq[String] = {
    val ws = text.split(" ", -1).toSeq
    if (ws.length < n) Seq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).distinct
  }

  /** The bucket a shingle lands in — same md5-prefix hash60 the build
    * uses, evaluated driver-side on the literal. */
  private[graft] def bucketOf(shingle: String, buckets: Int): Long = {
    val h = graft.functions.SimHashSignature.hash60(
      shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Math.floorMod(h, buckets.toLong)
  }

  /** Point-probe serving for an ARBITRARY query text: the query is
    * shingled driver-side (plan-time constants — the s23 probe-set
    * argument: a serving path receives the query as a literal), its
    * bucket set prunes the postings and lexicon scans AT THE CATALOG,
    * and the shingle IN-list is pushed to the parquet reader, so the
    * probe reads only the row groups that can match — this is the scan
    * shape the fp-bucketed layout exists for. Ranking is the n114
    * idf-sum (query tf = 1 per distinct shingle). Plan-pinned:
    * PartitionFilters carries the bucket set, probe reads ≤ |query
    * buckets| of the bucket partitions. */
  def pointProbe(
      spark: SparkSession,
      path: String,
      queryText: String,
      k: Int): DataFrame = {
    // ONE snapshot resolution for the whole probe — lexicon, meta and
    // postings must read the SAME committed state even if a compact
    // flips the manifest mid-planning
    val snap = LsmLayout.snapshot(spark, path)
    // shingle width and bucket count are properties of the STORED
    // layout — read them from meta (constants, driver-cached) rather
    // than trusting caller parameters that would silently return empty
    // or mis-pruned results on disagreement
    val (n, buckets) = layoutConstants(spark, path, snap)
    val qsh = literalShingles(queryText, n)
    require(qsh.nonEmpty, s"query shorter than the shingle width: $queryText")
    val qb = qsh.map(bucketOf(_, buckets)).distinct
    // filter BELOW the generation fold so the bucket set prunes at the
    // catalog and the shingle IN-list reaches the reader
    val lex = scopedRel(spark, path, "lexicon", snap)
      .filter(col("bucket").isin(qb: _*))
      .filter(col("shingle").isin(qsh: _*))
      .groupBy(col("bucket"), col("shingle"))
      .agg(sum(col("df")).as("df"))
      .filter(col("df") > 0) // fully-tombstoned shingles fold to 0
    val qw = lex.crossJoin(broadcast(metaRowScoped(spark, path, snap)))
      .select(col("shingle"),
        round(lit(1000000.0) *
          (col("n_docs").cast("double") / col("df").cast("double")))
          .cast("long").as("graft__w"))
    postingsScoped(spark, path, snap)
      .filter(col("bucket").isin(qb: _*))
      .filter(col("shingle").isin(qsh: _*))
      .join(broadcast(qw), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(sum(col("graft__w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Incremental refresh with a new document batch — the s25 delta
    * discipline applied to the text index, LSM-style: the delta is
    * shingled map-only and APPENDED into the posting bucket
    * partitions, its df partials are appended as a new lexicon
    * GENERATION, and a new meta generation row records the delta
    * counts. Nothing stored is rewritten — refresh does delta-sized
    * work only (the 100 TB incremental contract); reads fold
    * generations with one tiny sum ([[lexicon]]/[[metaRow]]) and
    * [[compact]] collapses them when the generation count matters.
    * Merge associativity (append ∪ sum) means any batch decomposition
    * serves identically — oracle-proven (s30 single delta, n124
    * multi-delta: the serving answer from the refreshed index equals
    * the from-scratch rebuild over the union corpus).
    *
    * IDEMPOTENT under at-least-once delivery (the foreachBatch retry
    * contract — a failed micro-batch is re-run with the SAME batch id):
    * every generation is keyed by the caller's `batchId` and written
    * with dynamic partition overwrite, so a retry — whether the first
    * attempt crashed mid-write or fully committed — REPLACES its own
    * gen partitions instead of appending a duplicate that would
    * silently inflate df/postings/meta. A fully-committed batch also
    * leaves an `_applied/<batchId>` marker (written after the last
    * write), so a clean retry skips all three writes outright. Gated:
    * n174 (refresh-with-retry ≡ rebuild through the served answer) and
    * StreamingIndexSpec's batch-replay invariance.
    *
    * `compactAfterGenerations` (0 = off) is the auto-compaction policy
    * for continuous ingest: when the committed lexicon generation count
    * exceeds the threshold after this refresh, [[compact]] folds the
    * LSM back to one generation inside the same maintenance call —
    * bounding the generation/file count a serve-side read folds, with
    * answer invariance by the compact contract (gated by s46). */
  def refresh(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      batchId: String,
      compactAfterGenerations: Int = 0,
      writerEpoch: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    requireValidBatchId(batchId)
    if (!isApplied(spark, path, batchId)) {
      // the layout owns its shingle width and bucket count — caller-
      // supplied values that disagreed with the build would scatter the
      // delta into wrong directories or mix gram widths, silently
      // corrupting every probe. Constants, so they come from the
      // driver-side cache (no per-refresh meta read job).
      val (n, buckets) = layoutConstants(
        spark, path, LsmLayout.snapshot(spark, path))
      val dposts = postingProjection(delta, idCol, textCol, n, buckets)
        .withColumn("gen", lit(batchId))
        .transform(Materialize.shared)
      // three disjoint relations from one shared delta projection —
      // the writes overlap (the marker below lands after ALL settle;
      // racing consumers materialize the shared frame once under the
      // block manager's per-block lock)
      Overlap.all(spark)(
        () => dposts
          .repartition(col("bucket")).sortWithinPartitions(col("shingle"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("gen", "bucket")
          .parquet(s"$path/postings"),
        () => dposts.groupBy(col("bucket"), col("shingle"))
          .agg(count(lit(1)).as("df"))
          .withColumn("gen", lit(batchId))
          .repartition(col("bucket")).sortWithinPartitions(col("shingle"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("gen", "bucket")
          .parquet(s"$path/lexicon"),
        () => delta
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
          .withColumn("buckets", lit(buckets.toLong))
          .withColumn("shingle_n", lit(n.toLong))
          .withColumn("gen", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("gen")
          .parquet(s"$path/meta"))
      LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
      markApplied(spark, path, batchId)
    }
    if (compactAfterGenerations > 0 &&
      generationCount(spark, path) > compactAfterGenerations)
      compact(spark, path)
  }

  /** Right-to-be-forgotten deletes, LSM-style: the forget-set becomes a
    * tombstone id list (anti-joined on every postings read), a NEGATIVE
    * lexicon generation (the delta's df partials, negated — recomputed
    * map-only from the forget docs' text, exactly the [[refresh]]
    * machinery run in reverse), and a negative meta generation, so idf
    * weights and BM25 normalization reflect the shrunk corpus from the
    * next probe on. Nothing stored is rewritten — a delete does
    * forget-set-sized work only; [[compact]] later drops the tombstoned
    * postings physically and clears the list.
    *
    * Contract: the forget-set must be (a subset of) documents actually
    * in the index — GDPR deletes name content you hold. Re-ingesting a
    * deleted id requires a [[compact]] first (while its tombstone is
    * pending, the anti-join would hide the re-ingested postings while
    * the lexicon counted them).
    *
    * IDEMPOTENT at two levels (the [[refresh]] discipline): (a) across
    * DISTINCT delete batches, ids already tombstoned by an earlier
    * batch are filtered out, so a logically re-delivered delete never
    * subtracts df/meta twice; (b) within ONE batch under retry, the
    * negative generation is keyed `ts-<batchId>` and the id list lands
    * in its own `batch=<batchId>` partition, both written with dynamic
    * overwrite — a retried partial attempt replaces its own partitions
    * — and a fully-committed batch leaves an `_applied/ts-<batchId>`
    * marker that makes the retry a no-op. The cross-batch filter reads
    * the tombstone list EXCLUDING this batch's partition, so a lazy
    * re-execution after this batch's own append cannot see its own ids
    * (the self-read-after-write hazard the pre-generational spelling
    * guarded with an eager checkpoint; the checkpoint is kept so the
    * filtered set materializes once for the three writes). */
  def tombstone(
      forgetDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      batchId: String,
      writerEpoch: Option[Long] = None): Unit = {
    val spark = forgetDocs.sparkSession
    requireValidBatchId(batchId)
    val gen = s"ts-$batchId"
    if (isApplied(spark, path, gen)) return
    // ONE snapshot resolution for the whole call: the constants lookup
    // and the pending-tombstone filter read the same committed state
    val snap = LsmLayout.snapshot(spark, path)
    val (n, buckets) = layoutConstants(spark, path, snap)
    val filtered = LsmLayout.pendingTombstonesSized(
      spark, path, snap) match {
      case None => forgetDocs
      case Some((ts, bytes)) => forgetDocs.join(
        LsmLayout.hintBroadcast(ts
          .filter(col("batch") =!= batchId)
          .select(col("doc_id").as(idCol)), bytes),
        Seq(idCol), "left_anti")
    }
    val (forget, ids, nForget) = IterationCheckpoint.localCounted(filtered)
    if (nForget == 0L) {
      // everything in this batch was already tombstoned by an earlier
      // one — commit the no-op (an empty parquet write would leave a
      // schemaless directory that breaks the tombstone read)
      markApplied(spark, path, gen)
      IterationCheckpoint.release(spark.sparkContext, ids)
      return
    }
    // three disjoint relations from the checkpointed forget-set —
    // overlap the writes (marker after ALL settle)
    Overlap.all(spark)(
      () => forget.select(col(idCol).as("doc_id"))
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(s"$path/tombstones"),
      () => postingProjection(forget, idCol, textCol, n, buckets)
        .groupBy(col("bucket"), col("shingle"))
        .agg((-count(lit(1))).as("df"))
        .withColumn("gen", lit(gen))
        .repartition(col("bucket")).sortWithinPartitions(col("shingle"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen", "bucket")
        .parquet(s"$path/lexicon"),
      () => forget
        .agg((-count(lit(1))).as("n_docs"),
          (-sum(size(split(col(textCol), " ")).cast("long"))).as("n_tokens"))
        .withColumn("buckets", lit(buckets.toLong))
        .withColumn("shingle_n", lit(n.toLong))
        .withColumn("gen", lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen")
        .parquet(s"$path/meta"))
    LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
    markApplied(spark, path, gen)
    IterationCheckpoint.release(spark.sparkContext, ids)
  }

  /** Hygiene bound for the POSTINGS fold (the registry's
    * LedgerFoldAfterGenerations discipline): with no tombstones
    * pending, the corpus-sized postings rewrite runs only once this
    * many generations are live — probes read explicit live-generation
    * paths, so extra posting generations cost directory fan-out and
    * per-bucket file count, never read shape or scan bytes. */
  private val PostingsFoldAfterGenerations = 8

  /** Fold accumulated generations back to one — the compaction half
    * of the LSM contract (run when the generation/file count starts to
    * matter; probes are correct either way). Lexicon and meta ALWAYS
    * fold their sums (their generations grow the read-side fold — ≤
    * #generations rows per shingle / meta row). The postings are
    * already logically final (appends never duplicate a (doc, gram)
    * row; reads resolve explicit live-generation paths), so the ONE
    * corpus-sized rewrite in this op runs only when it has WORK to do:
    * pending tombstones (the GDPR contract — forgotten postings must
    * leave the stored layout physically at compact) or a generation
    * count past the hygiene bound (restore the
    * one-sorted-file-per-bucket layout the row-group pruning story
    * assumes — the s19 discipline). The postings relation tracks its
    * own fold state in the snapshot's second fold track (the
    * ClusterRegistry ledger spelling), so a count-triggered compact is
    * a vocabulary-sized fold, not a full-corpus posting pass — at
    * 100 TB the difference between an O(vocab) policy trip and an
    * O(corpus) one.
    *
    * SNAPSHOT-ATOMIC for concurrent readers: the folds land in a
    * brand-new immutable `base-<id>` generation and ONE manifest flip
    * makes postings, lexicon and meta visible together — a probe never
    * mixes a folded lexicon with an un-folded meta (which would skew
    * every idf weight); directories only the previous snapshot had
    * stopped referencing are GC'd, so a reader holding either snapshot
    * scans intact files. The `_applied` markers are KEPT: a late retry
    * of a pre-compact batch must still no-op (its data survives inside
    * the folded generation). `writerEpoch` fences the flip and the GC.
    * The folds run WITHOUT eager checkpoints: each reads explicit
    * live-generation paths and writes only the just-cleared
    * gen=<newBase> directories, so read and write sets are disjoint by
    * construction (the ClusterRegistry.compact fold argument — if a
    * read path ever stops being explicit-path-scoped, the checkpoints
    * must come back). */
  def compact(
      spark: SparkSession, path: String,
      writerEpoch: Option[Long] = None): Unit = {
    val snap = LsmLayout.snapshot(spark, path)
    LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
    val newBase = snap.nextBase
    Seq("postings", "lexicon", "meta").foreach(rel =>
      LsmLayout.clearStaleGeneration(spark, s"$path/$rel", "gen=", newBase))
    val liveTs = LsmLayout.liveTombstoneBatches(spark, path, snap)
    val postsLive = LsmLayout.liveGenerationNames(
      spark, s"$path/postings", "gen=", snap.ledgerView)
    val foldPostings = liveTs.nonEmpty ||
      postsLive.size > PostingsFoldAfterGenerations
    // the relation folds are independent (each reads its own live
    // generations, writes its own new base) — overlap them; the ONE
    // manifest flip below still lands only after ALL settle, so
    // readers keep the all-or-nothing visibility contract
    Overlap.all(spark)(
      ((if (foldPostings)
        Seq(() => Trace("lex.compact:postings-fold")(
          postingsScoped(spark, path, snap)
            .withColumn("gen", lit(newBase))
            .repartition(col("bucket")).sortWithinPartitions(col("shingle"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen", "bucket")
            .parquet(s"$path/postings")))
      else Seq.empty[() => Unit]) ++
      Seq(
        () => Trace("lex.compact:lexicon-fold")(
          lexiconScoped(spark, path, snap)
            .withColumn("gen", lit(newBase))
            .repartition(col("bucket")).sortWithinPartitions(col("shingle"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen", "bucket")
            .parquet(s"$path/lexicon")),
        () => Trace("lex.compact:meta-fold")(
          metaRowScoped(spark, path, snap)
            .withColumn("gen", lit(newBase))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen")
            .parquet(s"$path/meta")))): _*)
    val folded = snap.folded ++
      Seq("lexicon", "meta").flatMap(rel =>
        LsmLayout.liveGenerationNames(spark, s"$path/$rel", "gen=", snap))
        .filterNot(_ == snap.base)
    // per-relation fold state: a skipped postings fold keeps its base
    // and its live generations — they stay readable, unfolded
    val (pbase, pfolded) =
      if (foldPostings)
        (newBase, snap.ledgerFolded ++ postsLive.filterNot(_ == snap.ledgerBase))
      else (snap.ledgerBase, snap.ledgerFolded)
    val next = LayoutSnapshot(snap.id + 1L, newBase, folded,
      snap.appliedTs ++ liveTs, Some(pbase), Some(pfolded))
    LsmLayout.requireCurrentEpoch(spark, path, writerEpoch)
    LsmLayout.commitSnapshot(spark, path, next)
    LsmLayout.gcSuperseded(spark, path,
      Seq((s"$path/lexicon", "gen="), (s"$path/meta", "gen=")),
      snap, next)
    // postings GC runs against the postings fold track: on a fold it
    // sweeps what the previous snapshot stopped referencing; on a skip
    // it still owes the PREVIOUS postings fold its one-cycle-deferred
    // sweep (the registry band-skip discipline), so physical removal
    // keeps its two-cycle contract through a skip history
    LsmLayout.gcSuperseded(spark, path,
      Seq((s"$path/postings", "gen=")),
      snap.ledgerView, next.ledgerView)
  }

  /** Reclamation report (the deadChunkStats pattern on the lexical
    * side): live vs dead POSTING rows, dead = rows of pending-
    * tombstoned docs still physically present — the forget mass every
    * probe scans and anti-joins until a compact drops it, weighted by
    * each dead doc's distinct-gram count (big forgotten docs cost
    * probes more). One narrow doc_id scan over the live generations. */
  def deadRowStats(spark: SparkSession, path: String): DataFrame = {
    val snap = LsmLayout.snapshot(spark, path)
    val live = LsmLayout.liveGenerationNames(
      spark, s"$path/postings", "gen=", snap.ledgerView)
    LsmLayout.deadRowStats(spark, path, snap,
      LsmLayout.readGenerations(spark, s"$path/postings", "gen=", live)
        .select(col("doc_id")),
      "doc_id")
  }

  /** Index-health report: per-bucket posting/vocabulary/document
    * occupancy — what a rebalance or compaction policy reads. One scan
    * of the narrow postings; never text. The bucket function is the
    * PORTABLE md5-prefix hash, so an external system (or the DuckDB
    * oracle) can recompute the same buckets from raw text — s33 gates
    * exactly that. */
  def stats(spark: SparkSession, path: String): DataFrame =
    postings(spark, path)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_postings"),
        count_distinct(col("shingle")).as("n_shingles"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("bucket"))

  /** Exact-Jaccard "more like this" served FROM the index (the n118
    * question): query shingles from a pushed doc_id filter on the
    * postings, broadcast onto the posting stream, one doc-keyed
    * partial agg, TakeOrdered. Text is never read. */
  def moreLikeThis(
      spark: SparkSession, path: String, queryDocId: Long, k: Int): DataFrame = {
    val post = postings(spark, path)
    val q = post.filter(col("doc_id") === queryDocId)
      .select(col("shingle"), col("ns").as("graft__qn"))
    post.filter(col("doc_id") =!= queryDocId)
      .join(broadcast(q), Seq("shingle"))
      .groupBy(col("doc_id"), col("ns"), col("graft__qn"))
      .agg(count(lit(1)).as("graft__i"))
      .select(col("doc_id"),
        (col("graft__i").cast("double") /
          (col("ns") + col("graft__qn") - col("graft__i"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact-rational idf-weighted retrieval served FROM the index (the
    * n114 question): per-shingle weight round(1e6·N/df) from the stored
    * lexicon + meta, query weights broadcast onto the posting stream,
    * BIGINT score sum, TakeOrdered. The (bucket, shingle) join between
    * query postings and lexicon is co-partitioned by construction. */
  /** BM25-shaped ranked retrieval served FROM the index: the n114
    * exact-rational idf grid (w = round(1e6·N/df) — no log, the n31
    * discipline) with the Robertson tf/length normalization at
    * k1 = 1.2, b = 0.75. With T = corpus token count and N = doc
    * count, the per-term score reduces to ONE rational:
    *
    *   term = w · (k1+1)·tf / (tf + k1·(1−b+b·dl·N/T))
    *        = w · 22·T·tf / (10·T·tf + 3·T + 9·dl·N)
    *
    * evaluated as a fixed-order IEEE double chain (identical in
    * DuckDB), rounded to a BIGINT on w's 1e6 grid, then summed
    * EXACTLY per doc — so the doc score is order-independent and
    * bit-identical cross-engine (the n34/n117 "identical IEEE chain +
    * exact integer sum" discipline; a raw double sum would be
    * partitioning-dependent). Probe shape: query terms → lexicon
    * (co-partitioned) → broadcast weights onto the posting stream →
    * one doc-keyed BIGINT sum → TakeOrdered. Index-only; tf and dl
    * ride the postings, so no extra join. */
  def bm25TopK(
      spark: SparkSession, path: String, queryDocId: Long, k: Int): DataFrame = {
    val post = postings(spark, path)
    val lex = lexicon(spark, path)
    val meta = metaRow(spark, path)
    val qw = post.filter(col("doc_id") === queryDocId)
      .select(col("bucket"), col("shingle"))
      .join(lex, Seq("bucket", "shingle"))
      .crossJoin(broadcast(meta))
      .select(col("shingle"),
        round(lit(1000000.0) *
          (col("n_docs").cast("double") / col("df").cast("double")))
          .cast("long").as("graft__w"),
        col("n_docs"), col("n_tokens"))
    post.filter(col("doc_id") =!= queryDocId)
      .join(broadcast(qw), Seq("shingle"))
      .select(col("doc_id"),
        round(
          (col("graft__w").cast("double") * lit(22.0) *
            col("n_tokens").cast("double") * col("tf").cast("double")) /
            (lit(10L) * col("n_tokens") * col("tf") +
              lit(3L) * col("n_tokens") +
              lit(9L) * col("dl") * col("n_docs")).cast("double"))
          .cast("long").as("graft__s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("graft__s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def lexicalTopK(
      spark: SparkSession, path: String, queryDocId: Long, k: Int): DataFrame = {
    val post = postings(spark, path)
    val lex = lexicon(spark, path)
    val meta = metaRow(spark, path)
    val qw = post.filter(col("doc_id") === queryDocId)
      .select(col("bucket"), col("shingle"))
      .join(lex, Seq("bucket", "shingle"))
      .crossJoin(broadcast(meta))
      .select(col("shingle"),
        round(lit(1000000.0) *
          (col("n_docs").cast("double") / col("df").cast("double")))
          .cast("long").as("graft__w"))
    post.filter(col("doc_id") =!= queryDocId)
      .join(broadcast(qw), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(sum(col("graft__w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
