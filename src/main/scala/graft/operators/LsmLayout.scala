package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** One committed SNAPSHOT of a stored layout — the tiny manifest the
  * reader resolves ONCE and the compactor flips ATOMICALLY (one
  * fail-if-exists file create), so maintenance is safe for concurrent
  * READERS, not just fenced writers:
  *
  *  - `base` — the generation directory holding the current folded
  *    base (the build writes `base`; every [[LsmLayout]] compact writes
  *    a NEW immutable `base-<id>` directory and flips this pointer —
  *    never an in-place rewrite a mid-compact reader could half-see);
  *  - `folded` — generation names already folded into `base` by past
  *    compacts; readers exclude them (their rows live on inside the
  *    base), and they are physically deleted one compact cycle LATER
  *    (a reader that resolved the previous snapshot may still be
  *    scanning them — the s43 immutable-generation discipline);
  *  - `appliedTs` — tombstone batches whose deletes the base already
  *    applied physically; readers skip their anti-join, and the
  *    directories are garbage-collected one cycle later.
  *
  * A layout with no snapshot file is exactly the state [[build]]
  * leaves: base = "base", nothing folded, nothing applied — so the
  * build path needs no manifest write and pre-snapshot layouts read
  * unchanged. */
private[graft] final case class LayoutSnapshot(
    id: Long,
    base: String,
    folded: Set[String],
    appliedTs: Set[String],
    ledgerBaseOpt: Option[String] = None,
    ledgerFoldedOpt: Option[Set[String]] = None) {
  /** The immutable base generation the NEXT compact writes. */
  def nextBase: String = s"base-${id + 1L}"

  /** The registry's text-ledger relation tracks its own fold state:
    * a compact may fold the (small) assignment log while SKIPPING the
    * corpus-sized ledger rewrite (see ClusterRegistry.compact — the
    * ledger only MUST fold when pending tombstones have to leave the
    * stored text physically). Pre-split snapshots folded both
    * relations together, so the ledger fields default to the shared
    * ones — old manifests read unchanged. */
  def ledgerBase: String = ledgerBaseOpt.getOrElse(base)
  def ledgerFolded: Set[String] = ledgerFoldedOpt.getOrElse(folded)

  /** This snapshot re-keyed to the ledger relation's fold state — what
    * ledger reads/GC pass wherever the shared helpers expect `base`/
    * `folded`. */
  def ledgerView: LayoutSnapshot =
    LayoutSnapshot(id, ledgerBase, ledgerFolded, appliedTs)
}

/** The shared idempotency plumbing of the stored LSM layouts
  * ([[LexicalIndex]], [[BandIndex]], [[KmvLayout]]) — one spelling for
  * the at-least-once maintenance contract so the three layouts cannot
  * drift:
  *
  *  - every incremental write is keyed by a CALLER-SUPPLIED batch id
  *    that becomes the generation's partition directory, written with
  *    dynamic partition overwrite — a retried batch (foreachBatch
  *    re-runs a failed micro-batch with the SAME id) REPLACES its own
  *    generation instead of appending a duplicate, whether the first
  *    attempt crashed mid-write or fully committed;
  *  - a fully-committed batch leaves an `_applied/<gen>` marker file
  *    (written AFTER the batch's last data write), so a clean retry
  *    skips the work outright; markers survive compaction (a late
  *    retry of a batch already folded into the compacted generation
  *    must still no-op) and are cleared by a rebuild (a fresh index
  *    life may reuse batch ids).
  *
  * Single-writer assumption: maintenance of one index path is driven
  * by one serialized loop (the foreachBatch contract) — concurrent
  * writers would race the marker check and the generation numbering.
  * The assumption is ENFORCED by the writer-epoch fence below
  * ([[acquireWriterEpoch]]/[[requireCurrentEpoch]]): every layout's
  * maintenance entry points accept an optional `writerEpoch` and
  * re-check it before committing, so a superseded loop fails loudly
  * instead of corrupting silently (gated by WriterFencingSpec).
  */
private[graft] object LsmLayout {

  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** True iff a maintenance batch with this generation name fully
    * committed in this index life. */
  def isApplied(spark: SparkSession, path: String, gen: String): Boolean =
    dirExists(spark, s"$path/_applied/$gen")

  def markApplied(spark: SparkSession, path: String, gen: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_applied/$gen")
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .create(p, true).close()
  }

  def clearApplied(spark: SparkSession, path: String): Unit =
    deleteDir(spark, s"$path/_applied")

  /** Generation-name hygiene: batch ids become partition directory
    * names, so they must be path-safe, and must not collide with the
    * base-generation namespace ("base" from a build, "base-<n>" from
    * every snapshot compact) or the tombstone prefix ("ts-"). */
  def requireValidBatchId(batchId: String): Unit =
    require(
      batchId.nonEmpty && !batchId.startsWith("base") &&
        !batchId.startsWith("ts-") &&
        batchId.forall(c => c.isLetterOrDigit || c == '.' || c == '_' ||
          c == '-'),
      s"batch id must be a path-safe token, not 'base*'/'ts-*': $batchId")

  /** True for any base-generation directory name — the build's `base`
    * or a compact's `base-<id>` (both reserved by
    * [[requireValidBatchId]]). */
  def isBaseName(name: String): Boolean =
    name == "base" || name.startsWith("base-")

  /** Generation directory NAMES under a layout relation (partition
    * values, prefix stripped) — file-count-sized metadata (one
    * listStatus), never a data read. The monotone-counter derivations
    * (`nextGen` in the KMV/registry/chunk layouts) count these
    * EXCLUDING the in-flight batch's own (possibly partial) directory,
    * so an at-least-once retry re-derives the same number without
    * scanning any stored data. */
  def generationNames(
      spark: SparkSession, dir: String,
      prefix: String = "gen="): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName.stripPrefix(prefix))
  }

  /** Committed generation directories under a layout relation — what
    * an auto-compaction policy counts. */
  def generationCount(
      spark: SparkSession, dir: String, prefix: String = "gen="): Int =
    generationNames(spark, dir, prefix).size

  // ---- layout snapshots (snapshot-atomic compaction) ------------------
  // The compact of every stored layout used to rewrite its `base`
  // generation IN PLACE — correct under the single-process oracle
  // harness, but a reader that opened the path mid-compact could fail
  // on vanished files or fold a partial base. The snapshot discipline
  // extends the immutable-generation idea (s43/s54) to the base itself:
  // a compact WRITES a brand-new `base-<id>` generation (touching
  // nothing a reader may hold), then FLIPS one tiny manifest file
  // (`_snap/<id>`, fail-if-exists create — atomic), and only deletes
  // directories the PREVIOUS snapshot had already stopped referencing —
  // so any reader sees exactly the pre- or the post-compact state,
  // never an error or a mix (gated by SnapshotCompactSpec's concurrent
  // reader loop).

  private def snapDir(root: String) = s"$root/_snap"

  /** The current committed snapshot of a layout — ONE metadata listing
    * + one tiny file read; a layout that has never compacted (or was
    * just rebuilt) resolves to the legacy build state. */
  def snapshot(spark: SparkSession, root: String): LayoutSnapshot = {
    val dir = new org.apache.hadoop.fs.Path(snapDir(root))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return LegacySnapshot
    val ids = fs.listStatus(dir).iterator
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .toSeq
    if (ids.isEmpty) LegacySnapshot
    else {
      val id = ids.max
      val in = fs.open(new org.apache.hadoop.fs.Path(s"${snapDir(root)}/$id"))
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val kv = body.linesIterator
        .map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }
        .toMap
      def set(k: String): Set[String] =
        kv.getOrElse(k, "").split(",").filter(_.nonEmpty).toSet
      LayoutSnapshot(id, kv("base"), set("folded"), set("appliedTs"),
        kv.get("lbase"), kv.get("lfolded").map(_ =>
          set("lfolded")))
    }
  }

  /** The snapshot every un-compacted layout life starts in. */
  val LegacySnapshot: LayoutSnapshot =
    LayoutSnapshot(-1L, "base", Set.empty, Set.empty)

  /** Atomically commit a new snapshot: the content is written to a
    * temp name and RENAMED into place — a reader can never open a
    * created-but-not-yet-written manifest (create-then-write showed up
    * as an empty-file read under SnapshotCompactSpec's hammer). The
    * temp name does not parse as a snapshot id, so readers ignore it;
    * rename-refuses-to-overwrite keeps the fail-if-exists property
    * (two compacts racing one layout IS the bug the writer fence
    * exists to surface — loud error, not a retry case). */
  def commitSnapshot(
      spark: SparkSession, root: String, snap: LayoutSnapshot): Unit = {
    val fs = new org.apache.hadoop.fs.Path(snapDir(root))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(
      s"${snapDir(root)}/.tmp-${snap.id}")
    val out = fs.create(tmp, true)
    try out.write(
      (s"base=${snap.base}\n" +
        s"folded=${snap.folded.toSeq.sorted.mkString(",")}\n" +
        s"appliedTs=${snap.appliedTs.toSeq.sorted.mkString(",")}\n" +
        snap.ledgerBaseOpt.fold("")(b => s"lbase=$b\n") +
        snap.ledgerFoldedOpt.fold("")(f =>
          s"lfolded=${f.toSeq.sorted.mkString(",")}\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val p = new org.apache.hadoop.fs.Path(s"${snapDir(root)}/${snap.id}")
    // loud-collision check (best effort — POSIX rename overwrites
    // silently; the writer-epoch fence is what actually serializes
    // compacts, this turns a fence-less double-commit into an error)
    if (fs.exists(p) || !fs.rename(tmp, p))
      throw new java.io.IOException(
        s"snapshot ${snap.id} already committed at $root — two compacts " +
          "raced this layout (single-writer fence violation)")
  }

  /** A rebuild starts a fresh snapshot life (build's full overwrite
    * wipes every generation directory, so the legacy snapshot is again
    * exactly right). */
  def clearSnapshots(spark: SparkSession, root: String): Unit =
    deleteDir(spark, snapDir(root))

  /** Delete the possibly-partial generation directory a CRASHED earlier
    * attempt of the SAME compact/retrain may have left, so the rewrite
    * starts from a clean slate. Those ops write their new base under a
    * DETERMINISTIC name with dynamic partition overwrite — if state
    * changed between the attempts (a tombstone landed, say), the
    * retry's row set may no longer cover every (sub-)partition the
    * first attempt wrote, and the uncovered directories (stale rows,
    * possibly freshly-tombstoned ones) would survive under the new base
    * and be served after the commit. The name is referenced by NO
    * committed snapshot until [[commitSnapshot]] runs, so the delete is
    * invisible to concurrent readers. */
  def clearStaleGeneration(
      spark: SparkSession, dir: String, prefix: String,
      name: String): Unit =
    deleteDir(spark, s"$dir/$prefix$name")

  /** The generation names a reader of THIS snapshot folds: the
    * snapshot's base plus every non-base generation not yet folded
    * into it. Superseded base generations and folded generations may
    * still exist on disk (they are deleted one compact cycle later) —
    * they are invisible here. */
  def liveGenerationNames(
      spark: SparkSession, dir: String, prefix: String,
      snap: LayoutSnapshot): Seq[String] =
    generationNames(spark, dir, prefix).filter(n =>
      n == snap.base || (!isBaseName(n) && !snap.folded.contains(n)))

  /** The metadata-monotone INGEST ORDINAL for the next batch: 1 +
    * (generations ever committed in this index life). Folded names
    * accumulate in the snapshot across compacts and live non-base names
    * cover the rest, so the number NEVER restarts at a compact — the
    * old live-count spelling did, which (a) silently broke the
    * cross-layout pin alignment the moment ONE layout compacted
    * independently under `CorpusLifecycle.maintain` (its numbering
    * restarted while its siblings' kept counting), and (b) made a
    * generation number ambiguous across compact boundaries. Excludes
    * the in-flight batch's own (possibly partial) directory so an
    * at-least-once retry re-derives the same ordinal; one listStatus,
    * never a data read. */
  def committedGenerationOrdinal(
      spark: SparkSession, dir: String, prefix: String,
      snap: LayoutSnapshot, excludeBatch: String): Long =
    1L + snap.folded.size +
      liveGenerationNames(spark, dir, prefix, snap)
        .count(n => n != snap.base && n != excludeBatch)

  /** Live-generation count under the CURRENT snapshot — what an
    * auto-compaction policy compares against its threshold (physical
    * directory counts include superseded generations awaiting GC and
    * would re-trip the policy forever). */
  def liveGenerationCount(
      spark: SparkSession, root: String, dir: String,
      prefix: String = "gen="): Int =
    liveGenerationNames(spark, dir, prefix, snapshot(spark, root)).size

  /** Tombstone batches a reader of this snapshot must still anti-join
    * (batches the base already physically applied are skipped; their
    * directories are GC'd one cycle later). */
  def liveTombstoneBatches(
      spark: SparkSession, root: String, snap: LayoutSnapshot): Seq[String] =
    generationNames(spark, root + "/tombstones", "batch=")
      .filterNot(snap.appliedTs.contains)

  /** The pending forget-set under a snapshot — `None` when every
    * tombstone batch is already applied (the common post-compact
    * fast path: no anti-join in the plan at all). */
  def pendingTombstones(
      spark: SparkSession, root: String, snap: LayoutSnapshot): Option[DataFrame] = {
    val live = liveTombstoneBatches(spark, root, snap)
    if (live.isEmpty) None
    else Some(readGenerations(spark, s"$root/tombstones", "batch=", live))
  }

  /** Read exactly the NAMED generation directories of a layout
    * relation (basePath keeps the partition column). This — not a
    * whole-directory read + isin filter — is the snapshot-safe scan
    * shape: `spark.read.parquet(dir)` lists and schema-infers over
    * EVERY footer under the directory, including superseded
    * generations a concurrent compact's GC may delete mid-inference;
    * explicit live paths never touch them (and skip listing them —
    * at scale the metadata win too). */
  def readGenerations(
      spark: SparkSession, dir: String, prefix: String,
      names: Seq[String]): DataFrame = {
    require(names.nonEmpty,
      s"no live generations to read under $dir (prefix $prefix)")
    spark.read.option("basePath", dir)
      .parquet(names.map(n => s"$dir/$prefix$n"): _*)
  }

  /** [[pendingTombstones]] plus the forget-set's on-disk byte size —
    * the honest broadcast-budget input for the forget-path dedup joins
    * (a new batch anti-joins the ALREADY-pending ids so a re-submitted
    * doc id doesn't tombstone twice). The caller filters the frame
    * further before joining, so the bytes UPPER-bound the broadcast. */
  def pendingTombstonesSized(
      spark: SparkSession, root: String,
      snap: LayoutSnapshot): Option[(DataFrame, Long)] = {
    val live = liveTombstoneBatches(spark, root, snap)
    if (live.isEmpty) None
    else Some((
      readGenerations(spark, s"$root/tombstones", "batch=", live),
      dirBytes(spark, s"$root/tombstones", live, "batch=")))
  }

  /** Anti-join the pending forget-set onto `frame` by `idName` — the
    * read-side GDPR discipline, centralized: batches the snapshot's
    * base already applied are skipped outright (no join in the plan),
    * and the id list is broadcast only while its backing bytes fit
    * [[broadcastBudgetBytes]] — a forget storm between compacts falls
    * back to a shuffle join instead of failing at the driver. */
  def antiJoinTombstones(
      spark: SparkSession, root: String, snap: LayoutSnapshot,
      frame: DataFrame, idName: String): DataFrame = {
    val live = liveTombstoneBatches(spark, root, snap)
    if (live.isEmpty) frame
    else {
      val bytes = dirBytes(spark, s"$root/tombstones", live, "batch=")
      frame.join(
        hintBroadcast(
          readGenerations(spark, s"$root/tombstones", "batch=", live)
            .select(col(idName)),
          bytes),
        Seq(idName), "left_anti")
    }
  }

  /** One-row `(n_live, n_dead)` of `rows` against the snapshot's
    * PENDING forget-set — the shared dead-mass report (the
    * `ChunkStore.deadChunkStats` pattern generalized): dead rows are
    * physically present rows of tombstoned docs, still scanned and
    * anti-joined by every probe until a compact drops them. This is
    * the data-aware compact-decision input for the posting/sketch/sig
    * families, where generation COUNT says nothing about forget mass
    * (a layout with one generation and half its docs tombstoned never
    * trips a count rule). One narrow id-column scan + the budget-
    * guarded tombstone join; no pending tombstones → a zero-dead
    * count of the same scan. */
  def deadRowStats(
      spark: SparkSession, root: String, snap: LayoutSnapshot,
      rows: DataFrame, idName: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
    pendingTombstonesSized(spark, root, snap) match {
      case None =>
        rows.agg(
          coalesce(count(lit(1)), lit(0L)).as("n_live"),
          lit(0L).as("n_dead"))
      case Some((ts, bytes)) =>
        val dead = hintBroadcast(
          ts.select(col(idName)).distinct()
            .withColumn("graft__t", lit(1)),
          bytes)
        rows.join(dead, Seq(idName), "left")
          .agg(
            coalesce(sum(when(col("graft__t").isNull, 1L).otherwise(0L)),
              lit(0L)).as("n_live"),
            coalesce(sum(when(col("graft__t").isNotNull, 1L).otherwise(0L)),
              lit(0L)).as("n_dead"))
    }
  }

  /** Bytes on disk under the named generation directories — one
    * recursive metadata listing, never a data read. This is the
    * honest input to a BROADCAST decision: parquet bytes upper-bound
    * the broadcast relation built from those directories. */
  def dirBytes(
      spark: SparkSession, dir: String, names: Seq[String],
      prefix: String = "gen="): Long = {
    val conf = spark.sessionState.newHadoopConf()
    names.map { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$prefix$n")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) 0L
      else fs.getContentSummary(p).getLength
    }.sum
  }

  /** The byte threshold past which the registry's candidate-text
    * rehydration switches from a plain id semi-join (one full ledger
    * text scan — the right plan while the ledger is small: the
    * pruning machinery's fixed cost, a dynamic-pruning subquery plus
    * the bucket-keyed join, exceeds the scan it saves) to the
    * bucket-pruned join (reads candidate buckets only — the only
    * viable plan once the ledger text is large; at 100 TB a per-batch
    * full text scan is the maintenance bottleneck). Same discipline
    * as [[broadcastBudgetBytes]]: the on-disk bytes are the honest
    * decision input. Test hook: `-Dgraft.rehydration.prune.bytes=<n>`. */
  def rehydrationPruneBytes: Long =
    sys.props.get("graft.rehydration.prune.bytes").map(_.toLong)
      .getOrElse(256L << 20)

  /** The broadcast budget every small-side maintenance relation
    * (read-fold overlays, tombstone id lists) is guarded by: past it,
    * the join falls back to a shuffle instead of failing (or degrading)
    * at the driver when a mis-sized `compactAfterGenerations` policy or
    * a forget storm grows the relation between compacts. Size the
    * compaction policy so overlays stay WELL inside this; the guard
    * turns a config mistake into a non-event, not a crash.
    * Test hook: `-Dgraft.broadcast.budget.bytes=<n>`. */
  def broadcastBudgetBytes: Long =
    sys.props.get("graft.broadcast.budget.bytes").map(_.toLong)
      .getOrElse(64L << 20)

  /** Broadcast-hint `df` only while its backing bytes fit the budget;
    * past it, return it unhinted (a shuffle join — bounded memory,
    * same answer). */
  def hintBroadcast(df: DataFrame, backingBytes: Long): DataFrame =
    if (backingBytes <= broadcastBudgetBytes) broadcast(df) else df

  /** Delete directories no snapshot can reference anymore — run AFTER
    * the new snapshot commits. Deletable now: generation directories
    * the PREVIOUS snapshot had already folded (both snapshots exclude
    * them), base generations superseded before the previous snapshot,
    * and tombstone batches the previous snapshot had already applied.
    * Directories the previous snapshot still referenced are KEPT for
    * one more cycle — an in-flight reader may have resolved it. */
  def gcSuperseded(
      spark: SparkSession, root: String,
      relDirs: Seq[(String, String)],
      prev: LayoutSnapshot, next: LayoutSnapshot): Unit = {
    relDirs.foreach { case (dir, prefix) =>
      generationNames(spark, dir, prefix).foreach { n =>
        val superseded =
          (isBaseName(n) && n != prev.base && n != next.base) ||
            prev.folded.contains(n)
        if (superseded) deleteDir(spark, s"$dir/$prefix$n")
      }
    }
    prev.appliedTs.foreach(b =>
      deleteDir(spark, s"$root/tombstones/batch=$b"))
    // an emptied forget-set leaves no trace (the pre-snapshot
    // "compact clears the tombstones dir" contract, one cycle later)
    if (dirExists(spark, s"$root/tombstones") &&
      generationNames(spark, s"$root/tombstones", "batch=").isEmpty)
      deleteDir(spark, s"$root/tombstones")
  }

  // ---- immutable-meta caching ----------------------------------------
  // The band/registry/KMV/chunk layouts each write a ONE-ROW `meta/`
  // relation at build time and never again within an index life — yet
  // every ingest/refresh used to re-run a full parquet read JOB just to
  // re-learn those constants (measured: a few hundred ms of fixed cost
  // per maintenance call, dominating small-delta ingests). The cache
  // keys by the meta directory's file fingerprint (part-file names
  // carry a per-write UUID, so ANY rewrite — a rebuild at the same
  // path — changes the key), making a hit one metadata listing and a
  // rebuild a natural invalidation. Driver-side only, like every other
  // plan-time constant.

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, org.apache.spark.sql.Row)]()

  private def metaFingerprint(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) "absent"
    else fs.listStatus(p).iterator
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .toSeq.sorted.mkString(";")
  }

  /** The single meta row under `dir`, cached against the directory's
    * file fingerprint — one listStatus on a hit, the parquet read job
    * only on first touch or after a rewrite. Use ONLY for relations
    * that are immutable within an index life (the build-time constant
    * metas); generational metas (the lexical layout's) fold sums across
    * generations and must keep reading live. */
  def cachedMetaRow(
      spark: SparkSession, dir: String): org.apache.spark.sql.Row = {
    val fp = metaFingerprint(spark, dir)
    val hit = metaCache.get(dir)
    if (hit != null && hit._1 == fp) hit._2
    else {
      val row = spark.read.parquet(dir).head()
      metaCache.put(dir, (fp, row))
      row
    }
  }

  // ---- writer fencing -----------------------------------------------
  // The single-writer assumption above is an OPERATIONAL contract; the
  // epoch fence turns its violation (two maintenance loops on one index
  // path — e.g. a stuck-then-revived driver beside its replacement)
  // from silent corruption into a loud error. A maintenance loop calls
  // [[acquireWriterEpoch]] ONCE at loop start and passes the epoch to
  // every maintenance call; each commit re-checks the fence immediately
  // before its `_applied` marker, so a superseded writer can never mark
  // a batch committed after a newer loop took over. (Its in-flight DATA
  // write may already have landed — the new owner's re-delivery of the
  // same micro-batch id overwrites that generation, per the dynamic-
  // overwrite contract; what the fence guarantees is that the stale
  // loop STOPS, loudly, instead of racing the marker check and the
  // generation numbering forever.) Epochs are never cleared — not even
  // by a rebuild — so a revived old loop stays fenced across index
  // lives.

  /** Claim ownership of a layout path's maintenance: returns a fresh
    * epoch strictly greater than every epoch ever issued for the path.
    * MUTUALLY EXCLUSIVE under races: the marker is created
    * fail-if-exists, so two replacement drivers that both computed
    * `latest + 1` cannot share an epoch — the loser re-lists and takes
    * the next number (and is then fenced by the winner's, or fences
    * the winner's, strictly-ordered epoch). */
  def acquireWriterEpoch(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    var attempts = 0
    while (true) {
      val next = latestEpoch(spark, path) + 1L
      val p = new org.apache.hadoop.fs.Path(s"$path/_writer/$next")
      try {
        p.getFileSystem(conf).create(p, false).close()
        return next
      } catch {
        case _: java.io.IOException =>
          attempts += 1
          require(attempts < 1000,
            s"could not acquire a writer epoch for $path after $attempts " +
              "collisions")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def latestEpoch(spark: SparkSession, path: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_writer")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .foldLeft(0L)(math.max)
  }

  /** The fence check every maintenance commit runs before its marker:
    * `None` (an unfenced caller — batch jobs, tests) passes; a fenced
    * caller whose epoch has been superseded throws instead of
    * committing. */
  def requireCurrentEpoch(
      spark: SparkSession, path: String, epoch: Option[Long]): Unit =
    epoch.foreach { e =>
      val latest = latestEpoch(spark, path)
      if (latest > e)
        throw new IllegalStateException(
          s"stale writer epoch $e for $path: a newer maintenance loop " +
            s"(epoch $latest) owns this index — this writer must stop " +
            "(single-writer fence)")
    }
}
