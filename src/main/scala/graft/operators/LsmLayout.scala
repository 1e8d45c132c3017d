package graft.operators

import org.apache.spark.sql.SparkSession

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
    * build generation ("base") or the tombstone prefix ("ts-"). */
  def requireValidBatchId(batchId: String): Unit =
    require(
      batchId.nonEmpty && batchId != "base" &&
        !batchId.startsWith("ts-") &&
        batchId.forall(c => c.isLetterOrDigit || c == '.' || c == '_' ||
          c == '-'),
      s"batch id must be a path-safe token, not 'base'/'ts-*': $batchId")

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
    * One metadata listing + one empty-file create. */
  def acquireWriterEpoch(spark: SparkSession, path: String): Long = {
    val next = latestEpoch(spark, path) + 1L
    val p = new org.apache.hadoop.fs.Path(s"$path/_writer/$next")
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .create(p, true).close()
    next
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
