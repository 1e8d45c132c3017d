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

  /** Committed generation directories under a layout relation — what
    * an auto-compaction policy counts. File-count-sized metadata (one
    * listStatus), never a data read. */
  def generationCount(
      spark: SparkSession, dir: String, prefix: String = "gen="): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
  }
}
