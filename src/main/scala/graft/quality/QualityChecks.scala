package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's data-quality gates (data_quality.py:5-6,25-41) as
  * library assertions, with the corrected strict semantics
  * (SURVEY.md §7.5: the reference tolerates exactly one null id via
  * `> 1`; ours is zero-tolerance).
  *
  * Both probes are single count aggregates — one job, partial counts
  * combined at the driver; no data movement beyond longs.
  */
object QualityChecks {
  final case class QualityViolation(msg: String) extends RuntimeException(msg)

  /** Gate 1: table is non-empty (data_quality.py:5,25-32). */
  def requireNonEmpty(df: DataFrame, table: String): Long = {
    val n = df.count()
    if (n == 0) throw QualityViolation(s"quality gate: $table is empty")
    n
  }

  /** Gate 2: key column has zero nulls (data_quality.py:6,34-41). */
  def requireNoNullKeys(df: DataFrame, table: String, key: String): Unit = {
    val nulls = df.filter(col(key).isNull).count()
    if (nulls > 0)
      throw QualityViolation(s"quality gate: $table.$key has $nulls null keys")
  }
}
