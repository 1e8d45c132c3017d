package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table checksum — the replication/reconciliation
  * primitive: two copies of a table (different engines, row order,
  * partitioning) agree iff their checksums agree.
  *
  * Reference behavior: the warehouse's load-reconciliation count checks
  * (data_quality.py:5-6) generalized to full-content equality.
  *
  * Two commutative folds over the per-row 60-bit md5 residue, both safe
  * at unbounded row counts:
  *
  *   - `checksum_xor`: bit_xor of the raw 60-bit residues. Exactly
  *     overflow-free at ANY row count; its one semantic gap is that a
  *     row appearing an even number of times cancels out of the xor —
  *     which is precisely what the sum column catches.
  *   - `checksum_sum`: a two-level modular sum. Rows are bucketed by
  *     `h % 8192`; each bucket folds `sum(h % p) % p` (p = 1e9+7), the
  *     ≤8192 bucket sums fold `sum % p` again. Each inner residue is
  *     < 2^30, so a bucket's long partial sum stays under 2^63 up to
  *     ~2^33 rows PER BUCKET — with md5-uniform bucketing that is
  *     ~7×10^13 total rows, three orders of magnitude past the 100 TB
  *     (~10^11-row) design point. The single-level form this replaces
  *     overflowed at 8.6×10^9 rows, and asymmetrically: Spark's
  *     non-ANSI sum(long) wraps silently while DuckDB promotes to
  *     HUGEINT and the BIGINT cast errors — the two copies this
  *     operator reconciles diverged exactly when it mattered.
  *
  * `n_rows` rides along so "same checksum, different count" (md5-scale
  * coincidence) is detectable too.
  *
  * NULL discipline: [[serialized]] coalesces every field to the sentinel
  * `\N` BEFORE concatenation. Without it the engines diverge on nullable
  * columns — Spark's concat_ws silently skips NULL fields while SQL `||`
  * nulls the whole row out of the fold. The sentinel means a field whose
  * text is literally `\N` collides with NULL; acceptable for a checksum
  * (callers with adversarial text should serialize a null bitmap too).
  * Doubles must be pinned to integer units (e.g. cents) by the caller —
  * float-to-string formatting is engine-specific.
  */
object TableChecksum {
  val P: Long = 1000000007L
  val Buckets: Int = 8192
  val NullSentinel = "\\N"

  /** NULL-safe row serialization: each field cast to string, NULLs
    * pinned to `\N`, joined with `|`. DuckDB twin: the same fields as
    * `coalesce(CAST(x AS VARCHAR), '\N')` joined with `|| '|' ||`.
    */
  def serialized(fields: Seq[Column]): Column =
    concat_ws("|", fields.map(f => coalesce(f.cast("string"), lit(NullSentinel))): _*)

  /** Checksum of a table given its serialized row key. Map-only, then a
    * 8192-group fold, then a 1-row fold — no scaling shuffle.
    */
  def checksum(df: DataFrame, rowKey: Column): DataFrame =
    checksumOfHashes(df.select(TextOps.hexHash60(rowKey).as("graft__h")))

  /** The fold itself, over pre-hashed 60-bit residues in `graft__h` —
    * split out so the overflow bound is unit-testable with synthetic
    * residues (md5 can't be steered to produce near-2^60 values).
    */
  def checksumOfHashes(hashes: DataFrame): DataFrame =
    hashes
      .groupBy((col("graft__h") % Buckets).as("graft__b"))
      .agg(
        count(lit(1)).as("graft__n"),
        (sum(col("graft__h") % P) % P).as("graft__bs"),
        expr("bit_xor(graft__h)").as("graft__bx"))
      .agg(
        sum(col("graft__n")).as("n_rows"),
        (sum(col("graft__bs")) % P).as("checksum_sum"),
        expr("bit_xor(graft__bx)").as("checksum_xor"))
}
