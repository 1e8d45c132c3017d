package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: lay a table out so that files are
  * contiguous blocks of the interleaved-bit curve over TWO keys, giving
  * every file a narrow min/max envelope on BOTH dimensions — parquet
  * row-group / file stats then prune scans filtered on EITHER key. The
  * single-key sorted layout (Warehouse.stageSorted / s12) prunes only
  * its sort key; z-order is the standard multi-dimensional upgrade
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Layout-only operator: values are untouched, so correctness is a
  * byte-identical round-trip; the WIN is in the per-file envelopes,
  * which WarehouseSpec measures directly (z-order vs single-key spans).
  *
  * Scale notes: the min/max frame needed to normalize keys is ONE tiny
  * aggregate broadcast to the scan (no shuffle of the data); the write
  * is repartitionByRange on the z-value — a range shuffle in which
  * every task sorts only its own slice (no global funnel), exactly the
  * s19 compaction shape but on the Morton key. File count is the knob
  * that sets file size (~1 GB at 100 TB).
  */
object ZOrder {

  /** Morton interleave of two non-negative columns, `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Pure integer
    * bit arithmetic — stays inside whole-stage codegen. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Scale a key into [0, 2^bits). `lo`/`hi` are Columns so callers can
    * ride them in from a broadcast 1-row stats frame. Guards the
    * degenerate lo==hi table (all rows map to 0). */
  def normalize(k: Column, lo: Column, hi: Column, bits: Int = 16): Column = {
    val span = hi - lo
    val top = lit((1L << bits) - 1)
    // non-negative operands, product ≤ span·2^16 ≪ 2^53 → the double
    // division is exact and the cast truncates like integer div
    when(span === 0, lit(0L))
      .otherwise(((k - lo) * top / span).cast("long"))
  }

  /** Write `df` z-ordered on (k1, k2) into `nFiles` range-clustered
    * files at `path`. Both keys must be integral. */
  def cluster(
      df: DataFrame,
      path: String,
      k1: String,
      k2: String,
      nFiles: Int,
      bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(k1)).cast("long").as("graft__lo1"),
      max(col(k1)).cast("long").as("graft__hi1"),
      min(col(k2)).cast("long").as("graft__lo2"),
      max(col(k2)).cast("long").as("graft__hi2"))
    df.join(broadcast(stats))
      .withColumn("graft__z", zValue(
        normalize(col(k1).cast("long"), col("graft__lo1"), col("graft__hi1"), bits),
        normalize(col(k2).cast("long"), col("graft__lo2"), col("graft__hi2"), bits),
        bits))
      .drop("graft__lo1", "graft__hi1", "graft__lo2", "graft__hi2")
      .repartitionByRange(nFiles, col("graft__z"))
      .sortWithinPartitions(col("graft__z"))
      .drop("graft__z")
      .write.mode("overwrite").parquet(path)
  }
}
