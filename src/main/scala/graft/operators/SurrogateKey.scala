package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense surrogate keys without a single-partition window.
  *
  * The reference derives trip_id from monotonically_increasing_id
  * (etl.py:91), which is partition-dependent. A naive deterministic
  * replacement — row_number() over a global ORDER BY — collapses the
  * whole table into one partition, which is a scale-killer at 100 TB.
  *
  * This is the scale-safe equivalent: range-repartition on the sort key
  * (so partition p holds exactly the rows ranked between partitions p-1
  * and p+1), number rows within each partition, then shift every
  * partition by the total count of the partitions before it. The offset
  * table is one row per partition — metadata-sized, broadcast to the
  * join — so no stage ever sees more than its own partition's rows.
  *
  * Output equals `row_number() OVER (ORDER BY order*)` exactly, provided
  * `order` is a total ordering (no ties). Ties would make the global
  * row_number itself non-deterministic, so totality is the caller's
  * contract, same as for the naive form.
  */
object SurrogateKey {
  def denseRowNumber(df: DataFrame, outCol: String, order: Column*): DataFrame = {
    val pid = "graft__pid"
    val local = "graft__local"
    val ranged = df
      .repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
    val numbered = ranged.withColumn(
      local,
      row_number().over(Window.partitionBy(col(pid)).orderBy(order: _*)))
    // This unpartitioned window (Spark logs "No Partition Defined for
    // Window operation" here) is deliberate and safe: it runs over the
    // per-partition COUNTS — at most one row per shuffle partition,
    // metadata-sized at any data scale — never over the data itself.
    val offsets = ranged
      .groupBy(col(pid))
      .agg(count(lit(1)).as("graft__n"))
      .withColumn(
        "graft__offset",
        coalesce(
          sum(col("graft__n")).over(
            Window
              .orderBy(col(pid))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(pid), col("graft__offset"))
    numbered
      .join(broadcast(offsets), pid)
      .withColumn(outCol, (col(local) + col("graft__offset")).cast("long"))
      .drop(pid, local, "graft__offset")
  }
}
