package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Compile-time bridge to two `private[sql]` Spark APIs (the Scala
  * access modifier admits code in this package; the JVM methods are
  * public). Used by `graft.operators.IterationCheckpoint` to rebuild a
  * checkpointed frame from its INTERNAL rows: the public
  * `createDataFrame(rdd, schema)` route would deserialize every
  * UnsafeRow to an external `Row` and re-encode it on each downstream
  * scan — a per-row tax paid on the full label/vocab table every
  * iteration of a driver-controlled loop. `internalCreateDataFrame`
  * wraps the same rows in a fresh `LogicalRDD` with default statistics
  * (the stats reset is the point — see IterationCheckpoint's scaladoc)
  * and no conversion at all.
  *
  * Version note: both members exist unchanged across Spark 3.x–4.x
  * (`internalCreateDataFrame` on the classic SparkSession,
  * `QueryExecution.toRdd`); if a future Spark hides them, fall back to
  * `createDataFrame(ck.rdd, ck.schema)` — identical semantics, slower
  * scan.
  */
object GraftSqlInternals {

  def internalCreateDataFrame(
      spark: SparkSession,
      rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)

  /** The dataset's compiled internal-row RDD (`QueryExecution.toRdd`). */
  def internalRdd(df: Dataset[_]): RDD[InternalRow] =
    df.queryExecution.toRdd
}
