package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive parallelism helper for compute-heavy operators.
  *
  * A small parquet file is one row group → one scan partition, so an
  * expression-heavy stage (per-shingle hashing, pair-join cosine) would
  * run single-threaded no matter how many cores exist. `spread`
  * repartitions ONLY when the input has fewer partitions than the
  * cluster's default parallelism — at 100 TB the scan already has
  * thousands of splits and this is a no-op (no gratuitous shuffle of a
  * hundred terabytes); on a small input it unlocks every core for the
  * expensive downstream expressions.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd (internal rows) answers the partition count without
    // building the row-deserializer plan that `df.rdd` would; physical
    // planning of this probe is unavoidable for the question asked, and
    // the downstream query compiles its own plan either way.
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
