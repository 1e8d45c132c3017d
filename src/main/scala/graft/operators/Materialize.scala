package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The ONE spelling for persisting a multiply-consumed map-only
  * intermediate (shingle sets, sketch tables, fingerprint relations):
  * every such site routes through [[shared]] so the storage level and
  * the release contract cannot drift between operators.
  *
  * Release contract: these caches are released by the session runner's
  * sweep — `spark.catalog.clearCache()` plus unpersisting
  * `sparkContext.getPersistentRDDs` — which Verify and Bench run after
  * EVERY query execution, so repeated invocations in a long session do
  * not accumulate storage. A library caller composing operators should
  * run the same sweep (see [[releaseAll]]) once results are consumed,
  * or pass a staged materializer where the operator exposes one
  * (MinHashNearDup.stagedMaterializer — the 100 TB mode, which holds
  * no executor storage at all).
  */
object Materialize {

  /** Executor cache, spilling to disk rather than OOMing. */
  def shared(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)

  /** The runner sweep: drop every cached Dataset AND RDD-level persist
    * (localCheckpoint blocks survive `clearCache` alone). */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
