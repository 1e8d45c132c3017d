package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored per-group KMV sketches — the warehouse-layout discipline
  * (s23/s26/s28/s37) applied to the sketch family. Cross-source
  * distinct-overlap questions ("how much of source B is already in
  * A?", the n157 estimator) should not re-shingle the corpus per ask:
  * the bottom-k sketches are tiny (k longs per group), a pure function
  * of each group's distinct hash set, and MERGEABLE — so they are an
  * ideal stored index, and incremental maintenance is exact, not
  * approximate-on-approximate: bottom-k(A ⊎ Δ) == trim_k(bottom-k(A) ∪
  * bottom-k(Δ)) (the KmvAgg mergeability law), so refresh appends a
  * delta-generation row per group (LSM — nothing rewritten) and the
  * read path folds generations by RE-SKETCHING the union of stored
  * sketch values: k·gens longs per group, never corpus data.
  *
  * Layout under `path`:
  *  - `sketches/` (group, sk: array<bigint>) — one row per group per
  *    generation;
  *  - `meta/` one row (k, hash_salt) — self-describing (the
  *    LexicalIndex lesson): a disagreeing caller k would silently
  *    produce valid-looking but non-comparable sketches.
  *
  * Serving reads fold generations and answer overlap matrices entirely
  * from the stored layout: the folded relation is groups-sized, the
  * pair join is a broadcast self-join, and every estimate is the n157
  * exact-integer algebra — bit-identical to a from-scratch closed-form
  * replay (oracle-gated, s41).
  */
object KmvLayout {

  private def tokenHashes(
      docs: DataFrame, groupCol: String, textCol: String,
      salt: String): DataFrame =
    docs.select(col(groupCol).as("group"),
      explode(TextOps.tokens(col(textCol))).as("graft__w"))
      .select(col("group"),
        TextOps.hexHash60(concat(lit(salt), col("graft__w"))).as("graft__h"))

  def build(
      docs: DataFrame, groupCol: String, textCol: String,
      path: String, k: Int = 64, salt: String = "kmvl:"): Unit = {
    val spark = docs.sparkSession
    tokenHashes(docs, groupCol, textCol, salt)
      .groupBy(col("group"))
      .agg(expr(s"graft_kmv(graft__h, $k)").as("sk"))
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").parquet(s"$path/sketches")
    spark.range(1)
      .select(lit(k.toLong).as("k"), lit(salt).as("hash_salt"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Delta refresh: sketch the delta ONLY and append its generation
    * rows — delta-sized work; the mergeability law makes the folded
    * read exact. Each refresh stamps the next generation number
    * (plan-time max over the file-count-sized sketch relation), which
    * is what [[sketches]]' `asOf` reads snapshot on. */
  def refresh(
      delta: DataFrame, groupCol: String, textCol: String,
      path: String): Unit = {
    val spark = delta.sparkSession
    val m = spark.read.parquet(s"$path/meta").head()
    val (k, salt) = (m.getAs[Long]("k").toInt, m.getAs[String]("hash_salt"))
    val nextGen = spark.read.parquet(s"$path/sketches")
      .agg(max(col("gen"))).head().getLong(0) + 1L
    tokenHashes(delta, groupCol, textCol, salt)
      .groupBy(col("group"))
      .agg(expr(s"graft_kmv(graft__h, $k)").as("sk"))
      .withColumn("gen", lit(nextGen))
      .write.mode("append").parquet(s"$path/sketches")
  }

  /** The folded logical sketch relation: one row per group, generations
    * merged by re-sketching the union of stored sketch values (exact by
    * mergeability; input is k·generations longs per group). `asOf`
    * gives SNAPSHOT ISOLATION for free — LSM generations are immutable
    * appends, so "the index as of generation g" is a filter, not a
    * restore: asOf(Some(0)) reads exactly the original build no matter
    * how many refreshes landed since (gated by s43). */
  def sketches(
      spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val k = spark.read.parquet(s"$path/meta").head().getAs[Long]("k").toInt
    val base = spark.read.parquet(s"$path/sketches")
    asOf.fold(base)(g => base.filter(col("gen") <= g))
      .select(col("group"), explode(col("sk")).as("graft__h"))
      .groupBy(col("group"))
      .agg(expr(s"graft_kmv(graft__h, $k)").as("sk"))
  }

  /** Pairwise distinct-overlap estimates for every group pair, served
    * entirely from the stored sketches — the n157 combined-k estimator
    * as exact-integer algebra over a broadcast groups-sized self-join.
    */
  def overlapMatrix(
      spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val k = spark.read.parquet(s"$path/meta").head().getAs[Long]("k").toInt
    val sk = sketches(spark, path, asOf)
    sk.select(col("group").as("source_a"), col("sk").as("graft__ska"))
      .join(broadcast(
        sk.select(col("group").as("source_b"), col("sk").as("graft__skb"))),
        col("source_a") < col("source_b"))
      .withColumn("graft__un",
        array_sort(array_distinct(concat(col("graft__ska"), col("graft__skb")))))
      .withColumn("kk", least(size(col("graft__un")), lit(k)).cast("long"))
      .withColumn("graft__kl", slice(col("graft__un"), 1, k))
      .withColumn("shared_k",
        size(array_intersect(array_intersect(col("graft__kl"), col("graft__ska")),
          col("graft__skb"))).cast("long"))
      .select(col("source_a"), col("source_b"), col("kk"), col("shared_k"),
        (col("shared_k") / col("kk")).as("j_est"))
  }
}
