package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe top-k selection patterns. */
object TopK {

  /** Two-level per-group top-k (the funnel-avoidance pattern behind
    * n75/n78/n82): local winners per (group, salt) bucket first — every
    * global winner sits in some bucket and is in that bucket's top-k,
    * so the levels are exactly equivalent — then the final rank over
    * ≤ salts·k slim survivors per group. A one-level window partitioned
    * by a low-cardinality group key puts each group's whole ranking on
    * ONE reducer; this caps what any reducer sees. Emits `rk` (BIGINT,
    * 1-based). The ordering must be total (tie-break on a unique id) or
    * ranks are nondeterministic — the caller's contract, law-tested in
    * EngineLawsProps ("two-level top-k == one-level window top-k").
    */
  def twoLevel(
      df: DataFrame,
      group: Seq[Column],
      salt: Column,
      order: Seq[Column],
      k: Int): DataFrame = {
    val localW = Window.partitionBy(group :+ salt: _*).orderBy(order: _*)
    val finalW = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("graft__lrk", row_number().over(localW))
      .filter(col("graft__lrk") <= k)
      .withColumn("rk", row_number().over(finalW).cast("long"))
      .filter(col("rk") <= k)
      .drop("graft__lrk")
  }
}
