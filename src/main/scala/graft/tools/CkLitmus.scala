package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Sessions

/** Checkpoint-integrity litmus (dev tool; run:
  * `sbt "runMain graft.tools.CkLitmus"`).
  *
  * Builds the FrontierDrill ring-family edge list (2M rows, all values
  * inside [2e7, 2e7 + 1e6)) and runs the exact symmetrize pipeline
  * DedupClusters uses, checking row-level invariants after each
  * materialization strategy:
  *
  *   raw       — no checkpoint (ground truth)
  *   localck   — Dataset.localCheckpoint() as-is
  *   rebuild   — IterationCheckpoint.local (localCheckpoint + internal-
  *               row stats-reset rebuild, the d728a91 path)
  *   extrow    — localCheckpoint + createDataFrame(ck.rdd, schema)
  *               (the pre-d728a91 external-row rebuild)
  *
  * Invariants: row count, distinct count, vertex count, value range.
  * Any strategy whose numbers differ from raw corrupts rows.
  */
object CkLitmus {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-ck-litmus")
    spark.sparkContext.setLogLevel("WARN")

    val largeBase = 20000000L
    val ringSize = 100000L
    val ringIdx = spark.range(0L, 10L * ringSize).toDF("k")
      .withColumn("c", expr(s"k div $ringSize"))
      .withColumn("p", col("k") % ringSize)
    val ring = ringIdx.select(
      (lit(largeBase) + col("k")).as("u"),
      (lit(largeBase) + col("c") * ringSize + (col("p") + 1) % ringSize).as("v"))
    val chords = ringIdx.select(
      (lit(largeBase) + col("k")).as("u"),
      (lit(largeBase) + col("c") * ringSize +
        pmod(col("p") * 2654435761L + col("c"), lit(ringSize))).as("v"))
    val e = ring.union(chords)

    def sym(base: DataFrame): DataFrame =
      base.union(base.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()

    def report(name: String, df: DataFrame): Unit = {
      val n = df.count()
      val nd = df.distinct().count()
      val nv = df.select(col("u")).distinct().count()
      val r = df.agg(
        min("u"), max("u"), min("v"), max("v")).head()
      println(s"[litmus] $name rows=$n distinct=$nd vertices=$nv " +
        s"uRange=[${r.getLong(0)},${r.getLong(1)}] vRange=[${r.getLong(2)},${r.getLong(3)}]")
    }

    report("raw     ", sym(e))
    report("localck ", sym(e).localCheckpoint())
    val (reb, _) = graft.operators.IterationCheckpoint.local(sym(e))
    report("rebuild ", reb)
    val ck = sym(e).localCheckpoint()
    report("extrow  ", spark.createDataFrame(ck.rdd, ck.schema))

    // second-order: the labels stage over each strategy
    def labelCount(df: DataFrame): Long =
      df.select(col("u").as("id")).distinct().withColumn("comp", col("id")).count()
    println(s"[litmus] labels over raw     = ${labelCount(sym(e))}")
    println(s"[litmus] labels over rebuild = ${labelCount(reb)}")
    spark.stop()
  }
}
