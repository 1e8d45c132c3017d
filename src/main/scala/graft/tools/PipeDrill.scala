package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.Tables
import graft.operators.{DedupClusters, MinHashNearDup, Partitioning, TextOps}

/** Pipeline-decomposition drill (dev tool): time the n40 corpus
  * pipeline's stage prefixes cumulatively in ONE session, so the
  * composition overhead (extra actions, re-planning, fixpoint rounds)
  * is separable from the per-stage work the standalone queries
  * already measure.
  *
  * Usage: runMain graft.tools.PipeDrill [sfDir]
  */
object PipeDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(appName = "graft-pipe-drill")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val bench = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 100 === 0) // benchmark stand-in, n40's shape
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(label: String)(body: => Unit): Unit = {
      // second rep = steady (codegen/JIT out)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        sweep()
        dt
      }
      println(f"[pipe] $label%-26s ${ts.last}%6.2fs  (first ${ts.head}%5.2fs)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("tokenize+materialize") {
      val tok = graft.operators.Materialize.shared(
        Partitioning.spread(docs)
          .withColumn("graft__ws", TextOps.tokens(col("text")))
          .withColumn("graft__n_tok", size(col("graft__ws")).cast("long"))
          .withColumn("graft__md5", md5(col("text"))))
      noop(tok)
    }
    time("  +pairs") {
      val tok = graft.operators.Materialize.shared(
        Partitioning.spread(docs)
          .withColumn("graft__ws", TextOps.tokens(col("text"))))
      noop(MinHashNearDup.nearDupPairsFromTokens(
        tok.select(col("doc_id"), col("graft__ws").as("ws")), 0.8))
    }
    time("  +pairs+cc") {
      val tok = graft.operators.Materialize.shared(
        Partitioning.spread(docs)
          .withColumn("graft__ws", TextOps.tokens(col("text"))))
      noop(DedupClusters.keepOnePerCluster(
        MinHashNearDup.nearDupPairsFromTokens(
          tok.select(col("doc_id"), col("graft__ws").as("ws")), 0.8),
        "id_a", "id_b"))
    }
    time("full trainingSet (n40)") {
      noop(graft.pipeline.CorpusPipeline.trainingSet(docs, bench))
    }
    spark.stop()
  }
}
