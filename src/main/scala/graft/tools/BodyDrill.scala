package graft.tools

import graft.Sessions
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: replay the fused lifecycle oracle bodies with PER-STAGE
  * timers, so the round-16 bench work optimizes the stage that actually
  * carries the wall — at sf0.1 the corpus is <1 MiB, so the suspicion
  * is fixed per-action orchestration cost (job launch, write commit,
  * snapshot/meta reads), not data volume. Prints one line per stage.
  *
  * Usage: runMain graft.tools.BodyDrill [s56|s59|s60|n178] [sfDir] [reps]
  */
object BodyDrill {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "s56"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local(appName = "graft-bodydrill")
    spark.sparkContext.setLogLevel("WARN")
    // Job-level ledger: one line per Spark job with wall time and the
    // submitting callsite — the fixed-cost hunt needs to know which
    // ACTIONS carry the stage walls, not just which operator calls.
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobStart.put(j.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(j.jobId)).foreach { case (t0, site) =>
            val dt = (System.nanoTime() - t0) / 1e9
            if (dt > 0.15)
              println(f"[job] ${j.jobId}%4d $dt%6.2f s  $site")
          }
        }
      })
    spark.range(1000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()

    def stage[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"== $which rep $rep ==")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("target/sinks/bodydrill"))
      val root = "target/sinks/bodydrill"
      val docs = t(spark, sfDir, "documents")
      val emb = t(spark, sfDir, "embeddings")
      which match {
        case "s56" | "s59" =>
          val base = docs.filter(col("doc_id") % 3 =!= 0)
          val delta = docs.filter(col("doc_id") % 3 === 0)
            .withColumn("g", col("doc_id"))
          val deltaVecs = emb.filter(col("vec_id") % 3 === 0)
          val lay = CorpusLifecycle.CorpusLayouts(
            registry = Some(s"$root/registry"), band = Some(s"$root/band"),
            lexical = Some(s"$root/lexical"), kmv = Some(s"$root/kmv"),
            ivf = Some(s"$root/ivf"), chunks = Some(s"$root/chunks"))
          stage("registry.build")(
            ClusterRegistry.build(base, "doc_id", "text", s"$root/registry"))
          stage("band.build")(
            BandIndex.build(base, "doc_id", "text", s"$root/band"))
          stage("lexical.build")(
            LexicalIndex.build(base, "doc_id", "text", s"$root/lexical"))
          stage("kmv.build")(
            KmvLayout.build(base.withColumn("g", col("doc_id")),
              "g", "doc_id", "text", s"$root/kmv", k = 32))
          stage("ivf.build")(
            IvfLayout.build(emb.filter(col("vec_id") % 3 =!= 0),
              "vec_id", "embedding", s"$root/ivf",
              Similarity.hyperplanes(4, 64).map(_.map(_.toDouble))))
          stage("chunks.build")(
            ChunkStore.build(base, "doc_id", "text", s"$root/chunks",
              maskBits = 4))
          if (which == "s56") {
            stage("band.append(crash)")(
              BandIndex.append(delta, "doc_id", "text", s"$root/band",
                batchId = "b1"))
            stage("lex.refresh(crash)")(
              LexicalIndex.refresh(delta, "doc_id", "text",
                s"$root/lexical", batchId = "b1"))
            stage("corpus.ingest")(
              CorpusLifecycle.ingest(delta, "doc_id", "text", lay,
                batchId = "b1", groupCol = Some("g"),
                deltaVectors = Some((deltaVecs, "vec_id", "embedding"))))
            stage("corpus.ingest(replay)")(
              CorpusLifecycle.ingest(delta, "doc_id", "text", lay,
                batchId = "b1", groupCol = Some("g"),
                deltaVectors = Some((deltaVecs, "vec_id", "embedding"))))
            stage("ingestAudit+collect")(
              CorpusLifecycle.ingestAudit(
                spark, lay, delta.select("doc_id"), "doc_id")
                .orderBy(col("layout"))
                .write.format("noop").mode("overwrite").save())
          } else {
            stage("corpus.ingest")(
              CorpusLifecycle.ingest(delta, "doc_id", "text", lay,
                batchId = "b1", groupCol = Some("g"),
                deltaVectors = Some((deltaVecs, "vec_id", "embedding"))))
            stage("maintain+collect")(
              CorpusLifecycle.maintain(spark, lay,
                CorpusLifecycle.MaintenancePolicy(
                  maxLiveGenerations = 1, maxChunkDeadShare = 0.9,
                  maxIvfCellShare = 0.2, ivfRetrainRounds = 2))
                .orderBy(col("layout"))
                .write.format("noop").mode("overwrite").save())
          }
        case "n178" =>
          val path = s"$root/registry"
          stage("build(1/5)")(
            ClusterRegistry.build(
              docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", path,
              threshold = 0.8))
          (1 to 4).foreach { r =>
            stage(s"ingest mb-$r")(
              ClusterRegistry.ingest(
                docs.filter(col("doc_id") % 5 === r),
                "doc_id", "text", path, batchId = s"mb-$r"))
            if (r == 2) {
              new java.io.File(s"$path/_applied/mb-2").delete()
              new java.io.File(s"$path/band/_applied/mb-2").delete()
              stage("ingest mb-2 replay")(
                ClusterRegistry.ingest(
                  docs.filter(col("doc_id") % 5 === 2),
                  "doc_id", "text", path, batchId = "mb-2"))
            }
          }
          stage("assignments+noop")(
            ClusterRegistry.assignments(spark, path)
              .write.format("noop").mode("overwrite").save())
        case other =>
          System.err.println(s"unknown body: $other"); sys.exit(2)
      }
      Materialize.releaseAll(spark)
    }
    spark.stop()
  }
}
