package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{BandIndex, ChunkStore, ClusterRegistry, DedupClusters, IvfLayout, KmvLayout, LexicalIndex, Materialize, MinHashNearDup, Similarity}
import graft.sources.Tables

/** Build-vs-delta separation drill for the stored-index maintenance
  * family (dev tool; run: `sbt "runMain graft.tools.MaintenanceDrill
  * [sfDir] [copies]"`).
  *
  * The LSM layouts claim "refresh is delta-sized": a maintenance batch
  * costs what the DELTA costs, independent of how large the already-
  * indexed corpus is. The 10× ScaleDrill arms time whole oracle queries
  * (build + refresh + serve fused, by oracle self-containment), which
  * cannot see that separation — this drill builds each index TWICE
  * (1× corpus and `copies`× corpus, same ScaleCorpus construction) and
  * times the three phases apart, refreshing with the SAME 1× delta on
  * both. The claim holds iff the refresh column is ~flat across the
  * two corpus arms while the build column grows ~linearly; the serve
  * column shows what the index buys (probe cost vs corpus growth).
  *
  * Layouts drilled: the lexical index (s28/s30), the band index
  * (s37), the KMV sketch layout (s41), and the content-addressed
  * chunk store (s42/s47).
  */
object MaintenanceDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100

    val spark = Sessions.local(appName = "graft-maintenance-drill")
    spark.sparkContext.setLogLevel("WARN")
    val scaledDir = ScaleCorpus.build(spark, sfDir, copies)

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      dt
    }
    def timedCount(df: => org.apache.spark.sql.DataFrame): Double =
      timed { df.write.format("noop").mode("overwrite").save() }

    val docs1 = Tables(spark, sfDir, "documents")
    // the delta: the 1× corpus re-keyed out of both id spaces (scaled
    // ids are doc_id·copies + copy < ~1e7)
    val delta = docs1.withColumn("doc_id", col("doc_id") + 1000000000L)
    // the probe batch for the band index: a DIFFERENT re-keying so the
    // probe is never confused with indexed content
    val probeBatch = docs1
      .withColumn("doc_id", col("doc_id") + 2000000000L)

    case class Row3(
        layout: String, arm: String,
        build: Double, refresh: Double, serve: Double)
    val out = Seq.newBuilder[Row3]

    def drill(arm: String, dir: String): Unit = {
      val docs = Tables(spark, dir, "documents")
      val tag = s"target/maint_drill/$arm"

      // lexical index: build / refresh(1× delta) / one serve probe
      val lex = s"$tag/lex"
      val bLex = timed(LexicalIndex.build(docs, "doc_id", "text", lex, n = 3))
      val rLex = timed(LexicalIndex.refresh(
        delta, "doc_id", "text", lex, batchId = "d1"))
      val sLex = timedCount(
        LexicalIndex.lexicalTopK(spark, lex, queryDocId = 3L, k = 10))
      out += Row3("lexical(s28/s30)", arm, bLex, rLex, sLex)

      // band index: build / append(1× delta) / probe(1× batch)
      val band = s"$tag/band"
      val bBand = timed(BandIndex.build(docs, "doc_id", "text", band))
      val rBand = timed(BandIndex.append(
        delta, "doc_id", "text", band, batchId = "d1"))
      val sBand = timedCount(BandIndex.probe(
        docs.unionByName(delta), probeBatch, "doc_id", "text", band,
        threshold = 0.8))
      out += Row3("band(s37)", arm, bBand, rBand, sBand)

      // KMV sketch layout: build / refresh(1× delta) / overlap matrix
      val kmv = s"$tag/kmv"
      val bKmv = timed(KmvLayout.build(
        docs, "source", "doc_id", "text", kmv))
      val rKmv = timed(KmvLayout.refresh(
        delta, "source", "doc_id", "text", kmv, batchId = "d1"))
      val sKmv = timedCount(KmvLayout.overlapMatrix(spark, kmv))
      out += Row3("kmv(s41)", arm, bKmv, rKmv, sKmv)

      // chunk store: build / refresh(1× delta) / generation stats
      // (reconstruction is the corpus-sized rebuild op by contract —
      // the maintenance claim is about the WRITE path)
      val cs = s"$tag/chunks"
      val bCs = timed(ChunkStore.build(docs, "doc_id", "text", cs))
      val rCs = timed(ChunkStore.refresh(
        delta, "doc_id", "text", cs, batchId = "d1"))
      val sCs = timedCount(ChunkStore.generationStats(spark, cs))
      out += Row3("chunkstore(s42)", arm, bCs, rCs, sCs)

      // IVF layout: build / refresh(1× delta) / topK probe — plus the
      // quantizer-maintenance pair this family owns: cellStats (the
      // metadata-sized retrain-decision report) and retrain itself
      // (deliberately the corpus-sized pass: Lloyd rounds exchange
      // nlist×dim partials, the reassign is a map-only argmin)
      val ivf = s"$tag/ivf"
      val vecs = Tables(spark, dir, "embeddings")
      val vdelta = Tables(spark, sfDir, "embeddings")
        .withColumn("vec_id", col("vec_id") + 1000000000L)
      val cents = Similarity.hyperplanes(4, 64).map(_.map(_.toDouble))
      val bIvf = timed(IvfLayout.build(
        vecs, "vec_id", "embedding", ivf, cents))
      val rIvf = timed(IvfLayout.refresh(
        vdelta, "vec_id", "embedding", ivf, batchId = "d1"))
      val qv = Tables(spark, sfDir, "embeddings")
        .filter(col("vec_id") === 2)
        .select(Similarity.asDouble(col("embedding")))
        .head().getSeq[Double](0)
      val sIvf = timedCount(IvfLayout.topK(spark, ivf, qv, 2, 10))
      out += Row3("ivf(s23/s48)", arm, bIvf, rIvf, sIvf)
      val tStats = timedCount(IvfLayout.cellStats(spark, ivf))
      val tRetrain = timed(IvfLayout.retrain(spark, ivf, rounds = 3))
      val sIvf2 = timedCount(IvfLayout.topK(spark, ivf, qv, 2, 10))
      println(f"[maint] ivf retrain $arm%-5s cellStats $tStats%6.2fs  " +
        f"retrain(3 rounds) $tRetrain%6.2fs  post-retrain probe $sIvf2%6.2fs")

      // cluster registry: build (batch clustering — the one-time cost
      // ingest amortizes) / ingest(1× delta) / assignment fold; plus a
      // SMALL-delta arm (1% of the 1× corpus) — the micro-batch shape
      // a streaming ingest actually runs, isolating the delta term
      // from the corpus-sized-but-narrow band join + assignment fold
      val cr = s"$tag/registry"
      val bCr = timed(ClusterRegistry.build(docs, "doc_id", "text", cr))
      val rCr = timed(ClusterRegistry.ingest(
        delta, "doc_id", "text", cr, batchId = "d1"))
      val sCr = timedCount(ClusterRegistry.assignments(spark, cr))
      out += Row3("registry(n177)", arm, bCr, rCr, sCr)
      val small = docs1.filter(col("doc_id") % 100 === 3)
        .withColumn("doc_id", col("doc_id") + 3000000000L)
      // delta-only: the layout-owned ledger already holds the build
      // set + d1, so candidate text rehydration is self-contained
      val rSmall = timed(ClusterRegistry.ingest(
        small, "doc_id", "text", cr, batchId = "d2"))
      println(f"[maint] registry small-delta (1%%) $arm%-5s " +
        f"ingest $rSmall%6.2fs")
      // the compact lifecycle: fold the log to base, then show what the
      // compacted shape buys — the read fold (base-only, no overlay)
      // and a second small ingest whose registry fold term is now
      // delta+merge-sized (base anti-joins a broadcast overlay instead
      // of re-shuffling corpus-sized assignments)
      val cCr = timed(ClusterRegistry.compact(spark, cr))
      val sCr2 = timedCount(ClusterRegistry.assignments(spark, cr))
      val small2 = docs1.filter(col("doc_id") % 100 === 7)
        .withColumn("doc_id", col("doc_id") + 4000000000L)
      val rSmall2 = timed(ClusterRegistry.ingest(
        small2, "doc_id", "text", cr, batchId = "d3"))
      println(f"[maint] registry compact $arm%-5s wall $cCr%6.2fs  " +
        f"post-compact fold $sCr2%6.2fs  " +
        f"post-compact small ingest $rSmall2%6.2fs")

      // registry BUILD decomposition — which term dominates the one
      // honest corpus pass: the scan→shingle→sketch chain, the
      // within-corpus pair join (band bucket join + sig prefilter +
      // exact verify), the connected-components rounds, or the
      // partitioned writes? Each stage is timed with its INPUT cached
      // (no sweep between stages), so a stage's time is its own work;
      // the residual vs the fused build above is the write term plus
      // the band-index build's own postings/sigs writes.
      def stage(df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sk = Materialize.shared(BandIndex.sketchRelation(
        docs, "doc_id", "text", 3, 64, 16))
      val tSketch = stage(sk)
      val pairs = Materialize.shared(
        MinHashNearDup.pairsFromSketched(sk, 0.8, numHashes = 64))
      val tPairs = stage(pairs)
      val tCC = stage(DedupClusters.components(pairs, "id_a", "id_b"))
      sweep()
      println(f"[maint] registry build-decomp $arm%-5s " +
        f"sketch $tSketch%6.2fs  pairs $tPairs%6.2fs  cc $tCC%6.2fs  " +
        f"writes+rest ${math.max(0.0, bCr - tSketch - tPairs - tCC)}%6.2fs" +
        f"  (fused build $bCr%6.2fs)")
    }

    // warmup on the 1× arm (codegen/JIT), then measure both arms
    drill("warmup", sfDir)
    out.clear()
    drill("1x", sfDir)
    drill(s"${copies}x", scaledDir)

    out.result().groupBy(_.layout).toSeq.sortBy(_._1).foreach {
      case (layout, rows) =>
        rows.sortBy(_.arm).foreach { r =>
          println(f"[maint] ${r.layout}%-18s ${r.arm}%-5s " +
            f"build ${r.build}%7.2fs  refresh(1x delta) ${r.refresh}%6.2fs  " +
            f"serve ${r.serve}%6.2fs")
        }
    }
    spark.stop()
  }
}
