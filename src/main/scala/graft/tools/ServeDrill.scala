package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{LexicalIndex, Similarity}
import graft.queries.NorthStar

/** Serving-latency drill (dev tool): build each stored index ONCE,
  * then time the PROBE paths alone over repeated executions — the
  * amortized numbers a serving deployment sees, separated from the
  * build cost the self-contained registry queries pay on every run
  * (oracle queries must be independent, so s28–s32 rebuild per run by
  * design; this drill reports what the layouts actually buy).
  *
  * Usage: runMain graft.tools.ServeDrill [sfDir] [reps]
  */
object ServeDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local(appName = "graft-serve-drill")
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables

    // ---- one-time index builds (timed once, reported separately) ----
    val lexPath = "target/serve_drill/lex"
    val pqPath = "target/serve_drill/ivfpq"
    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[serve] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3fs")
    }
    timed("BUILD lexical index") {
      LexicalIndex.build(docs, "doc_id", "text", lexPath, n = 3)
    }
    val cents = Similarity.hyperplanes(4, 64).map(_.map(_.toDouble))
    timed("BUILD ivf-pq codes") {
      val corpus = emb.filter(col("vec_id") =!= 5)
      Similarity.pqCodes(corpus, "vec_id", "embedding", NorthStar.pqCodebookShared, 4)
        .join(corpus.select(col("vec_id"),
          Similarity.nearestCell(Similarity.asDouble(col("embedding")), cents)
            .as("cell")), Seq("vec_id"))
        .write.mode("overwrite").partitionBy("cell").parquet(pqPath)
    }

    // ---- probe-only timings: min over reps (steady state) ----
    def probe(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[serve] $label%-28s steady ${times.min}%6.3fs  reps ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    probe("moreLikeThis (s28 probe)") {
      LexicalIndex.moreLikeThis(spark, lexPath, queryDocId = 7L, k = 10)
    }
    probe("lexicalTopK (s29 probe)") {
      LexicalIndex.lexicalTopK(spark, lexPath, queryDocId = 3L, k = 10)
    }
    probe("bm25TopK (n122 probe)") {
      LexicalIndex.bm25TopK(spark, lexPath, queryDocId = 3L, k = 10)
    }
    probe("pointProbe (s31 probe)") {
      LexicalIndex.pointProbe(spark, lexPath,
        "table scan merge part window small hash", k = 10)
    }
    probe("ivfpq serve (s32 probe)") {
      val query = emb.filter(col("vec_id") === 5)
      val qv = query.select(Similarity.asDouble(col("embedding")))
        .head().getSeq[Double](0)
      val probes = cents.zipWithIndex.map { case (c, i) =>
        (c.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.sorted.take(2).map(_._2)
      val shortlist = Similarity.pqAdc(
        spark.read.parquet(pqPath).filter(col("cell").isin(probes: _*)),
        "vec_id", query, "embedding", NorthStar.pqCodebookShared, 4, k = 50)
        .select(col("vec_id"))
      Similarity.topKCosine(
        emb.filter(col("vec_id") =!= 5).join(broadcast(shortlist), Seq("vec_id")),
        "vec_id", "embedding", query, "embedding", k = 10)
    }

    // ---- round-11 third-wave layouts: delete path + sketch matrix ----
    timed("TOMBSTONE forget-set (s40)") {
      LexicalIndex.tombstone(
        docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", lexPath,
        batchId = "d1")
    }
    probe("lexicalTopK post-delete (s40)") {
      LexicalIndex.lexicalTopK(spark, lexPath, queryDocId = 3L, k = 10)
    }
    timed("COMPACT after delete") {
      LexicalIndex.compact(spark, lexPath)
    }
    probe("lexicalTopK post-compact") {
      LexicalIndex.lexicalTopK(spark, lexPath, queryDocId = 3L, k = 10)
    }
    val kmvPath = "target/serve_drill/kmv"
    timed("BUILD kmv sketch layout (s41)") {
      graft.operators.KmvLayout.build(
        docs, "source", "doc_id", "text", kmvPath)
    }
    probe("overlap matrix (s41 serve)") {
      graft.operators.KmvLayout.overlapMatrix(spark, kmvPath)
    }

    // ---- round-12 layouts: band point probe, maintained IVF ----
    val bandPath = "target/serve_drill/band"
    timed("BUILD band index (s37)") {
      graft.operators.BandIndex.build(docs, "doc_id", "text", bandPath)
    }
    val qText = docs.filter(col("doc_id") === 45)
      .select(col("text")).head().getString(0) + " zzz"
    probe("band pointProbe (s50 serve)") {
      graft.operators.BandIndex.pointProbe(
        docs, "doc_id", "text", bandPath, qText, threshold = 0.8)
    }
    timed("TOMBSTONE band forget-set (s44)") {
      graft.operators.BandIndex.tombstone(
        docs.filter(col("doc_id") % 10 === 7).select("doc_id"),
        "doc_id", bandPath, batchId = "d1")
    }
    probe("band pointProbe post-delete") {
      graft.operators.BandIndex.pointProbe(
        docs, "doc_id", "text", bandPath, qText, threshold = 0.8)
    }
    val ivfPath = "target/serve_drill/ivf"
    timed("BUILD ivf layout (s23)") {
      graft.operators.IvfLayout.build(
        emb.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", ivfPath, cents)
    }
    val qv5 = emb.filter(col("vec_id") === 5)
      .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0)
    probe("ivf topK (s23 serve)") {
      graft.operators.IvfLayout.topK(
        spark, ivfPath, qv5, nprobe = 2, k = 15, excludeId = Some(5L))
    }
    timed("REFRESH ivf 1-row delta (s48)") {
      graft.operators.IvfLayout.refresh(
        emb.filter(col("vec_id") === 3)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", ivfPath, batchId = "d1")
    }
    probe("ivf topK post-refresh") {
      graft.operators.IvfLayout.topK(
        spark, ivfPath, qv5, nprobe = 2, k = 15, excludeId = Some(5L))
    }
    spark.stop()
  }
}
