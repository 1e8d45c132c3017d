package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry}
import graft.operators.{MinHashNearDup, Partitioning, TextOps}
import graft.sources.Tables
import graft.streaming.StreamingNearDup

/** Pair-growth decomposition drill (dev tool; run:
  * `sbt "runMain graft.tools.PairDrill"`).
  *
  * The 100× ScaleDrill arms for the near-dup family report super-linear
  * wall ratios (r08: n3 57×, n68 73×, n56 ~70× at 100× rows). The claim
  * to verify is that the super-linear term is WORKLOAD growth — the
  * salted copy corpus makes every base near-dup pair reappear once per
  * copy stratum, and candidate/verified pairs grow with genuine dup
  * structure — not machinery cost. This drill separates the two: at
  * each scale it times the registry query, then counts the stage
  * cardinalities (LSH candidates, prefilter survivors, verified pairs;
  * n56: distinct (source,fp) rows, multi-source fingerprints, output
  * pairs), and reports wall per candidate. Healthy = the per-candidate
  * cost stays flat while candidates grow; a growing per-candidate cost
  * would mean the verify machinery itself degrades with scale.
  *
  * Counting a stage re-executes its plan (drill cost); the timed run is
  * separate and sweep-isolated, same discipline as Bench/ScaleDrill.
  *
  * args(0) = base sf dir (default sf0.1); args(1) = comma scale list
  * (default "1,10,100"); args(2) = comma query filter.
  */
object PairDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales =
      (if (args.length > 1) args(1) else "1,10,100").split(",").map(_.toInt)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def want(q: String): Boolean = only.forall(_.contains(q))

    val spark = Sessions.local(appName = "graft-pair-drill")
    spark.sparkContext.setLogLevel("WARN")

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timed(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      dt
    }
    // one warmup pass per query shape at base scale so no arm is
    // charged first-run codegen/JIT (shape-keyed, shared across scales)
    Seq("n3_minhash_neardup", "n68_online_neardup", "n56_source_overlap",
      "n110_pagerank_step", "n177_cluster_registry", "n169_chunk_delta")
      .filter(want).foreach(q => timed(q, sfDir))

    def report(scale: Int, q: String, wall: Double, counts: (String, Long)*): Unit = {
      val cand = counts.head._2
      val us = if (cand > 0) wall * 1e6 / cand else 0.0
      println(f"[pairs] scale=$scale%3d $q%-20s wall=$wall%8.2fs  " +
        counts.map { case (k, v) => f"$k=$v%,d" }.mkString("  ") +
        f"  us_per_${counts.head._1}=$us%9.1f")
    }

    scales.foreach { c =>
      val dir = if (c == 1) sfDir else ScaleCorpus.build(spark, sfDir, c)
      // counting stages re-run the queries' expensive per-row folds;
      // spread them exactly as the queries themselves do
      val docs = Partitioning.spread(Tables(spark, dir, "documents"))

      if (want("n3_minhash_neardup")) {
        val wall = timed("n3_minhash_neardup", dir)
        // stage cardinalities via the operator's own stage relations —
        // identical code path, so the counts are the query's counts
        val st = MinHashNearDup.stages(
          Partitioning.spread(docs)
            .select(col("doc_id"), TextOps.tokens(col("text")).as("ws")),
          threshold = 0.8)
        val (nc, np, nv) =
          (st.candidates.count(), st.plausible.count(), st.verified.count())
        sweep()
        report(c, "n3_minhash_neardup", wall,
          "candidates" -> nc, "plausible" -> np, "verified" -> nv)
      }

      if (want("n68_online_neardup")) {
        val wall = timed("n68_online_neardup", dir)
        // the query's own candidate spelling: streaming band keys,
        // bucket self-join, distinct
        val shingled = docs
          .select(col("doc_id"),
            TextOps.shinglesFromTokens(TextOps.tokens(col("text")), 3).as("sh"))
          .filter(size(col("sh")) > 0)
        val bk = StreamingNearDup.bandKeysFromSignatures(
          StreamingNearDup.signaturesFromShingles(
            shingled.select(col("doc_id"), col("sh").as("graft__sh"))))
          .transform(graft.operators.Materialize.shared)
        val nc = bk.alias("l")
          .join(bk.alias("r"),
            col("l.bucket") === col("r.bucket") &&
              col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id"), col("r.doc_id")).distinct().count()
        val nv = SparkEntry.queries("n68_online_neardup")(spark, dir).count()
        sweep()
        report(c, "n68_online_neardup", wall,
          "candidates" -> nc, "verified" -> nv)
      }

      if (want("n56_source_overlap")) {
        val wall = timed("n56_source_overlap", dir)
        // workload cardinalities: distinct (source, fingerprint) rows
        // feed the one corpus shuffle; multi-source fingerprints feed
        // the pair explode; output pairs are bounded by sources²
        val sh = docs
          .select(col("source"),
            explode(TextOps.shinglesFromTokens(TextOps.tokens(col("text")), 3))
              .as("graft__sh"))
          .select(col("source"), TextOps.hexHash60(col("graft__sh")).as("fp"))
          .distinct()
          .transform(graft.operators.Materialize.shared)
        val nFp = sh.count()
        val nShared = sh.groupBy(col("fp"))
          .agg(countDistinct(col("source")).as("ns"))
          .filter(col("ns") >= 2).count()
        val nOut = SparkEntry.queries("n56_source_overlap")(spark, dir).count()
        sweep()
        report(c, "n56_source_overlap", wall,
          "src_fp_rows" -> nFp, "shared_fps" -> nShared, "pairs" -> nOut)
      }

      if (want("n177_cluster_registry")) {
        // the 2.47× 10×-arm pin (SCALE_r13 §2): is the super-2× slope a
        // corpus term in ONE ingest, or fixed scheduling? Time the
        // oracle, then rebuild the same index and time build vs ingest
        // apart, with the workload cardinalities each ingest stage is
        // bounded by: delta rows, delta↔corpus verified probe pairs
        // (the band join + ledger-rehydrated verify), within-delta
        // pairs, touched clusters and re-mapped rows. Healthy = wall
        // tracks the dominant cardinality; machinery degradation =
        // per-pair cost growing while counts scale linearly.
        val wall = timed("n177_cluster_registry", dir)
        val path = "target/pair_drill/n177_registry"
        val delta = docs.filter(col("doc_id") % 7 === 3)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val tBuild = {
          val t0 = System.nanoTime()
          graft.operators.ClusterRegistry.build(
            docs, "doc_id", "text", path)
          (System.nanoTime() - t0) / 1e9
        }
        val tIngest = {
          val t0 = System.nanoTime()
          graft.operators.ClusterRegistry.ingest(
            delta, "doc_id", "text", path, batchId = "b1")
          (System.nanoTime() - t0) / 1e9
        }
        sweep()
        val nDelta = delta.count()
        val probePairs = graft.operators.BandIndex.probe(
          docs, delta, "doc_id", "text", s"$path/band", threshold = 0.8,
          excludeGen = Some("b1"))
          .transform(graft.operators.Materialize.shared)
        val nDC = probePairs.count()
        val nTouched = probePairs.select(col("corpus_id")).distinct().count()
        val sk = graft.operators.Materialize.shared(
          graft.operators.BandIndex.sketchRelation(
            delta, "doc_id", "text", 3, 64, 16))
        val nDD = MinHashNearDup.pairsFromSketched(sk, 0.8, 64).count()
        sweep()
        println(f"[pairs] scale=$c%3d n177_decomp         " +
          f"wall=$wall%8.2fs  build=$tBuild%7.2fs  ingest=$tIngest%6.2fs  " +
          f"delta=$nDelta%,d  dc_pairs=$nDC%,d  dd_pairs=$nDD%,d  " +
          f"touched=$nTouched%,d  " +
          f"us_per_dc=${if (nDC > 0) tIngest * 1e6 / nDC else 0.0}%9.1f")
      }

      if (want("n169_chunk_delta")) {
        // the second 2.47×-family arm: the edited-resync chunk delta.
        // Stage cardinalities: delta chunk occurrences (map-only CDC),
        // distinct candidate hashes (the store anti-join's broadcast
        // side), and genuinely new chunks (the stored delta) — the
        // refresh write is bounded by the last, the probe by the first.
        val wall = timed("n169_chunk_delta", dir)
        val path = "target/pair_drill/n169_chunks"
        val tBuild = {
          val t0 = System.nanoTime()
          graft.operators.ChunkStore.build(
            docs, "doc_id", "text", path, maskBits = 4)
          (System.nanoTime() - t0) / 1e9
        }
        val edited = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("graft__ws"))
          .withColumn("graft__p",
            (TextOps.hexHash60(concat(lit("edit:"),
              col("doc_id").cast("string")))
              % size(col("graft__ws")) + 1).cast("int"))
          .select(col("doc_id"), expr(
            "array_join(transform(graft__ws, (w, i) -> " +
              "CASE WHEN i + 1 = graft__p THEN concat(w, '_X') ELSE w END)" +
              ", ' ')").as("text"))
          .transform(graft.operators.Materialize.shared)
        val tRefresh = {
          val t0 = System.nanoTime()
          graft.operators.ChunkStore.refresh(
            edited, "doc_id", "text", path, batchId = "b1")
          (System.nanoTime() - t0) / 1e9
        }
        val chunkRows = edited
          .select(posexplode(TextOps.cdcChunks(
            TextOps.tokens(col("text")), 4)).as(Seq("pos", "chunk")))
        val nOcc = chunkRows.count()
        val nCand = chunkRows.select(
          TextOps.hexHash60(col("chunk")).as("h")).distinct().count()
        val nNew = spark.read.option("basePath", s"$path/store")
          .parquet(s"$path/store/gen=b1").count()
        sweep()
        println(f"[pairs] scale=$c%3d n169_decomp         " +
          f"wall=$wall%8.2fs  build=$tBuild%7.2fs  refresh=$tRefresh%6.2fs  " +
          f"chunk_occ=$nOcc%,d  cand_hashes=$nCand%,d  new_chunks=$nNew%,d  " +
          f"us_per_occ=${if (nOcc > 0) tRefresh * 1e6 / nOcc else 0.0}%9.1f")
      }

      if (want("n110_pagerank_step")) {
        val wall = timed("n110_pagerank_step", dir)
        // workload cardinality: the symmetrized near-dup edge list the
        // step aggregates/joins over — the scaled corpus grows it
        // ~quadratically within label blocks (perturbed copies stay
        // above the 0.4 cosine threshold), so edge count, not machinery,
        // is the scaling term to verify per-edge cost against
        val pairs = graft.operators.Similarity.blockedNearDupPairs(
          Tables(spark, dir, "embeddings"), "vec_id", "embedding", "label",
          threshold = 0.4)
        val nPairs = pairs.count()
        val nNodes = SparkEntry.queries("n110_pagerank_step")(spark, dir).count()
        sweep()
        report(c, "n110_pagerank_step", wall,
          "edges" -> (2 * nPairs), "nodes" -> nNodes)
      }
    }
    spark.stop()
  }
}
