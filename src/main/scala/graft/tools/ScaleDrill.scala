package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry}
import graft.sources.Tables

/** 10× synthetic scale drill for the heavy near-dup/CC/pipeline family
  * (dev tool; run: `sbt "runMain graft.tools.ScaleDrill"`).
  *
  * Builds a ~10× `documents` corpus from sf0.1 — the testdata stays
  * read-only; the synthetic corpus lands under target/ — and runs the
  * four heaviest document-family queries against it, reporting wall
  * times next to the same-process sf0.1 times. The bound of interest is
  * super-linear-free scaling (≤ ~15× wall at 10× rows, slack for fixed
  * costs), plus completion without driver OOM.
  *
  * Corpus construction: 10 salted copies per document. Copy 0 is
  * verbatim; copies 1..9 suffix every 3rd token with a copy tag, which
  * destroys enough 3-shingles that COPIES ARE NOT NEAR-DUPS OF EACH
  * OTHER (pairwise Jaccard ≈ 0.2, far under the 0.8 threshold) while
  * each copy stratum preserves the original corpus's near-dup
  * structure — so the near-dup workload scales ~10× in pairs and
  * clusters instead of exploding quadratically inside 10-way
  * exact-duplicate groups, which would measure output-size growth, not
  * operator scaling. (Exact-dup load at scale is exercised separately:
  * n40's first stage dedups md5 groups, and the drill corpus still
  * funnels 10× rows through it.)
  */
object ScaleDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scaledDir = "target/scale10x"
    val copies = 10
    val queries = Seq("n3_minhash_neardup", "n30_dedup_clusters",
      "n40_corpus_pipeline", "n56_source_overlap",
      "n68_online_neardup", "n70_leakage_safe_split")

    val spark = Sessions.local(appName = "graft-scale-drill")
    spark.sparkContext.setLogLevel("WARN")

    Tables(spark, sfDir, "documents")
      .crossJoin(spark.range(copies).toDF("graft__copy"))
      .select(
        (col("doc_id") * copies + col("graft__copy")).as("doc_id"),
        when(col("graft__copy") === 0, col("text"))
          .otherwise(concat_ws(" ", expr(
            """transform(split(text, ' '),
              |  (w, j) -> CASE WHEN j % 3 = 0
              |    THEN concat(w, '_c', graft__copy) ELSE w END)""".stripMargin)))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    // warmup (codegen/JIT) so neither arm is charged first-run ramp
    queries.foreach { q => time(q, sfDir); time(q, sfDir) }
    val rows = queries.map { q =>
      val base = time(q, sfDir)
      val scaled = time(q, scaledDir)
      println(f"[scale] $q%-22s sf0.1 $base%6.2fs  10x $scaled%6.2fs  ratio ${scaled / base}%5.2fx")
      (q, base, scaled)
    }
    val (tb, ts) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"[scale] TOTAL sf0.1 $tb%.2fs  10x $ts%.2fs  ratio ${ts / tb}%.2fx")
    spark.stop()
  }
}
