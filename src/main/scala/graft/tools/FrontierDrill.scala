package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.DedupClusters

/** Frontier-iteration drill for connected components at ~10⁷ edges —
  * 100× the sf0.1 near-dup edge scale (dev tool; run:
  * `sbt "runMain graft.tools.FrontierDrill"`).
  *
  * The 10× corpus drill (ScaleDrill) proves end-to-end scaling of the
  * full n30 pipeline; THIS drill isolates the claim the frontier
  * rewrite makes — per-round work tracks the FRONTIER, not |V|, and
  * rounds are O(log diameter) — by driving
  * [[DedupClusters.components]] directly on a synthetic graph whose
  * shape is chosen to stress exactly those properties:
  *
  *   - 3,000,000 path clusters of 3 vertices (9M vertices, 6M edges) —
  *     the realistic near-dup shape: tiny diameter, converges in 2-3
  *     rounds, and should then LEAVE the frontier entirely;
  *   - 20,000 star clusters of 100 (2M vertices, ~2M edges) — medium
  *     fan-out, 2-3 rounds;
  *   - 10 ring clusters of 100,000 with multiplicative-hash chords
  *     (1M vertices, ~2M edges) — large components with small-world
  *     diameter, ~10 rounds;
  *   - ONE chain of 100,000 vertices (0.1M edges) — the adversarial
  *     diameter case (DedupClustersSpec's 200-vertex chain at 500×):
  *     pure neighbor-min would need 100k rounds; pointer jumping must
  *     close it in ~log₂(100k) ≈ 17.
  *
  * All ids are deterministic range arithmetic — no RNG, re-runs are
  * identical. Expected evidence: the frontier collapses from ~11M
  * (round 1 initializes every vertex) to the ~100k chain tail within
  * a few rounds, per-round wall time collapses with it (late rounds
  * are broadcast-frontier edge scans), total rounds ≲ 20, and the
  * component count is exactly 3,020,011 — a full correctness check at
  * 10⁷ edges, not just a timing.
  */
object FrontierDrill {
  def main(args: Array[String]): Unit = {
    // dev knobs: args(0) = comma family filter (small,med,ring,chain),
    // args(1) = integer downscale divisor for fast experiments,
    // args(2) = "nodouble" to A/B the within-round pointer-doubling,
    //           "nofast" to A/B the small-graph gate's counted edge
    //           checkpoint (smallGraphEdgeRows = -1 skips it — the
    //           pre-round-9 symmetrize-in-one-pass spelling)
    val fams: Set[String] =
      if (args.nonEmpty) args(0).split(",").toSet
      else Set("small", "med", "ring", "chain")
    val div = if (args.length > 1) args(1).toLong else 1L
    val doubling = !(args.length > 2 && args(2) == "nodouble")
    val smallRows = if (args.length > 2 && args(2) == "nofast") -1L
                    else 4000000L

    val spark = Sessions.local(appName = "graft-frontier-drill")
    spark.sparkContext.setLogLevel("WARN")

    val nSmallV = 9000000L / div
    val small = spark.range(0L, nSmallV).toDF("i")
      .filter(col("i") % 3 =!= 2)
      .select(col("i").as("u"), (col("i") + 1).as("v"))

    val medBase = 10000000L
    val nStars = 20000L / div
    // NOTE: `/` on Spark integer columns is TRUE division (double) —
    // cluster indices must use integral `div`, or the generated ids are
    // fractional doubles that silently truncate into a scrambled graph
    // (the round-8 drill originally did exactly that and "found" a CC
    // bug that was really a generator bug)
    val med = spark.range(0L, nStars * 99).toDF("k")
      .select(
        (lit(medBase) + expr("k div 99") * 100).as("u"),
        (lit(medBase) + expr("k div 99") * 100 + (col("k") % 99) + 1).as("v"))

    val largeBase = 20000000L
    val ringSize = 100000L / div
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

    val chainBase = 30000000L
    val chainLen = 100000L / div
    val chain = spark.range(0L, chainLen - 1).toDF("k")
      .select((lit(chainBase) + col("k")).as("u"),
        (lit(chainBase) + col("k") + 1).as("v"))

    val parts = Seq(
      "small" -> small, "med" -> med, "ring" -> ring.union(chords),
      "chain" -> chain).collect { case (n, df) if fams(n) => df }
    val edges = parts.reduce(_ union _)
    println(s"[frontier] families=$fams div=$div edges=${edges.count()}")

    val t0 = System.nanoTime()
    val labels = DedupClusters.components(
      edges, "u", "v", maxIter = 30, pointerDoubling = doubling,
      smallGraphEdgeRows = smallRows,
      roundHook = (r, f, s) =>
        println(f"[frontier] round $r%2d  frontier $f%,12d  $s%7.2fs"))
    val nComp = labels.agg(countDistinct(col("comp"))).head.getLong(0)
    val total = (System.nanoTime() - t0) / 1e9
    val expected =
      (if (fams("small")) nSmallV / 3 else 0L) +
        (if (fams("med")) nStars else 0L) +
        (if (fams("ring")) 10L else 0L) +
        (if (fams("chain")) 1L else 0L)
    println(f"[frontier] components $nComp (expected $expected), total $total%.1fs")
    require(nComp == expected,
      s"component count mismatch: $nComp != $expected")
    if (fams("chain")) {
      // the chain must have fully contracted to its minimum vertex
      val chainComps = labels
        .filter(col("id") >= chainBase)
        .agg(countDistinct(col("comp")).as("n"), min(col("comp")).as("m"))
        .head
      require(chainComps.getLong(0) == 1L && chainComps.getLong(1) == chainBase,
        s"chain not contracted: $chainComps")
    }
    println("[frontier] verified")
    spark.stop()
  }
}
