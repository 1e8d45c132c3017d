package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.DedupClusters

/** Label-consistency diagnostic for [[DedupClusters.components]] (dev
  * tool; run: `sbt "runMain graft.tools.CCDebug [div] [nodouble]"`).
  *
  * Runs the FrontierDrill ring family (10 rings of 100k/div with
  * multiplicative-hash chords — the shape that exposed the round-8
  * under-merge) and, instead of a pass/fail require, classifies every
  * wrong vertex:
  *
  *   - STALE POINTER: comp(x) = v but comp(v) < v — x adopted a label
  *     whose own label moved on and the change was never re-offered;
  *     implicates the pointer-jump / doubling notification invariant;
  *   - STALLED FLOOD: comp(x) = v, comp(v) = v, but v is not the
  *     cluster minimum — the min-label wave stopped crossing edges;
  *     implicates the nbrMin offer path (dropped rows).
  *
  * The split tells us WHERE the execution diverges from the algebra,
  * which no count-only drill can.
  */
object CCDebug {
  def main(args: Array[String]): Unit = {
    val div = if (args.nonEmpty) args(0).toLong else 1L
    val doubling = !(args.length > 1 && args(1) == "nodouble")

    val spark = Sessions.local(appName = "graft-cc-debug")
    spark.sparkContext.setLogLevel("WARN")

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
    val edges = ring.union(chords)

    val labels = DedupClusters.components(
      edges, "u", "v", maxIter = 30, pointerDoubling = doubling,
      roundHook = (r, f, s) =>
        println(f"[ccdebug] round $r%2d  frontier $f%,12d  $s%7.2fs"))
      .cache()

    val withExpected = labels.withColumn(
      "expected",
      lit(largeBase) + expr(s"(id - ${largeBase}L) div ${ringSize}L") * ringSize)
    val wrong = withExpected.filter(col("comp") =!= col("expected")).cache()
    println(s"[ccdebug] wrong vertices: ${wrong.count()} of ${labels.count()}")

    // classify: join each wrong vertex's comp against the label table
    val l2 = labels.select(col("id").as("vid"), col("comp").as("vcomp"))
    val classified = wrong
      .join(l2, wrong("comp") === col("vid"), "left")
      .withColumn("kind",
        when(col("vid").isNull, "DANGLING (comp not a labeled vertex)")
          .when(col("vcomp") < col("comp"), "STALE POINTER (comp's comp is smaller)")
          .otherwise("STALLED FLOOD (comp is a self-root, not cluster min)"))
      .cache()
    classified.groupBy("kind").count().show(truncate = false)

    // per-cluster damage
    wrong.groupBy(((col("id") - largeBase) / ringSize).cast("long").as("cluster"))
      .agg(count("*").as("wrong"), countDistinct("comp").as("distinct_bad_labels"))
      .orderBy("cluster").show(20, truncate = false)

    // sample of each kind with full pointer context
    classified.select("id", "comp", "expected", "vcomp", "kind")
      .orderBy("kind", "id").show(40, truncate = false)

    // for stalled-flood roots: do they have a neighbor with a smaller label?
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val roots = classified.filter(col("kind").startsWith("STALLED"))
      .select(col("comp").as("root")).distinct()
    val rootNbrMin = roots
      .join(sym, col("root") === sym("u"))
      .join(l2, sym("v") === col("vid"))
      .groupBy("root").agg(min("vcomp").as("nbr_min"))
    println("[ccdebug] stalled roots whose neighbors hold a smaller label (should be impossible at fixpoint):")
    rootNbrMin.filter(col("nbr_min") < col("root")).show(20, truncate = false)
    spark.stop()
  }
}
