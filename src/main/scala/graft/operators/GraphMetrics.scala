package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph metrics over pair relations (the near-dup graph, the n110
  * citation graph). First resident: triangle enumeration — the
  * clustering signal that separates TEMPLATE FAMILIES (dense, triangle-
  * rich near-dup neighborhoods) from chance pair collisions (isolated
  * edges): a dedup audit that sees many pairs but few triangles is
  * looking at noise, not boilerplate.
  *
  * Shape: the classic two-join enumeration over an ORIENTED edge list
  * (u < v, so each triangle is produced exactly once as a < b < c):
  * wedges from E⋈E on the middle vertex, closed by a semi-join back to
  * E. Exchanges carry (u, v) id pairs only. At corpus scale, orient
  * edges low-degree → high-degree instead of by raw id (Schank &
  * Wagner 2005): wedge fan-out is then Σ d(v)·min-degree-bounded,
  * O(E^{3/2}) total work regardless of hubs — the id orientation here
  * is the small-graph spelling of the same join plan.
  */
object GraphMetrics {

  /** Enumerate triangles (a < b < c) in an edge list with u < v. */
  def triangles(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges.select(col(uCol).as("graft__u"), col(vCol).as("graft__v"))
    val wedges = e.alias("e1")
      .join(e.alias("e2"), col("e1.graft__v") === col("e2.graft__u"))
      .select(col("e1.graft__u").as("a"), col("e1.graft__v").as("b"),
        col("e2.graft__v").as("c"))
    wedges.join(
      e.select(col("graft__u").as("a"), col("graft__v").as("c")),
      Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** Degree of every endpoint in a SYMMETRIZED edge list, as
    * (graft__nid, graft__deg) — one agg over the edges, exchanges
    * carry (id, count) longs. Nodes with no edges do not appear;
    * callers left-join and coalesce to 0.
    *
    * Takes ONLY the source column: on a symmetrized list every
    * endpoint appears as a source, so counting src occurrences IS the
    * degree — and the single-column signature makes the symmetrized-
    * input contract visible at the call site (a two-column signature
    * that silently ignored the destination invited wrong degrees on
    * unsymmetrized edge lists). Symmetrize first for directed input. */
  def degrees(edges: DataFrame, srcCol: String): DataFrame =
    edges.select(col(srcCol).as("graft__nid"))
      .groupBy(col("graft__nid"))
      .agg(count(lit(1)).as("graft__deg"))

  /** One k-core peel round (Matula & Beck 1983 / Batagelj & Zaversnik
    * 2003's synchronous spelling): restrict the edge list to the
    * `alive` node set, recompute degrees, and keep nodes whose degree
    * within the surviving subgraph is >= k. Returns (idCol, deg) for
    * the survivors. The k-core fixpoint iterates this until no node
    * drops — under IterationCheckpoint exactly like the CC/PageRank/
    * label-prop loops (each round strictly shrinks the node set, so
    * termination is structural).
    *
    * Scale shape: two semi-joins (edge endpoints against the alive
    * set) + one count agg — exchanges carry id/count longs only, no
    * adjacency lists materialized, no window. `alive` is node-sized so
    * the semi-joins shuffle-hash on the id key; never broadcast it.
    */
  def kCorePeelRound(
      alive: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String, k: Int): DataFrame =
    subgraphDegrees(alive, idCol, edges, srcCol, dstCol)
      .filter(col("deg") >= k)

  /** Degrees within the subgraph induced by the `alive` node set:
    * (idCol, deg) for every alive node that keeps at least one edge —
    * the reporting half of [[kCorePeelRound]] (the peel is exactly
    * `deg >= k` over this relation). Two endpoint semi-joins + one
    * count agg; exchanges carry id/count longs only. */
  def subgraphDegrees(
      alive: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val ids = alive.select(col(idCol).as("graft__nid"))
    val kept = edges
      .select(col(srcCol).as("graft__src"), col(dstCol).as("graft__dst"))
      .join(ids.withColumnRenamed("graft__nid", "graft__src"),
        Seq("graft__src"), "left_semi")
      .join(ids.withColumnRenamed("graft__nid", "graft__dst"),
        Seq("graft__dst"), "left_semi")
    degrees(kept, "graft__src")
      .select(col("graft__nid").as(idCol), col("graft__deg").as("deg"))
  }

  /** One synchronous label-propagation round (Raghavan et al. 2007):
    * every node adopts the most frequent label among its neighbors
    * (ties to the smaller label), keeping its own label when it has no
    * neighbors. `nodes` is (idCol, labelCol); `edges` (srcCol, dstCol)
    * must already be SYMMETRIZED — the step reads src→dst only, so an
    * undirected pair list needs both directions unioned in.
    *
    * Scale shape: neighbor labels are ONE equi-join of the edge list
    * against the node labels, the vote an agg-shaped max_by over
    * (count, label) — no per-node window, no label list materialized.
    * Exchanges carry (id, label, count) triples. The community fixpoint
    * iterates this under IterationCheckpoint exactly like the CC/
    * PageRank loops.
    */
  def labelPropagationStep(
      nodes: DataFrame, idCol: String, labelCol: String,
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val lbl = nodes.select(col(idCol).as("graft__nid"),
      col(labelCol).cast("long").as("graft__lbl"))
    val votes = edges
      .select(col(srcCol).as("graft__nid"), col(dstCol).as("graft__dst"))
      .join(lbl, "graft__nid")
      .groupBy(col("graft__dst"), col("graft__lbl"))
      .agg(count(lit(1)).as("graft__cnt"))
      // argmax by (count, smaller label): max of (cnt, -lbl) — the
      // agg-shaped spelling, no window over the vote relation
      .groupBy(col("graft__dst"))
      .agg(max(struct(col("graft__cnt"), (-col("graft__lbl")).as("graft__neg")))
        .as("graft__w"))
      .select(col("graft__dst").as("graft__nid"),
        (-col("graft__w.graft__neg")).as("graft__new"))
    lbl
      .join(votes, Seq("graft__nid"), "left")
      .select(col("graft__nid").as(idCol),
        col("graft__lbl").as("old_label"),
        coalesce(col("graft__new"), col("graft__lbl")).as("new_label"))
  }

  /** Multi-round label propagation under IterationCheckpoint — the
    * n79/n83/n67/n119 trainer discipline applied to [[labelPropagationStep]]:
    * the edge list is persisted ONCE, each round is one edge⋈label join
    * plus the agg-shaped majority vote (no per-node window), and the
    * label lineage is truncated every `checkpointEvery` rounds with the
    * superseded blocks released eagerly, so any round count runs at
    * edge-sized marginal cost. Votes and labels are exact integers —
    * checkpoint cadence cannot change values, and a fixed round count
    * is the standard LPA termination (Raghavan et al. 2007 note the
    * raw fixpoint can oscillate; synchronous rounds with a smaller-
    * label tie-break are deterministic, which the oracle unrolls).
    * Output: (idCol, old_label = the initial label, new_label = the
    * label after `rounds` synchronous rounds). */
  def labelPropagationTrain(
      nodes: DataFrame, idCol: String, labelCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val sc = nodes.sparkSession.sparkContext
    val e = Materialize.shared(edges.select(
      col(srcCol).as("graft__src"), col(dstCol).as("graft__dst")))
    val init = Materialize.shared(nodes.select(
      col(idCol).as("graft__id"), col(labelCol).cast("long").as("graft__l0")))
    var lbl = init.select(col("graft__id"), col("graft__l0").as("graft__l"))
    var held: scala.collection.Set[Int] = Set.empty
    for (r <- 1 to rounds) {
      lbl = labelPropagationStep(
        lbl.select(col("graft__id"), col("graft__l")), "graft__id", "graft__l",
        e, "graft__src", "graft__dst")
        .select(col("graft__id"), col("new_label").as("graft__l"))
      if (checkpointEvery > 0 && r % checkpointEvery == 0 && r < rounds) {
        val (ck, ids, _) = IterationCheckpoint.localCounted(lbl)
        IterationCheckpoint.release(sc, held)
        lbl = ck
        held = ids
      }
    }
    init.join(lbl, Seq("graft__id"))
      .select(col("graft__id").as(idCol),
        col("graft__l0").as("old_label"),
        col("graft__l").as("new_label"))
  }
}
