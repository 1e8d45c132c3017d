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
}
