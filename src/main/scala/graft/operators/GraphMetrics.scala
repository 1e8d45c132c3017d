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
}
