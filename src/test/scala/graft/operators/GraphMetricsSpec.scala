package graft.operators

import graft.SparkTestBase

class GraphMetricsSpec extends SparkTestBase {

  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]) =
    GraphMetrics.triangles(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("enumerates each triangle exactly once, oriented a < b < c") {
    // K4 on {1,2,3,4} minus edge (1,4): triangles (1,2,3) and (2,3,4)
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(tri(edges) === Set((1L, 2L, 3L), (2L, 3L, 4L)))
  }

  test("K4 has all four triangles") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(tri(edges) === Set(
      (1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("paths, stars and 4-cycles are triangle-free") {
    assert(tri(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)).isEmpty) // path
    assert(tri(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L)).isEmpty) // star
    assert(tri(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)).isEmpty) // C4
  }

  test("labelPropagationStep: majority wins, ties take the smaller label, isolated keep their own") {
    import spark.implicits._
    // node 1 (label 9): neighbors 2,3 (label 5) and 4 (label 7) -> majority 5
    // node 5 (label 2): neighbors 6 (label 1) and 7 (label 3) -> tie -> 1
    // node 8 (label 4): isolated -> keeps 4
    val nodes = Seq((1L, 9L), (2L, 5L), (3L, 5L), (4L, 7L),
      (5L, 2L), (6L, 1L), (7L, 3L), (8L, 4L)).toDF("id", "label")
    val undirected = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (5L, 7L))
    val sym = (undirected ++ undirected.map(e => (e._2, e._1)))
      .toDF("src", "dst")
    val out = GraphMetrics.labelPropagationStep(
      nodes, "id", "label", sym, "src", "dst")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(byId(1L) === 5L)   // majority
    assert(byId(5L) === 1L)   // tie -> smaller
    assert(byId(8L) === 4L)   // isolated
    assert(byId(2L) === 9L)   // 2's only neighbor is 1 (label 9)
    assert(out.map(r => r._1 -> r._2).toMap === nodes.as[(Long, Long)].collect().toMap)
  }
}
