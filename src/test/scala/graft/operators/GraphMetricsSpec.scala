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
}
