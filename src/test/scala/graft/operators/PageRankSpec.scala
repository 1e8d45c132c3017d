package graft.operators

import graft.SparkTestBase

/** Closed-form PageRank-step coverage: hand-computed masses on a tiny
  * directed graph, and the integer-exactness/partitioning-invariance
  * claims. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("one damped step matches hand-computed integer masses") {
    // 1 -> 2, 1 -> 3, 2 -> 3: deg(1)=2, deg(2)=1, deg(3)=0 (sink).
    // mass(2) = 1e6/2 = 500000; mass(3) = 500000 + 1000000 = 1500000.
    // rank1 = 150000 + floor(mass * 85 / 100).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val got = PageRank.step(edges, "u", "v")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((2L, 150000L)),
      2L -> ((1L, 150000L + 425000L)),
      3L -> ((0L, 150000L + 1275000L))))
  }

  test("floor division truncates per-edge (the documented mass loss)") {
    // deg(1) = 3: each edge carries floor(1e6/3) = 333333
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val got = PageRank.step(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(2L) === 150000L + 333333L * 85L / 100L)
  }

  test("step is partitioning-invariant (exact BIGINT arithmetic)") {
    val edges = (1 to 400)
      .map(i => (i.toLong, ((i * 17) % 97 + 1).toLong)).toDF("u", "v")
    def run(parts: Int) = PageRank.step(edges.repartition(parts), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) === run(13))
  }
}
