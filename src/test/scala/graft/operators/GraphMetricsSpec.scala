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

  private def sym(undirected: Seq[(Long, Long)]) =
    (undirected ++ undirected.map(e => (e._2, e._1))).toDF("src", "dst")

  test("labelPropagationTrain: train(1) == step; hand-computed 2 rounds; checkpoint-invariant") {
    import spark.implicits._
    // Same fixture as the step test. Round 1: 1→5, 2→9, 3→9, 4→9,
    // 5→1, 6→2, 7→2, 8→4 (each node votes over INITIAL labels).
    // Round 2 over the round-1 labels:
    //   1's neighbors {2,3,4} all carry 9 → 1→9
    //   2,3,4's only neighbor 1 carries 5 → 5
    //   5's neighbors {6,7} both carry 2 → 2; 6,7's neighbor 5 carries 1
    //   8 isolated → 4
    val nodes = Seq((1L, 9L), (2L, 5L), (3L, 5L), (4L, 7L),
      (5L, 2L), (6L, 1L), (7L, 3L), (8L, 4L)).toDF("id", "label")
    val edges = sym(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 5L -> 6L, 5L -> 7L))
    def run(rounds: Int, ckpt: Int) = GraphMetrics
      .labelPropagationTrain(nodes, "id", "label", edges, "src", "dst",
        rounds, checkpointEvery = ckpt)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val one = run(1, 2)
    val step = GraphMetrics.labelPropagationStep(
      nodes, "id", "label", edges, "src", "dst")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(one === step, "train(1) must equal a single step")
    val two = run(2, 2)
    assert(two === Map(1L -> 9L, 2L -> 5L, 3L -> 5L, 4L -> 5L,
      5L -> 2L, 6L -> 1L, 7L -> 1L, 8L -> 4L))
    assert(run(2, 1) === two && run(2, 0) === two,
      "checkpoint cadence must not change exact-integer labels")
    // old_label column carries the INITIAL label through the rounds
    val olds = GraphMetrics
      .labelPropagationTrain(nodes, "id", "label", edges, "src", "dst", 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(olds === nodes.as[(Long, Long)].collect().toMap)
  }

  test("kCorePeelRound: pendant path peels off the triangle core over two rounds") {
    // Path a(1)-b(2)-c(3) plus triangle c(3)-d(4)-e(5)-c:
    // degrees a=1 b=2 c=3 d=2 e=2. Round 1 (k=2) drops a;
    // in {b,c,d,e} node b keeps only edge b-c -> deg 1, drops in round 2;
    // the 2-core is exactly the triangle {c,d,e}.
    val edges = sym(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 3L -> 5L, 4L -> 5L))
    val all = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val r1 = GraphMetrics.kCorePeelRound(all, "id", edges, "src", "dst", 2)
    assert(r1.as[(Long, Long)].collect().toMap === Map(
      2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
    // Synchronous semantics: degrees are computed BEFORE this round's
    // victims drop, so 3 still counts its edge to the doomed 2 here.
    val r2 = GraphMetrics.kCorePeelRound(
      r1.select("id"), "id", edges, "src", "dst", 2)
    assert(r2.as[(Long, Long)].collect().toMap === Map(
      3L -> 3L, 4L -> 2L, 5L -> 2L))
    // With 2 gone the triangle settles to all-degree-2 ...
    val r3 = GraphMetrics.kCorePeelRound(
      r2.select("id"), "id", edges, "src", "dst", 2)
    assert(r3.as[(Long, Long)].collect().toMap === Map(
      3L -> 2L, 4L -> 2L, 5L -> 2L))
    // ... and a further round is the fixpoint.
    val r4 = GraphMetrics.kCorePeelRound(
      r3.select("id"), "id", edges, "src", "dst", 2)
    assert(r4.as[(Long, Long)].collect().toMap ===
      r3.as[(Long, Long)].collect().toMap)
  }

  test("subgraphDegrees reports sub-k degrees the peel then filters") {
    val edges = sym(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 3L -> 5L, 4L -> 5L))
    val alive = Seq(2L, 3L, 4L, 5L).toDF("id") // round-1 survivors
    val d = GraphMetrics.subgraphDegrees(alive, "id", edges, "src", "dst")
    assert(d.as[(Long, Long)].collect().toMap === Map(
      2L -> 1L, 3L -> 3L, 4L -> 2L, 5L -> 2L)) // 2's deg 1 visible here
  }
}
