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

  test("train(rounds = 1) is exactly one step") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val viaStep = PageRank.step(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaTrain = PageRank.train(edges, "u", "v", rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaTrain === viaStep)
  }

  test("two rounds match the hand-unrolled damped fixed-point arithmetic") {
    // 1 -> 2, 1 -> 3, 2 -> 3 (deg 2, 1, 0; node 3 is a sink).
    // r1: pr(1)=150000, pr(2)=575000, pr(3)=1425000 (the step fixture).
    // r2: mass(2)=floor(pr1(1)/2)=75000; mass(3)=75000+pr1(2)=650000.
    //     pr2(1)=150000; pr2(2)=150000+floor(75000*85/100)=213750;
    //     pr2(3)=150000+floor(650000*85/100)=702500.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val got = PageRank.train(edges, "u", "v", rounds = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((2L, 150000L)),
      2L -> ((1L, 213750L)),
      3L -> ((0L, 702500L))))
  }

  test("checkpoint cadence cannot change values (exact arithmetic)") {
    val edges = (1 to 300)
      .map(i => (i.toLong, ((i * 31) % 83 + 1).toLong)).toDF("u", "v")
    def run(every: Int) = PageRank.train(edges, "u", "v", rounds = 5,
      checkpointEvery = every)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val noCk = run(0)
    assert(run(1) === noCk)
    assert(run(2) === noCk)
  }

  test("every round conserves damped mass up to floor loss") {
    // total_r+1 = n*(1-d)*scale + d*(sent mass), where sent mass is
    // total over non-sink nodes minus per-node floor loss (< deg each);
    // bound: d*(total_prev - sinkMass) - n*d - ... >= within loss bound
    val edges = (1 to 200)
      .map(i => (i.toLong, ((i * 13) % 61 + 1).toLong)).toDF("u", "v")
    var prev = PageRank.train(edges, "u", "v", rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (rounds <- 2 to 4) {
      val cur = PageRank.train(edges, "u", "v", rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val n = cur.length.toLong
      val base = n * 150000L
      // mass actually sent this round from prev ranks (exact replay)
      val sent = prev.filter(_._2 > 0)
        .map { case (_, deg, pr) => (pr / deg) * deg }.sum
      val expected = base + sent * 85L / 100L
      val total = cur.map(_._3).sum
      // grouped floor (sum of per-node floors vs one global floor)
      // differs by at most the receiver count
      assert(total <= expected && total >= expected - n,
        s"round $rounds: total $total vs damped budget $expected")
      prev = cur
    }
  }
}
