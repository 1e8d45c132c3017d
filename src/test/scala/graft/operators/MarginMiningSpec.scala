package graft.operators

import graft.SparkTestBase

class MarginMiningSpec extends SparkTestBase {

  import spark.implicits._

  private def vec(deg: Double): Array[Float] = Array(
    math.cos(math.toRadians(deg)).toFloat,
    math.sin(math.toRadians(deg)).toFloat)

  private def mine(qs: Seq[(Long, Array[Float])],
      ts: Seq[(Long, Array[Float])], k: Int) =
    Similarity.marginMining(
      qs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      ts.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("margin demotes the hub target raw cosine would pick") {
    // Target 10 sits at 15° — the cosine-nearest target for EVERY
    // query (a hub). Target 11 at −16° is slightly farther from q1 by
    // raw cosine but is q1's genuine partner once both targets'
    // neighbor mass is discounted: q1's margin flips to 11 while
    // q2/q3 (30°, 33°) keep the hub they're actually close to.
    val qs = Seq(1L -> vec(0), 2L -> vec(30), 3L -> vec(33))
    val ts = Seq(10L -> vec(15), 11L -> vec(-16))
    val got = mine(qs, ts, k = 2)
    assert(got(1L)._1 === 11L)
    assert(got(2L)._1 === 10L)
    assert(got(3L)._1 === 10L)
    // hand-computed scaled margins (2k·c − Σtop2ₓ − Σtop2_y over
    // round-6 1e6-quantized cosines)
    assert(got(1L)._2 === 261940L)
    assert(got(2L)._2 === 271268L)
  }

  test("with symmetric neighbor mass, margin top-1 equals cosine top-1") {
    // Two targets mirror-placed around each query's axis: neighbor
    // sums are equal by symmetry, so the margin ordering reduces to
    // the cosine ordering.
    val qs = Seq(1L -> vec(0), 2L -> vec(90))
    val ts = Seq(10L -> vec(10), 11L -> vec(80))
    val got = mine(qs, ts, k = 1)
    assert(got(1L)._1 === 10L)
    assert(got(2L)._1 === 11L)
  }

  test("every query emits exactly one row") {
    val qs = (0L until 5L).map(i => i -> vec(i * 17.0))
    val ts = (10L until 18L).map(i => i -> vec(i * 23.0))
    val got = mine(qs, ts, k = 3)
    assert(got.keySet === qs.map(_._1).toSet)
  }
}
