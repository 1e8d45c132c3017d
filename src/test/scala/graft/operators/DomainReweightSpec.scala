package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DomainReweightSpec extends SparkTestBase {

  import spark.implicits._

  private def run(rows: Seq[(String, Long)], minW: Long = 1000L,
      smoothingPct: Int = 10) =
    DomainReweight.weights(
      rows.toDF("domain", "score"), "domain", col("score"),
      minW = minW, smoothingPct = smoothingPct)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("hand-computed fixture: excess, clamp and smoothing all exact") {
    // A: scores 2e6, 4e6 (mean 3e6); B: 1e6. gmean = 7e6 div 3 =
    // 2333333; excess A = +666667, B = -1333333 (clamped to w = 1000).
    val got = run(Seq("A" -> 2000000L, "A" -> 4000000L, "B" -> 1000000L))
    assert(got("A") === (666667L, 949460L))
    assert(got("B") === (-1333333L, 50539L))
  }

  test("uniform domains get uniform weights and zero-ish excess") {
    val got = run(Seq("A" -> 5000000L, "B" -> 5000000L, "C" -> 5000000L))
    assert(got.values.forall { case (e, _) => e === 0L })
    // all equal → each alpha = (90*norm + 10*(1e6/3)) div 100, equal
    assert(got.values.map(_._2).toSet.size === 1)
  }

  test("smoothingPct=100 is the uniform distribution regardless of loss") {
    val got = run(
      Seq("A" -> 9000000L, "B" -> 1000000L), smoothingPct = 100)
    assert(got.values.map(_._2).toSet === Set(500000L))
  }

  test("alphas always sum to 1e6 up to k units of floor loss") {
    val got = run(Seq("A" -> 2000000L, "A" -> 4000000L, "B" -> 1000000L,
      "C" -> 7000000L, "D" -> 3500000L))
    val s = got.values.map(_._2).sum
    assert(s <= 1000000L && s >= 1000000L - got.size)
  }
}
