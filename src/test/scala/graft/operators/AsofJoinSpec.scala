package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks the latest right row at or before left ts") {
    import spark.implicits._
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:30:00")),
      (101L, 1L, ts("2024-01-01 09:00:00")), // before any view → null
      (102L, 2L, ts("2024-01-01 12:00:00")),
      (103L, 3L, ts("2024-01-01 12:00:00"))  // user with no views → null
    ).toDF("event_id", "user_id", "purchase_ts")
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L),
      (1L, ts("2024-01-01 10:20:00"), 11L),
      (1L, ts("2024-01-01 11:00:00"), 12L), // after the purchase → ignored
      (2L, ts("2024-01-01 12:00:00"), 20L), // exactly at ts → inclusive
      (2L, ts("2024-01-01 12:00:00"), 21L)  // same-ts tie → larger id wins
    ).toDF("user_id", "ts", "event_id")

    val got = AsofJoin.asofBackward(
      purchases, views, "user_id", "purchase_ts", "ts",
      "event_id", "event_id", "view_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got === Map(100L -> 11L, 101L -> -1L, 102L -> 21L, 103L -> -1L))
  }

  test("randomized equivalence with a driver-side brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val lefts = (1 to 400).map { i =>
      (i.toLong, (rng.nextInt(20) + 1).toLong,
        new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L))
    }
    val rights = (1 to 600).map { i =>
      ((rng.nextInt(20) + 1).toLong,
        new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L),
        (10000 + i).toLong)
    }
    val expected = lefts.map { case (id, k, lts) =>
      val m = rights
        .filter(r => r._1 == k && !r._2.after(lts))
        .sortBy(r => (r._2.getTime, r._3))
        .lastOption.map(_._3)
      id -> m.getOrElse(-1L)
    }.toMap

    val got = AsofJoin.asofBackward(
      lefts.toDF("id", "k", "lts"), rights.toDF("k", "rts", "v"),
      "k", "lts", "rts", "v", "v", "matched")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got === expected)
  }

  test("as-of join plans as one shuffle (window), not a range join") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "lts")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 5L)).toDF("k", "rts", "v")
    val plan = AsofJoin.asofBackward(l, r, "k", "lts", "rts", "v", "v", "out")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join operator:\n$plan")
    assert(plan.contains("Window"))
  }
}
