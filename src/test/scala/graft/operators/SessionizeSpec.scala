package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("30-minute gap rule splits sessions per user") {
    import spark.implicits._
    val events = Seq(
      // user 1: 3 events within gaps, then a 31-min gap → 2 sessions
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:20:00")),
      (3L, 1L, ts("2024-01-01 10:45:00")),
      (4L, 1L, ts("2024-01-01 11:16:00")),
      // user 2: single event → one 1-event session
      (5L, 2L, ts("2024-01-01 09:00:00")),
      // user 1 boundary: exactly 30:00 gap stays in-session
      (6L, 1L, ts("2024-01-01 11:46:00"))
    ).toDF("event_id", "user_id", "ts")

    val got = Sessionize.sessions(events, "ts", gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))

    assert(got.toSeq === Seq(
      (1L, 1L, "2024-01-01 10:00:00.0", 3L, 2700L),
      (1L, 2L, "2024-01-01 11:16:00.0", 2L, 1800L),
      (2L, 1L, "2024-01-01 09:00:00.0", 1L, 0L)))
  }

  test("sub-second timestamps use whole-second gap semantics (DuckDB parity)") {
    import spark.implicits._
    // 10:00:00.9 → 10:30:00.1 is 1799.2s wall but 1800 whole-second
    // boundaries (floor semantics) → same session (gap not > 1800)
    val events = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00.9")),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:30:00.1"))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, "ts", 30).collect()
    assert(got.length === 1)
    assert(got.head.getLong(4) === 2L)
  }
}
