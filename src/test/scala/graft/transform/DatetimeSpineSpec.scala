package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DatetimeSpineSpec extends SparkTestBase {

  private lazy val spine = DatetimeSpine.hourly(spark, "2020-01-01", "2021-01-01")

  test("full 2020 leap year = 8784 hours (fixes etl.py:184 off-by-one)") {
    assert(spine.count() === 8784)
    // Dec 31 is present — the reference's end-exclusive bound dropped it
    assert(spine.filter(col("month") === 12 && col("day") === 31).count() === 24)
    // end is exclusive: nothing from 2021
    assert(spine.filter(col("year") === 2021).count() === 0)
  }

  test("calendar parts: ISO week + Sunday=1 weekday semantics (X4)") {
    val jan1 = spine.filter(
      col("date_hour") === to_timestamp(lit("2020-01-01 00:00:00"))).head
    assert(jan1.getLong(1) === 0) // hour
    assert(jan1.getLong(2) === 1) // day
    assert(jan1.getLong(3) === 1) // ISO week 1
    assert(jan1.getLong(4) === 1) // month
    assert(jan1.getLong(5) === 4) // 2020-01-01 is Wednesday; 1=Sunday
    assert(jan1.getLong(6) === 2020)
    assert(jan1.getLong(7) === 1) // quarter
    // ISO week edge: 2021-01-01 belongs to ISO week 53 of 2020; our
    // spine's last hour is 2020-12-31 23:00, ISO week 53
    val dec31 = spine.orderBy(col("date_hour").desc).head
    assert(dec31.getLong(3) === 53)
  }

  test("hourly grain with no gaps or duplicates") {
    assert(spine.select("date_hour").distinct().count() === 8784)
    val span = spine.agg(
      min(col("date_hour")).cast("long"),
      max(col("date_hour")).cast("long")).head
    assert((span.getLong(1) - span.getLong(0)) === (8784L - 1) * 3600)
  }
}
