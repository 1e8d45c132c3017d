package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.pipeline.BikesharePipeline

/** The canned README-question pack over fixture-built star tables. */
class AnalyticsSpec extends SparkTestBase {

  private lazy val tables: Map[String, DataFrame] = BikesharePipeline.build(
    spark, fixture("trips.csv"), fixture("weather.csv"))

  test("monthly trip counts and top month") {
    val monthly = Analytics.monthlyTripCounts(tables("trip_fact"))
      .orderBy("year", "month")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(monthly.toSeq ===
      Seq((2020, 1, 3L), (2020, 2, 1L), (2020, 6, 1L), (2020, 12, 1L)))
    val top = Analytics.topMonth(tables("trip_fact")).head
    assert((top.getInt(0), top.getInt(1), top.getLong(2)) === ((2020, 1, 3L)))
  }

  test("gender split covers all three codes") {
    val split = Analytics.genderSplit(tables("trip_fact"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // kept trips: genders 2,1,1,2,2,1 → 3 male(1), 3 female(2)
    assert(split === Map(1 -> 3L, 2 -> 3L))
  }

  test("ride hours per year") {
    val hours = Analytics.rideHoursPerYear(tables("trip_fact")).head
    // durations 600+300+450+1800+3600+200 = 6950 s
    assert(hours.getInt(0) === 2020)
    assert(math.abs(hours.getDouble(1) - 6950.0 / 3600.0) < 1e-12)
  }

  test("weather correlation joins facts through the bridge") {
    val byWeather = Analytics.tripsByWeatherType(
      tables("trip_fact"), tables("date_with_weather_type"),
      tables("weather_type"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // WT 1 covers trip dates 01-01, 01-02, 12-31 → 3 trips
    assert(byWeather(1) === 3L)
    // WT 3 covers 01-02 and 06-15 → 2 trips
    assert(byWeather(3) === 2L)
  }

  test("busiest stations resolve names") {
    val per = Analytics.tripsPerStation(
      tables("trip_fact"), tables("dim_station"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    // start stations of kept trips: 101×2, 102×2, 103, 104
    assert(per === Map(101 -> 2L, 102 -> 2L, 103 -> 1L, 104 -> 1L))
  }
}
