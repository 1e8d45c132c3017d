package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference warehouse's canned analytical questions
  * (README.md:56-63) as library functions over the staged star schema —
  * the queries a Redshift user of the reference runs today, answered by
  * the engine's own tables. Exercised in AnalyticsSpec against the
  * fixture-built pipeline output.
  *
  * All are partial+final hash aggregates over the fact table with
  * broadcast-joined dims — at 100 TB the only shuffle is the final
  * per-group combine.
  */
object Analytics {

  /** "Total trips monthly and yearly" (README.md:59). */
  def monthlyTripCounts(tripFact: DataFrame): DataFrame =
    tripFact
      .groupBy(
        year(col("start_time")).as("year"),
        month(col("start_time")).as("month"))
      .agg(count(lit(1)).as("n_trips"))

  /** "Trips per gender" (README.md:60; 0=unknown, 1=male, 2=female). */
  def genderSplit(tripFact: DataFrame): DataFrame =
    tripFact.groupBy(col("gender")).agg(count(lit(1)).as("n_trips"))

  /** "Total ride hours per year" (README.md:61). */
  def rideHoursPerYear(tripFact: DataFrame): DataFrame =
    tripFact
      .groupBy(year(col("start_time")).as("year"))
      .agg((sum(col("duration")) / 3600.0).as("ride_hours"))

  /** "Highest/lowest trip month" (README.md:62). */
  def topMonth(tripFact: DataFrame): DataFrame =
    monthlyTripCounts(tripFact)
      .orderBy(col("n_trips").desc, col("year"), col("month"))
      .limit(1)

  /** "How weather affects user behavior" (README.md:63): trips per
    * weather type via the date bridge. */
  def tripsByWeatherType(
      tripFact: DataFrame,
      bridge: DataFrame,
      weatherType: DataFrame): DataFrame =
    tripFact
      .join(bridge, to_date(col("start_time")) === to_date(col("date_time")))
      .join(broadcast(weatherType), "weather_type_id")
      .groupBy(col("weather_type_id"), col("description"))
      .agg(count(lit(1)).as("n_trips"))

  /** Busiest start stations with their names. */
  def tripsPerStation(tripFact: DataFrame, dimStation: DataFrame): DataFrame =
    tripFact
      .join(broadcast(dimStation),
        col("start_station_id") === col("station_id"))
      .groupBy(col("station_id"), col("name"))
      .agg(count(lit(1)).as("n_trips"))
}
