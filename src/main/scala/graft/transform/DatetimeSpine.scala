package graft.transform

import java.time.{LocalDate, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated hourly datetime spine with calendar parts — the reference's
  * `dim_datetime` (etl.py:8-24,183-193; DDL create_tables.sql:46-56).
  *
  * Divergence from reference (SURVEY.md §7.5): the reference's
  * end-exclusive stop bound '2020-12-31' drops all of Dec 31
  * (etl.py:184); ours takes an exclusive end DATE so a full year is
  * `hourly(spark, "2020-01-01", "2021-01-01")` = 8,784 rows for the 2020
  * leap year.
  *
  * Scale note: `spark.range` is an embarrassingly parallel source (no
  * shuffle, no data read); calendar parts are codegen'd built-ins. A
  * century-long spine is ~877k rows — trivially distributed.
  */
object DatetimeSpine {
  def hourly(spark: SparkSession, startDate: String, endDateExclusive: String): DataFrame = {
    val start = LocalDate.parse(startDate).atStartOfDay.toEpochSecond(ZoneOffset.UTC)
    val end = LocalDate.parse(endDateExclusive).atStartOfDay.toEpochSecond(ZoneOffset.UTC)
    spark.range(start, end, 3600L)
      .select(col("id").cast("timestamp").as("date_hour"))
      .select(
        col("date_hour"),
        hour(col("date_hour")).cast("long").as("hour"),
        dayofmonth(col("date_hour")).cast("long").as("day"),
        weekofyear(col("date_hour")).cast("long").as("week"),
        month(col("date_hour")).cast("long").as("month"),
        dayofweek(col("date_hour")).cast("long").as("weekday"),
        year(col("date_hour")).cast("long").as("year"),
        quarter(col("date_hour")).cast("long").as("quarter"))
  }
}
