package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.SparkTestBase

/** Vintage defense in [[Tables]]: the testdata generator has shipped
  * `events.ts` as both TIMESTAMP(NANOS) (surfaces as long under
  * `nanosAsLong`; rounds ≤ 7) and TIMESTAMP(MICROS) (round 8+). The
  * current testdata only exercises the native branch, so the nanos
  * branch would rot silently without these synthesized fixtures — and
  * the round-8 schema drift broke every events query at analysis time
  * before it was caught (PROFILE_r08 §1). */
class TablesVintageSpec extends SparkTestBase {
  import spark.implicits._

  test("long-typed (nanos-vintage) events.ts truncates to micro timestamps") {
    val dir = Files.createTempDirectory("graft_vintage_nanos").toFile
    dir.deleteOnExit()
    // 2024-01-01 00:00:00.123456789 UTC in nanos: the 789 must truncate
    val nanos = 1704067200L * 1000000000L + 123456789L
    Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")

    val got = Tables(spark, dir.getPath, "events")
    assert(got.schema("ts").dataType === TimestampType)
    val ts = got.select(col("ts").cast("long"), // epoch seconds (floor)
      unix_micros(col("ts"))).collect()(0)
    assert(ts.getLong(0) === 1704067200L)
    assert(ts.getLong(1) === 1704067200L * 1000000L + 123456L)
  }

  test("micros-vintage events.ts reads natively, identical values") {
    val dir = Files.createTempDirectory("graft_vintage_micros").toFile
    dir.deleteOnExit()
    Seq((1L, new java.sql.Timestamp(1704067200123L), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")

    val got = Tables(spark, dir.getPath, "events")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_millis(col("ts"))).collect()(0).getLong(0)
      === 1704067200123L)
  }

  test("date-vintage temporal columns normalize to timestamp at the read") {
    val dir = Files.createTempDirectory("graft_vintage_date").toFile
    dir.deleteOnExit()
    Seq((1L, 2L, "O", 10.0, java.sql.Date.valueOf("2024-03-05"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"${dir.getPath}/orders.parquet")

    val got = Tables(spark, dir.getPath, "orders")
    assert(got.schema("o_orderdate").dataType === TimestampType)
    // session TZ is UTC: midnight UTC of the date
    assert(got.select(unix_timestamp(col("o_orderdate"))).collect()(0).getLong(0)
      === java.time.LocalDate.of(2024, 3, 5)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond)
  }

  test("long-vintage detection keys off the read type, not the session conf") {
    // a long ts column NOT produced by nanosAsLong (plain BIGINT parquet)
    // takes the same truncation path — the branch predicate is the type
    val dir = Files.createTempDirectory("graft_vintage_plain").toFile
    dir.deleteOnExit()
    val nanos = 1704067200L * 1000000000L + 42000L // plausible 2024 nanos
    val df = Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(df.schema("ts").dataType === LongType)
    df.write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")
    val got = Tables(spark, dir.getPath, "events")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_micros(col("ts"))).collect()(0).getLong(0)
      === 1704067200L * 1000000L + 42L)
  }

  test("implausible long ts fails loudly instead of corrupting 1000x") {
    // epoch-MICROS shipped as plain BIGINT: under the nanos assumption
    // this would silently become ~year-1970 garbage; the sanity gate
    // must raise instead (ADVICE r08: key only on the surfaced type ->
    // guard the truncated values)
    val dir = Files.createTempDirectory("graft_vintage_bad").toFile
    dir.deleteOnExit()
    val micros = 1704067200L * 1000000L // 2024 as micros, not nanos
    Seq((1L, micros, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")
    val ex = intercept[Exception] {
      Tables(spark, dir.getPath, "events").select(col("ts")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("long-vintage sanity"))),
      s"expected the sanity-check error, got: $ex")
  }
}
