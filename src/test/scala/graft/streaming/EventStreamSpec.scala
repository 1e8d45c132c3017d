package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The batch transforms run unchanged under Structured Streaming —
  * exercised with MemoryStream sources and in-memory sinks. */
class EventStreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumblingAgg is identical in batch and streaming (watermarked)") {
    import spark.implicits._
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0),
      (ts("2024-01-01 11:10:00"), "click", 4.0))

    val batch = EventStream.tumblingAgg(
      rows.toDF("ts", "event_type", "value"), "ts", "1 hour")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = EventStream.streamingTumblingAgg(
      mem.toDF().toDF("ts", "event_type", "value"), "ts", "1 hour", "10 minutes")
    val q = stream.writeStream.format("memory")
      .queryName("tumbling_test").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // push the watermark past every window end so append emits them
    mem.addData((ts("2024-01-01 13:00:00"), "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumbling_test")
      .filter(col("event_type") =!= "late")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.toSeq === Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 4.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 3.0)))
  }

  test("lateAccountingBatch ≡ real watermarked stream drops, including the window-end==watermark boundary") {
    import spark.implicits._
    // 10s windows, 5s delay. Batch maxima publish watermarks 7 and 20;
    // batch 2 then carries: a row for a long-closed window (00:08, end
    // 10 <= 20), THE boundary row (00:15, end 20 == wm 20), and a row
    // late in event time but in a still-open window (00:21, end 30).
    // Batch 1's 00:05 is raw-late vs wm 7 but its window end 10 > 7 —
    // admitted: the rule is state eviction, not raw ts-lateness.
    val batches = Seq(
      Seq("00:00", "00:07", "00:12"),
      Seq("00:05", "00:13", "00:25"),
      Seq("00:08", "00:15", "00:21", "00:30"))
      .map(_.map(s => ts(s"2024-01-01 00:$s")))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = EventStream.streamingTumblingAgg(
      mem.toDF().toDF("ts", "event_type", "value"), "ts", "10 seconds",
      "5 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("late_acct_test").outputMode("append").start()
    batches.foreach { b =>
      mem.addData(b.map(t => (t, "e", 0.0)): _*)
      q.processAllAvailable()
    }
    mem.addData((ts("2024-01-01 01:00:00"), "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("late_acct_test")
      .filter(col("event_type") === "e")
      .select(col("window_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap

    val twin = EventStream.lateAccountingBatch(
      batches.zipWithIndex
        .flatMap { case (b, i) => b.map(t => (t, i.toLong)) }
        .toDF("ts", "b"),
      "ts", "b", delayMs = 5000L, width = "10 seconds")
      .select(col("window_start").cast("string"), col("n_admitted"),
        col("n_late"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    assert(twin === Map(
      "2024-01-01 00:00:00" -> (3L, 1L), // 00:08 late (end 10 <= 20)
      "2024-01-01 00:00:10" -> (2L, 1L), // 00:15 late (end 20 == wm 20)
      "2024-01-01 00:00:20" -> (2L, 0L), // 00:21 admitted (end 30 > 20)
      "2024-01-01 00:00:30" -> (1L, 0L)))
    assert(streamed === twin.view.mapValues(_._1).toMap,
      "real stream admission diverged from the batch twin")
  }

  test("file-source streaming: readStream over the events parquet matches batch") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = graft.sources.Tables(spark, sfDir, "events")
    val expected = EventStream.tumblingAgg(batchEvents, "ts", "1 hour")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet

    // same source as a file stream (file sources need a directory):
    // schema from the batch reader, nanos→micros applied identically
    val dir = java.nio.file.Paths.get("target/stream_src")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val rawStream = spark.readStream
      .schema(batchSchema)
      .parquet(dir.toString)
    val raw =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        rawStream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else rawStream
    val q = EventStream.tumblingAgg(raw, "ts", "1 hour")
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("file_stream_test")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
  }

  test("streamingDedup keeps one row per key, matching batch dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), "h1", 1.0),
      (ts("2024-01-01 10:01:00"), "h1", 2.0), // dup key within watermark
      (ts("2024-01-01 10:02:00"), "h2", 3.0),
      (ts("2024-01-01 10:03:00"), "h2", 4.0), // dup
      (ts("2024-01-01 10:04:00"), "h3", 5.0))

    val mem = MemoryStream[(Timestamp, String, Double)]
    val deduped = EventStream.streamingDedup(
      mem.toDF().toDF("ts", "text_hash", "value"),
      "ts", "10 minutes", Seq("text_hash"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_test").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_test")
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    // one row per key, and it is the FIRST arrival that survives
    assert(got.map(_._1).sorted.toSeq === Seq("h1", "h2", "h3"))
    assert(got.toMap === Map("h1" -> 1.0, "h2" -> 3.0, "h3" -> 5.0))
    // agrees with the batch dedup keyed the same way
    val batchKeys = rows.toDF("ts", "text_hash", "value")
      .dropDuplicates("text_hash").collect().map(_.getString(1)).sorted.toSeq
    assert(got.map(_._1).sorted.toSeq === batchKeys)
  }

  test("streamingQuotaAdmit enforces per-source quotas across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val mem = MemoryStream[EventStream.DocArrival]
      val admitted = EventStream.streamingQuotaAdmit(spark, mem.toDS(), 4L)
      val q = admitted.writeStream.format("memory")
        .queryName("quota_test").outputMode("append").start()
      // batch 1: 3 srcA + 2 srcB → all srcB admitted, 3 of srcA
      mem.addData(
        EventStream.DocArrival(1, "srcA"), EventStream.DocArrival(2, "srcA"),
        EventStream.DocArrival(3, "srcA"), EventStream.DocArrival(4, "srcB"),
        EventStream.DocArrival(5, "srcB"))
      q.processAllAvailable()
      // batch 2: 3 more srcA → only ONE admitted (3+1=4 fills the
      // quota), proving the counter survived the micro-batch boundary
      mem.addData(
        EventStream.DocArrival(6, "srcA"), EventStream.DocArrival(7, "srcA"),
        EventStream.DocArrival(8, "srcA"))
      q.processAllAvailable()
      q.stop()

      val bySource = spark.table("quota_test").collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      assert(bySource("srcB") === Set(4L, 5L))
      assert(bySource("srcA").size === 4, s"quota breached: ${bySource("srcA")}")
      assert(Set(1L, 2L, 3L).subsetOf(bySource("srcA")),
        "batch-1 arrivals must be admitted before batch-2 overflow")
    }
  }

  test("streamingSessions emits a session after the gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SessionEvent]
    val sessions = EventStream.streamingSessions(
      spark, mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_test").outputMode("append").start()

    mem.addData(
      EventStream.SessionEvent(1L, ts("2024-01-01 10:00:00")),
      EventStream.SessionEvent(1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // second batch: an event far past the gap → closes the first session
    mem.addData(EventStream.SessionEvent(1L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_test")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L)))
  }

  test("intervalJoin: stream-stream time-bounded join matches batch") {
    import spark.implicits._
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), "c1"),
      (1L, ts("2024-01-01 11:00:00"), "c2"),
      (2L, ts("2024-01-01 10:30:00"), "c3"))
    val buys = Seq(
      (1L, ts("2024-01-01 10:20:00"), "b1"), // within 30m of c1
      (1L, ts("2024-01-01 11:45:00"), "b2"), // outside 30m of c2
      (2L, ts("2024-01-01 10:31:00"), "b3")) // within 30m of c3

    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("click_id", "buy_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet

    val batch = shape(EventStream.intervalJoin(
      clicks.toDF("user_id", "click_ts", "click_id"),
      buys.toDF("user_id", "buy_ts", "buy_id"),
      "user_id", "click_ts", "buy_ts", "30 minutes"))
    assert(batch === Set(("c1", "b1"), ("c3", "b3")))

    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, String)]
    val memR = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.streamingIntervalJoin(
      memL.toDF().toDF("user_id", "click_ts", "click_id"),
      memR.toDF().toDF("user_id", "buy_ts", "buy_id"),
      "user_id", "click_ts", "buy_ts", "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("ij_test")
      .outputMode("append").start()
    memL.addData(clicks: _*)
    memR.addData(buys: _*)
    q.processAllAvailable()
    q.stop()
    assert(shape(spark.table("ij_test")) === batch)
  }

  test("intervalJoinOuter: unmatched left rows emit null-padded, stream ≡ batch") {
    import spark.implicits._
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), "c1"), // matched by b1
      (1L, ts("2024-01-01 11:00:00"), "c2"), // b2 is outside 30m → null
      (3L, ts("2024-01-01 10:30:00"), "c4")) // user never buys → null
    val buys = Seq(
      (1L, ts("2024-01-01 10:20:00"), "b1"),
      (1L, ts("2024-01-01 11:45:00"), "b2"))

    def shape(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("click_id") =!= "flush")
        .select("click_id", "buy_id").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet

    val expected = Set(
      ("c1", Some("b1")), ("c2", None), ("c4", None))
    assert(shape(EventStream.intervalJoinOuter(
      clicks.toDF("user_id", "click_ts", "click_id"),
      buys.toDF("user_id", "buy_ts", "buy_id"),
      "user_id", "click_ts", "buy_ts", "30 minutes")) === expected)

    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, String)]
    val memR = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.streamingIntervalJoinOuter(
      memL.toDF().toDF("user_id", "click_ts", "click_id"),
      memR.toDF().toDF("user_id", "buy_ts", "buy_id"),
      "user_id", "click_ts", "buy_ts", "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("ijo_test")
      .outputMode("append").start()
    memL.addData(clicks: _*)
    memR.addData(buys: _*)
    q.processAllAvailable()
    // outer rows only emit once the watermark proves no match can
    // arrive — advance it past every click's 30m bound with a flush
    memL.addData((99L, ts("2024-01-02 00:00:00"), "flush"))
    memR.addData((99L, ts("2024-01-02 00:00:00"), "flush"))
    q.processAllAvailable()
    q.stop()
    assert(shape(spark.table("ijo_test")) === expected,
      "watermarked outer join must emit the null-padded rows after eviction")
  }

  test("streamingGaps ≡ gapRows, incl. batch boundaries and within-batch disorder") {
    import spark.implicits._
    // user 1 spans all three batches (boundary gaps); user 2's batch-2
    // rows arrive OUT of event-time order within the batch; user 3 has
    // a single event (no gaps)
    val batches = Seq(
      Seq((1L, ts("2024-01-01 10:00:00"), 1L),
        (2L, ts("2024-01-01 10:00:30"), 2L)),
      Seq((1L, ts("2024-01-01 10:01:00"), 3L),
        (2L, ts("2024-01-01 10:03:00"), 5L), // disorder: later event first
        (2L, ts("2024-01-01 10:02:00"), 4L),
        (3L, ts("2024-01-01 10:00:10"), 6L)),
      Seq((1L, ts("2024-01-01 10:05:00"), 7L)))

    val whole = batches.flatten.toDF("user_id", "ts", "event_id")
    val expected = EventStream.gapRows(whole)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(expected === Seq((1L, 60L), (1L, 240L), (2L, 90L), (2L, 60L)).sorted)

    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val mem = MemoryStream[(Long, Timestamp, Long)]
      val q = EventStream.streamingGaps(spark,
        mem.toDF().toDF("user_id", "ts", "event_id")
          .as[EventStream.StampedEvent])
        .writeStream.format("memory").queryName("gaps_test")
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }
    val streamed = spark.table("gaps_test")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(streamed === expected,
      "stream gap multiset diverged from the batch spelling")

    // the fold spelling agrees with the whole-feed report
    val foldRep = EventStream.regularityBatchFold(
      batches.map(_.toDF("user_id", "ts", "event_id")), minGaps = 1L)
      .collect().map(_.toSeq).toSet
    val wholeRep = EventStream.regularityReport(
      whole, EventStream.gapRows(whole), minGaps = 1L)
      .collect().map(_.toSeq).toSet
    assert(foldRep === wholeRep)
  }

  test("file-backed e2e: JSONL streams → interval join → upsert sink ≡ batch") {
    import spark.implicits._
    // the full production wiring on the real file-source API (not
    // MemoryStream): two JSONL feeds on disk, watermarked stream-stream
    // interval join, foreachBatch exactly-once upsert — final table must
    // equal the batch intervalJoin of the same data
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), "c1"),
      (1L, ts("2024-01-01 11:00:00"), "c2"),
      (2L, ts("2024-01-01 10:30:00"), "c3"))
    val buys = Seq(
      (1L, ts("2024-01-01 10:20:00"), "b1"), // within 30m of c1
      (1L, ts("2024-01-01 11:45:00"), "b2"), // outside 30m of c2
      (2L, ts("2024-01-01 10:31:00"), "b3")) // within 30m of c3
    val clicksDf = clicks.toDF("user_id", "click_ts", "click_id")
    val buysDf = buys.toDF("user_id", "buy_ts", "buy_id")

    val expected = EventStream.intervalJoin(
      clicksDf, buysDf, "user_id", "click_ts", "buy_ts", "30 minutes")
      .select("click_id", "buy_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(expected === Set(("c1", "b1"), ("c3", "b3")))

    // two JSONL files per feed + maxFilesPerTrigger=1 → the join and
    // the sink really see MULTIPLE micro-batches
    val root = java.nio.file.Paths.get("target/stream_e2e")
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
    def feed(dir: String, df: org.apache.spark.sql.DataFrame): String = {
      val p = root.resolve(dir).toString
      df.limit(1).coalesce(1).write.mode("append").json(p)
      df.except(df.limit(1)).coalesce(1).write.mode("append").json(p)
      p
    }
    val clickDir = feed("clicks", clicksDf)
    val buyDir = feed("buys", buysDf)
    def readFeed(dir: String, schemaOf: org.apache.spark.sql.DataFrame) =
      spark.readStream.schema(schemaOf.schema)
        .option("maxFilesPerTrigger", 1).json(dir)

    graft.warehouse.Warehouse.createDatabase(spark, "graft_test")
    graft.warehouse.Warehouse.dropTable(spark, "graft_test.ij_sink")
    graft.warehouse.Warehouse.dropTable(spark, "graft_test.ij_sink__shadow")
    val q = EventStream.streamingIntervalJoin(
      readFeed(clickDir, clicksDf), readFeed(buyDir, buysDf),
      "user_id", "click_ts", "buy_ts", "30 minutes", "10 minutes")
      .writeStream
      .foreachBatch(EventStream.upsertBatch(
        "graft_test.ij_sink", Seq("click_id", "buy_id"), Seq("click_ts")) _)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("graft_test.ij_sink")
      .select("click_id", "buy_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected)
  }

  test("upsertBatch: replayed micro-batches merge idempotently (exactly-once sink)") {
    import spark.implicits._
    graft.warehouse.Warehouse.createDatabase(spark, "graft_test")
    graft.warehouse.Warehouse.dropTable(spark, "graft_test.upsert_sink")
    val sink = EventStream.upsertBatch(
      "graft_test.upsert_sink", Seq("event_id"), Seq("ts")) _

    val b0 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, ts("2024-01-01 10:01:00"), 20.0)).toDF("event_id", "ts", "value")
    sink(b0, 0L)
    // replay of batch 0 (failure between write and offset commit)
    sink(b0, 0L)
    // batch 1 updates key 2 and adds key 3
    val b1 = Seq(
      (2L, ts("2024-01-01 10:05:00"), 25.0),
      (3L, ts("2024-01-01 10:06:00"), 30.0)).toDF("event_id", "ts", "value")
    sink(b1, 1L)
    sink(b1, 1L) // and its replay

    val got = spark.table("graft_test.upsert_sink")
      .select("event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 10.0), (2L, 25.0), (3L, 30.0)))

    // crash between DROP and RENAME leaves the state only in the
    // shadow — the next invocation must complete the swap, then merge
    spark.sql("ALTER TABLE graft_test.upsert_sink RENAME TO graft_test.upsert_sink__shadow")
    val b2 = Seq((4L, ts("2024-01-01 10:07:00"), 40.0))
      .toDF("event_id", "ts", "value")
    sink(b2, 2L)
    val got2 = spark.table("graft_test.upsert_sink")
      .select("event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got2 === Set((1L, 10.0), (2L, 25.0), (3L, 30.0), (4L, 40.0)))

    // wired end-to-end: the same body runs under writeStream.foreachBatch
    graft.warehouse.Warehouse.dropTable(spark, "graft_test.upsert_sink")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("event_id", "ts", "value")
      .writeStream.foreachBatch(sink).outputMode("update").start()
    mem.addData((1L, ts("2024-01-01 10:00:00"), 10.0))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:09:00"), 11.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_test.upsert_sink")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(streamed.toSeq === Seq((1L, 11.0)))
  }

  test("enrich: stream-static broadcast join matches batch, keeps unmatched") {
    import spark.implicits._
    val dim = Seq(("click", "engagement"), ("view", "passive"))
      .toDF("event_type", "category")
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1L),
      (ts("2024-01-01 10:06:00"), "view", 2L),
      (ts("2024-01-01 10:07:00"), "purchase", 3L)) // not in dim → null

    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "event_type", "category")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)))).sortBy(_._1).toSeq

    val batchDf = rows.toDF("ts", "event_type", "event_id")
    val expected = shape(EventStream.enrich(batchDf, dim, Seq("event_type")))
    // no event lost to a missing dim row
    assert(expected.map(_._3) === Seq(Some("engagement"), Some("passive"), None))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val q = EventStream.enrich(
      mem.toDF().toDF("ts", "event_type", "event_id"), dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    assert(shape(spark.table("enrich_test")) === expected)
  }

  test("observe telemetry rides micro-batches: per-batch metrics sum to the batch gate") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val ms = graft.quality.QualityChecks.qualityMetrics("k", "v")
    val q = mem.toDF().toDF("k", "v")
      .observe("gate", ms.head, ms.tail: _*)
      .writeStream.format("memory").queryName("observe_test")
      .outputMode("append").start()
    mem.addData((1L, 1.5), (2L, 2.5))
    q.processAllAvailable()
    mem.addData((3L, 4.0))
    q.processAllAvailable()
    q.stop()
    val perBatch = q.recentProgress.toSeq
      .flatMap(p => p.observedMetrics.asScala.get("gate"))
      .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nonnull_key"),
        r.getAs[Double]("measure_sum")))
      .filter(_._1 > 0) // empty no-data batches report zero rows
    assert(perBatch.length === 2, s"one metrics row per data batch: $perBatch")
    assert(perBatch.map(_._1).sum === 3L)
    assert(perBatch.map(_._2).sum === 3L)
    assert(perBatch.map(_._3).sum === 8.0)
    // first batch alone — telemetry is genuinely per micro-batch
    assert(perBatch.head === ((2L, 2L, 4.0)))
  }

  test("streamingSessions ≡ sessionsBatch once the watermark passes every event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // multi-user, multi-session corpus with a session SPLIT ACROSS the
    // micro-batch boundary (u2's 11:00/11:20 run) so the state carry is
    // exercised, not just the in-batch fold
    val batch1 = Seq(
      EventStream.SessionEvent(1L, ts("2024-01-01 10:00:00")),
      EventStream.SessionEvent(1L, ts("2024-01-01 10:10:00")),
      EventStream.SessionEvent(2L, ts("2024-01-01 10:05:00")),
      EventStream.SessionEvent(3L, ts("2024-01-01 09:00:00")),
      EventStream.SessionEvent(2L, ts("2024-01-01 11:00:00")))
    val batch2 = Seq(
      EventStream.SessionEvent(2L, ts("2024-01-01 11:20:00")),
      EventStream.SessionEvent(1L, ts("2024-01-01 12:00:00")),
      EventStream.SessionEvent(1L, ts("2024-01-01 12:05:00")))
    val real = batch1 ++ batch2

    val mem = MemoryStream[EventStream.SessionEvent]
    val q = EventStream.streamingSessions(spark, mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    // two sentinel batches for user 999: the first advances the
    // watermark past every real tail session's end+gap, the second
    // triggers the batch in which those event-time timeouts fire
    mem.addData(EventStream.SessionEvent(999L, ts("2024-01-01 18:00:00")))
    q.processAllAvailable()
    mem.addData(EventStream.SessionEvent(999L, ts("2024-01-01 23:00:00")))
    q.processAllAvailable()
    q.stop()

    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    val streamed = shape(spark.table("sess_parity")
      .filter(col("user_id") =!= 999L).collect())
    val batch = shape(
      EventStream.sessionsBatch(spark, real.toDS(), gapMinutes = 30)
        .toDF().collect())
    assert(streamed === batch)
    assert(batch.size === 5, s"expected 5 sessions, got $batch") // 2+2+1
  }

  test("streamingQuotaAdmit ≡ quotaAdmitBatch under doc_id arrival order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc_id-ordered arrivals, quota boundary crossing the micro-batch
    // boundary for srcA (3 then 3 more against quota 4)
    val batch1 = (1L to 3L).map(EventStream.DocArrival(_, "srcA")) ++
      (4L to 5L).map(EventStream.DocArrival(_, "srcB"))
    val batch2 = (6L to 8L).map(EventStream.DocArrival(_, "srcA")) ++
      (9L to 14L).map(EventStream.DocArrival(_, "srcB"))
    withRocksDBStateStore {
      val mem = MemoryStream[EventStream.DocArrival]
      val q = EventStream.streamingQuotaAdmit(spark, mem.toDS(), 4L)
        .writeStream.format("memory").queryName("quota_parity")
        .outputMode("append").start()
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()
    }
    val streamed = spark.table("quota_parity").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = EventStream.quotaAdmitBatch(
      (batch1 ++ batch2).toDF("doc_id", "source"), 4L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    // srcA admits 1,2,3 then 6 (4th); srcB admits 4,5 then 9,10
    assert(batch === Set(1L, 2L, 3L, 6L).map((_, "srcA")) ++
      Set(4L, 5L, 9L, 10L).map((_, "srcB")))
  }

  test("streamingCms across micro-batches ≡ batch CMS, bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (shards, depth, width) = (4, 4, 256)
    // skewed token stream split across 3 micro-batches at arbitrary
    // boundaries — CMS cells are plain counts, so boundaries must not
    // matter at all
    val words = Seq.tabulate(300)(i => s"w${i % 17}") ++
      Seq.fill(50)("hot") ++ Seq.tabulate(40)(i => s"rare$i")
    val (b1, rest) = words.splitAt(97)
    val (b2, b3) = rest.splitAt(121)
    def hashed(df: org.apache.spark.sql.DataFrame) =
      df.select(
        xxhash64(col("value")).bitwiseAND(lit(0x7fffffffL)).as("graft__h"))
    val mem = MemoryStream[String]
    val q = EventStream
      .streamingCms(hashed(mem.toDF()), "graft__h", shards, depth, width)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // final snapshot: element-wise-sum the shard sketches into the
    // global sketch (every CMS cell is a count — merge is exact)
    val shardArrays = spark.table("cms_stream").collect()
      .map(_.getAs[scala.collection.Seq[Long]]("cms"))
    assert(shardArrays.length === shards)
    val merged = shardArrays.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    val batchArray = hashed(words.toDF())
      .agg(expr(s"graft_cms(graft__h, $depth, $width)").as("cms"))
      .collect().head.getAs[scala.collection.Seq[Long]]("cms")
    assert(merged === batchArray)
    // and the merged sketch answers point estimates with CMS guarantees
    // (estimate >= true count) for the hot key
    val est = words.toDF().distinct()
      .crossJoin(broadcast(words.toDF("w2").agg(
        expr(s"graft_cms(xxhash64(w2) & ${0x7fffffffL}L, $depth, $width)")
          .as("graft__cms"))))
      .select(col("value"),
        graft.functions.SketchAggregates.cmsEstimate(
          col("graft__cms"),
          xxhash64(col("value")).bitwiseAND(lit(0x7fffffffL)),
          depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 50L)
  }

  test("streamingFunnel final snapshots equal funnelBatch on the same feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long): Timestamp = new Timestamp(s * 1000L)
    // user 1 converts; user 2 views only; user 3's purchase PRECEDES
    // any view (must not count); user 4's batch-2 purchase converts
    // against the batch-1 view (state crosses the boundary). Batch 1
    // is deliberately shuffled within itself — the processor folds in
    // event-time order.
    val batch1 = Seq(
      EventStream.FunnelEvent(1L, ts(100), "purchase"), // after view below
      EventStream.FunnelEvent(1L, ts(50), "view"),
      EventStream.FunnelEvent(2L, ts(10), "view"),
      EventStream.FunnelEvent(3L, ts(20), "purchase"),
      EventStream.FunnelEvent(4L, ts(40), "view"),
      // user 5: purchase ARRIVES before its equal-ts view — the batch
      // twin counts ts >= first_view, so the stream's fold must break
      // the timestamp tie view-first (a stable ts-only sort would drop
      // the purchase and break parity)
      EventStream.FunnelEvent(5L, ts(80), "purchase"),
      EventStream.FunnelEvent(5L, ts(80), "view"))
    val batch2 = Seq(
      EventStream.FunnelEvent(3L, ts(30), "view"),
      EventStream.FunnelEvent(4L, ts(60), "purchase"),
      EventStream.FunnelEvent(1L, ts(70), "purchase")) // earlier valid conv
    withRocksDBStateStore {
      val mem = MemoryStream[EventStream.FunnelEvent]
      val out = EventStream.streamingFunnel(spark, mem.toDS())
      val q = out.writeStream.format("memory")
        .queryName("funnel_test").outputMode("append").start()
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()
      // last emitted snapshot per user (the changelog read)
      val snaps = spark.table("funnel_test").collect().zipWithIndex
        .groupBy(_._1.getLong(0)).view
        .mapValues { rs =>
          val r = rs.maxBy(_._2)._1
          (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)))
        }.toMap
      val batch = EventStream.funnelBatch(
        (batch1 ++ batch2).toDF("user_id", "ts", "event_type"))
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2))))).toMap
      assert(snaps === batch)
      assert(batch(1L)._2 === Some(ts(70)),
        "the earlier batch-2 purchase must supersede the batch-1 conversion")
      assert(batch(3L)._2 === None,
        "a purchase before any view must not convert")
      assert(batch(5L)._2 === Some(ts(80)),
        "an equal-ts purchase must convert regardless of arrival order")
    }
  }
}
