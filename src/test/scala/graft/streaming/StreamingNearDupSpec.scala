package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.StreamingNearDup.DocText

class StreamingNearDupSpec extends SparkTestBase {

  private val base = (1 to 60).map(i => s"w$i").mkString(" ")
  private val nearDup = (1 to 59).map(i => s"w$i").mkString(" ") + " w99"
  private val unrelated = (100 to 160).map(i => s"v$i").mkString(" ")

  test("graft_minhash_sig generates compilable codegen (no interpreter fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = spark.range(1, 3)
        .selectExpr("array(concat('a', id), 'b') AS sh")
        .selectExpr("graft_minhash_sig(sh, 8) AS sig")
        .collect().map(_.getSeq[Long](0))
      assert(got.forall(_.length === 8))
      assert(got(0) !== got(1), "different shingle sets, different minima")
      // empty array → untouched Long.MaxValue minima (callers filter
      // empty shingle sets; the expression itself must stay total)
      val empty = spark
        .sql("SELECT graft_minhash_sig(cast(array() as array<string>), 4) AS s")
        .collect()(0).getSeq[Long](0)
      assert(empty === Seq.fill(4)(Long.MaxValue))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("graft_minhash_band_mix generates compilable codegen (no interpreter fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = spark.range(1, 3)
        .selectExpr("array(concat('a', id), 'b') AS sh")
        .selectExpr("graft_minhash_band_mix(graft_minhash_sig(sh, 8), 4) AS bh")
        .collect().map(_.getSeq[Long](0))
      assert(got.forall(_.length === 4))
      assert(got(0) !== got(1), "different signatures, different band hashes")
      // non-divisible band count must fail loudly, not mis-slice
      val err = intercept[Exception] {
        spark.sql("SELECT graft_minhash_band_mix(array(1L, 2L, 3L), 2)").collect()
      }
      assert(err.getMessage.contains("divide"))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("per-row codegen'd signature is bit-identical to the batch aggregate sketch") {
    import spark.implicits._
    val docs = Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)
      .toDF("doc_id", "text")
    val perRow = StreamingNearDup.signatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batch = docs
      .select(col("doc_id"),
        explode(graft.operators.TextOps.shinglesFromTokens(
          graft.operators.TextOps.tokens(col("text")), 3)).as("s"))
      .withColumn("hb", xxhash64(col("s")))
      .groupBy(col("doc_id"))
      .agg(expr("graft_minhash_bands(hb, 64, 16)").as("sk"))
      .select(col("doc_id"), col("sk.sig").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(perRow.keySet === batch.keySet)
    perRow.keys.foreach(k => assert(perRow(k) === batch(k), s"doc $k"))
  }

  test("band keys: near-dups share buckets, disjoint docs never do") {
    import spark.implicits._
    val docs = Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)
      .toDF("doc_id", "text")
    val byBucket = StreamingNearDup.bandKeys(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBucket.values.exists(s => s == Set(1L, 2L)),
      "planted near-dups must collide in some band")
    assert(!byBucket.values.exists(s => s.contains(3L) && s.size > 1),
      "the unrelated doc must never share a bucket")
  }

  test("streaming: candidate pair found across micro-batch boundary, state capped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val mem = MemoryStream[DocText]
      val pairs = StreamingNearDup.streamingCandidatePairs(mem.toDS())
      val q = pairs.writeStream.format("memory")
        .queryName("neardup_test").outputMode("append").start()
      // batch 1: the base doc and an unrelated doc — no pairs yet
      mem.addData(DocText(1L, base), DocText(3L, unrelated))
      q.processAllAvailable()
      assert(spark.table("neardup_test").count() === 0L)
      // batch 2: the near-dup arrives LATER — the bucket memory must
      // still pair it with doc 1 from batch 1
      mem.addData(DocText(2L, nearDup))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("neardup_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)),
        s"expected exactly the planted cross-batch pair, got $got")
    }
  }

  test("file-backed e2e: JSONL doc feed → online near-dup, dup arrives batches later") {
    import spark.implicits._
    // the production wiring on the real file-source API: a JSONL
    // landing dir consumed one file per trigger, so the near-dup and
    // its original genuinely cross micro-batch (and file) boundaries
    val root = java.nio.file.Paths.get("target/neardup_e2e")
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
    val dir = root.toString
    Seq(DocText(1L, base), DocText(3L, unrelated)).toDF()
      .coalesce(1).write.mode("append").json(dir)
    Seq(DocText(2L, nearDup)).toDF()
      .coalesce(1).write.mode("append").json(dir)
    withRocksDBStateStore {
      val feed = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1).json(dir)
        .as[DocText]
      val q = StreamingNearDup.streamingCandidatePairs(feed)
        .writeStream.format("memory")
        .queryName("neardup_e2e").outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val got = spark.table("neardup_e2e").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)),
        s"expected the cross-file planted pair, got $got")
    }
  }

  test("bucket memory survives a checkpointed query RESTART, not just a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stronger than the cross-batch test: the first query is STOPPED
    // after committing its batch, and a second query resumes from the
    // RocksDB checkpoint — the near-dup must still pair against a doc
    // the previous incarnation admitted (executor-restart durability,
    // the property an ingest gate actually needs)
    val ckpt = "target/neardup_restart_ckpt"
    val out = "target/neardup_restart_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    withRocksDBStateStore {
      val mem = MemoryStream[DocText]
      // the memory sink can't recover from a checkpoint; foreachBatch
      // (the production sink shape here anyway) can
      def start() = StreamingNearDup.streamingCandidatePairs(mem.toDS())
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[StreamingNearDup.CandidatePair],
           _: Long) => batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val q1 = start()
      mem.addData(DocText(1L, base), DocText(3L, unrelated))
      q1.processAllAvailable()
      q1.stop()
      val q2 = start()
      mem.addData(DocText(2L, nearDup))
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 2L)),
        s"restarted query must pair against pre-restart state, got $got")
      assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
        s"unrelated doc must stay unpaired, got $got")
    }
  }

  test("saturation is observable: a full bucket still probes but reports the unstored doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val mem = MemoryStream[DocText]
      val events = StreamingNearDup.streamingCandidateEvents(mem.toDS(), maxPerBucket = 1)
      val q = events.writeStream.format("memory")
        .queryName("neardup_sat").outputMode("append").start()
      mem.addData(DocText(1L, base))
      q.processAllAvailable()
      // identical text → same bucket in every band; cap 1 means doc 2
      // probes (pairs with 1) but cannot be stored anywhere
      mem.addData(DocText(2L, base))
      q.processAllAvailable()
      // doc 3 must STILL pair against the stored doc 1 — saturation
      // loses doc 2's membership, not the bucket's function
      mem.addData(DocText(3L, base))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("neardup_sat")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val pairs = got.filter(_._1 == "pair").map(e => (e._2, e._3)).toSet
      assert(pairs === Set((1L, 2L), (1L, 3L)),
        s"stored doc 1 pairs with both later arrivals, got $pairs")
      val sat = got.filter(_._1 == "saturated")
      // 16 bands × one full bucket each, for doc 2 and doc 3
      assert(sat.count(_._2 == 2L) === 16 && sat.count(_._2 == 3L) === 16,
        s"each unstored (doc, bucket) must be reported, got ${sat.toSeq}")
      assert(sat.forall(_._3 == 1L), "id_b carries the cap for sizing")
    }
  }

  test("TTL horizon: expired occupants stop matching and stop counting against the cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ProcessingTime time mode makes shouldRunAnotherBatch always true,
    // so neither processAllAvailable nor AvailableNow ever quiesces —
    // batch completion is observed through SENTINEL PAIRS instead: each
    // wave ships two copies of the same text, whose mutual pair row
    // appearing in the sink proves the wave was processed.
    def pollUntil(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60e9.toLong
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting: $what")
        Thread.sleep(200)
      }
    }
    withRocksDBStateStore {
      val mem = MemoryStream[DocText]
      // 10s TTL: the wave-2 → wave-3 gap (poll latency + 200ms trigger
      // + batch run, all inflatable by CI load) must stay INSIDE the
      // horizon, so the horizon is generous; wave-1 age-out doesn't
      // sleep a fixed guess but is keyed off the sentinel-observation
      // time (state write happens before its sentinel reaches the
      // sink, so sentinel-time + TTL + margin guarantees expiry)
      val ttlMs = 10000L
      val q = StreamingNearDup.streamingCandidateEvents(
        mem.toDS(), maxPerBucket = 1,
        ttl = Some(java.time.Duration.ofMillis(ttlMs)))
        .writeStream.format("memory")
        .queryName("neardup_ttl")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .outputMode("append").start()
      try {
        def events() = spark.table("neardup_ttl")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        def pairs() = events().filter(_._1 == "pair").map(e => (e._2, e._3)).toSet

        // wave 1: docs 1+6 (same text) — (1,6) in the sink = wave done
        mem.addData(DocText(1L, base), DocText(6L, base))
        pollUntil("wave 1 sentinel")(pairs().contains((1L, 6L)))
        // age wave 1 out: its state rows were written BEFORE the
        // sentinel pair surfaced, so sentinel-time + TTL + 1s margin
        // guarantees they read as expired from here on
        Thread.sleep(ttlMs + 1000L)

        // wave 2: docs 2+5 (same text, near-dup of wave 1's)
        mem.addData(DocText(2L, nearDup), DocText(5L, nearDup))
        pollUntil("wave 2 sentinel")(pairs().contains((2L, 5L)))
        val cross12 = pairs().filter(p =>
          Set(1L, 6L).contains(p._1) && Set(2L, 5L).contains(p._2))
        assert(cross12.isEmpty,
          s"wave 1 is past the horizon and must not pair, got $cross12")
        // expired entries must not hold the cap: with cap 1 and wave 1
        // expired, exactly ONE of {2,5} is stored, not zero
        val sat2 = events().filter(e =>
          e._1 == "saturated" && Set(2L, 5L).contains(e._2)).map(_._2).toSet
        assert(sat2.size === 1,
          s"one of wave 2 stored, one saturated; saturated ids: $sat2")

        // wave 3 (inside the horizon): doc 4 must pair with the stored
        // wave-2 doc — the memory still works within the TTL window
        mem.addData(DocText(4L, nearDup))
        pollUntil("wave 3 pairs with stored wave-2 doc")(
          pairs().exists(p => p == ((2L, 4L)) || p == ((4L, 5L))))
        assert(!pairs().exists(p => Set(1L, 6L).contains(p._1) && p._2 == 4L),
          s"expired wave 1 must not pair with wave 3, got ${pairs()}")
      } finally q.stop()
    }
  }

  test("streaming equals batch: same candidate set when everything is one batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val docs = Seq(
        DocText(1L, base), DocText(2L, nearDup), DocText(3L, unrelated),
        DocText(4L, base + " tail tail"), DocText(5L, (200 to 250).map(i => s"z$i").mkString(" ")))
      // batch twin: self-join the band keys exactly like MinHashNearDup
      val bk = StreamingNearDup.bandKeys(docs.toDF(), "doc_id", "text")
      val expected = bk.alias("l")
        .join(bk.alias("r"),
          col("l.bucket") === col("r.bucket") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id"), col("r.doc_id"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mem = MemoryStream[DocText]
      val q = StreamingNearDup.streamingCandidatePairs(mem.toDS())
        .writeStream.format("memory")
        .queryName("neardup_parity").outputMode("append").start()
      mem.addData(docs: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("neardup_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      assert(got.contains((1L, 2L)) && got.contains((1L, 4L)))
    }
  }

  test("cap admission: real processor ≡ capAdmissionFold across batch boundaries") {
    import spark.implicits._
    // one hot bucket "h" saturating a cap of 3 across batches, one cold
    // bucket "c" that never fills; doc-id-ordered cuts (the fold's
    // contract). Expected by hand at cap 3:
    //  batch 1: h gets 1,2 (both admitted; pair 1-2), c gets 10
    //  batch 2: h gets 3,4 — pairs vs stored {1,2} and 3-4; room 1 →
    //           3 admitted, 4 SATURATED
    //  batch 3: h gets 5 — pairs vs stored {1,2,3} ONLY (4 was never
    //           stored: 4-5 must NOT emit); 5 saturated. c gets 11 →
    //           pair 10-11, admitted.
    val batches = Seq(
      Seq(("h", 1L), ("h", 2L), ("c", 10L)),
      Seq(("h", 3L), ("h", 4L)),
      Seq(("h", 5L), ("c", 11L)))
    val expected = Set(
      ("pair", 1L, 2L, "h"), ("pair", 1L, 3L, "h"), ("pair", 2L, 3L, "h"),
      ("pair", 1L, 4L, "h"), ("pair", 2L, 4L, "h"), ("pair", 3L, 4L, "h"),
      ("saturated", 4L, 3L, "h"),
      ("pair", 1L, 5L, "h"), ("pair", 2L, 5L, "h"), ("pair", 3L, 5L, "h"),
      ("saturated", 5L, 3L, "h"),
      ("pair", 10L, 11L, "c"))

    val folded = StreamingNearDup.capAdmissionFold(
      batches.map(_.toDF("bucket", "doc_id")), cap = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(folded === expected, "fold diverged from the hand-computed events")

    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val mem = MemoryStream[StreamingNearDup.BandKeyRow]
      val q = StreamingNearDup.bucketEvents(mem.toDS(), maxPerBucket = 3)
        .writeStream.format("memory")
        .queryName("cap_parity").outputMode("append").start()
      batches.foreach { b =>
        mem.addData(b.map { case (bk, id) =>
          StreamingNearDup.BandKeyRow(bk, id) }: _*)
        q.processAllAvailable()
      }
      q.stop()
    }
    val streamed = spark.table("cap_parity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(streamed === expected,
      "real processor diverged from the batch fold")
  }
}
