package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.EventStream.{TransitionEvent, TransitionOut}

/** Stream ≡ batch parity for the transition-matrix family (the n137
  * matrix under continuous ingest, gated as n138's fold spelling). */
class StreamingTransitionsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  // user 1: a(10) b(20) | c(30)  — boundary pair (b, c) crosses batches
  // user 2: x(5)  x(15) | (none)
  // batch 1 is shuffled within itself: the processor must fold in
  // (ts, event_id) order, not arrival order.
  private val batch1 = Seq(
    TransitionEvent(1L, ts(20), 102L, "b"),
    TransitionEvent(2L, ts(5), 201L, "x"),
    TransitionEvent(1L, ts(10), 101L, "a"),
    TransitionEvent(2L, ts(15), 202L, "x"))
  private val batch2 = Seq(
    TransitionEvent(1L, ts(30), 103L, "c"))

  private val expectedPairs = Set(
    (1L, "a", "b"), (1L, "b", "c"), (2L, "x", "x"))

  test("streamingTransitions emits each transition once, incl. the boundary pair") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDBStateStore {
      val mem = MemoryStream[TransitionEvent]
      val q = EventStream.streamingTransitions(spark, mem.toDS())
        .writeStream.format("memory")
        .queryName("trans_test").outputMode("append").start()
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("trans_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(got.length === got.distinct.length, "no transition emitted twice")
      assert(got.toSet === expectedPairs)
    }
  }

  test("restart from the checkpoint preserves the boundary state") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = "target/trans_restart_ckpt"
    val out = "target/trans_restart_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    withRocksDBStateStore {
      val mem = MemoryStream[TransitionEvent]
      def start() = EventStream.streamingTransitions(spark, mem.toDS())
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[TransitionOut], _: Long) =>
            batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val q1 = start()
      mem.addData(batch1: _*)
      q1.processAllAvailable()
      q1.stop()
      val q2 = start()
      mem.addData(batch2: _*)
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === expectedPairs,
        s"the restarted query must emit (b, c) from pre-restart state, got $got")
    }
  }

  test("transitionsBatchFold (the n138 gate spelling) ≡ whole-stream matrix") {
    val all = (batch1 ++ batch2)
      .toDF("user_id", "ts", "event_id", "event_type")
    val whole = EventStream.transitionMatrix(EventStream.transitionPairs(all))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val folded = EventStream.transitionsBatchFold(Seq(
      batch1.toDF("user_id", "ts", "event_id", "event_type"),
      batch2.toDF("user_id", "ts", "event_id", "event_type")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(folded === whole)
    assert(whole(("b", "c"))._1 === 1L, "the boundary pair is counted once")
  }
}
