package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The LsmLayout single-writer fence: a maintenance loop acquires a
  * writer epoch at loop start; a superseded loop's commit must throw
  * (loudly) instead of racing the marker check and the generation
  * numbering (silently). The operational accident this guards: a
  * stuck-then-revived driver running beside its replacement on the
  * same index path. */
class WriterFencingSpec extends SparkTestBase {
  import spark.implicits._

  // epochs deliberately survive rebuilds (the fence contract), so the
  // FIXTURE must start from a clean slate or a previous suite run's
  // epoch files shift every expected number
  org.apache.commons.io.FileUtils.deleteQuietly(
    new java.io.File("target/test_fence"))

  private def docs(ids: Range, tag: String) =
    ids.map(i => (i.toLong, (1 to 12).map(j => s"$tag${i + j}").mkString(" ")))
      .toDF("doc_id", "text")

  test("epochs are monotone per path and independent across paths") {
    val p = "target/test_fence/epochs"
    val e1 = LsmLayout.acquireWriterEpoch(spark, p)
    val e2 = LsmLayout.acquireWriterEpoch(spark, p)
    assert(e2 > e1)
    val other = LsmLayout.acquireWriterEpoch(spark, s"${p}_other")
    assert(other === 1L)
    // current epoch passes; unfenced callers always pass
    LsmLayout.requireCurrentEpoch(spark, p, Some(e2))
    LsmLayout.requireCurrentEpoch(spark, p, None)
    val err = intercept[IllegalStateException] {
      LsmLayout.requireCurrentEpoch(spark, p, Some(e1))
    }
    assert(err.getMessage.contains("stale writer epoch"))
  }

  test("a superseded writer's interleaved lexical maintenance is rejected loudly") {
    val p = "target/test_fence/lex"
    // writer A owns the loop
    val epochA = LsmLayout.acquireWriterEpoch(spark, p)
    LexicalIndex.build(docs(0 until 8, "a"), "doc_id", "text", p, n = 2)
    LexicalIndex.refresh(docs(8 until 12, "a"), "doc_id", "text", p,
      batchId = "b1", writerEpoch = Some(epochA))
    // writer B takes over (the replacement driver) and ingests
    val epochB = LsmLayout.acquireWriterEpoch(spark, p)
    LexicalIndex.refresh(docs(12 until 16, "a"), "doc_id", "text", p,
      batchId = "b2", writerEpoch = Some(epochB))
    // the revived writer A tries to continue its loop — its commit
    // must throw BEFORE marking the batch applied
    val err = intercept[IllegalStateException] {
      LexicalIndex.refresh(docs(16 until 20, "a"), "doc_id", "text", p,
        batchId = "b3", writerEpoch = Some(epochA))
    }
    assert(err.getMessage.contains("stale writer epoch"))
    assert(!LsmLayout.isApplied(spark, p, "b3"),
      "a fenced-out commit must not leave an applied marker")
    // B's re-delivery of the same micro-batch id replaces A's orphaned
    // partial generation — the layout converges under the new owner
    LexicalIndex.refresh(docs(16 until 20, "a"), "doc_id", "text", p,
      batchId = "b3", writerEpoch = Some(epochB))
    assert(LsmLayout.isApplied(spark, p, "b3"))
    val rebuilt = "target/test_fence/lex_oneshot"
    LexicalIndex.build(docs(0 until 20, "a"), "doc_id", "text", rebuilt,
      n = 2)
    def serve(path: String) =
      LexicalIndex.lexicalTopK(spark, path, queryDocId = 3L, k = 5)
        .as[(Long, Long)].collect().toSeq
    assert(serve(p) === serve(rebuilt))
  }

  test("the fence guards every layout family's commit path") {
    // band
    val band = "target/test_fence/band"
    BandIndex.build(docs(0 until 6, "b"), "doc_id", "text", band)
    LsmLayout.acquireWriterEpoch(spark, band)
    intercept[IllegalStateException] {
      BandIndex.append(docs(6 until 9, "b"), "doc_id", "text", band,
        batchId = "b1", writerEpoch = Some(0L))
    }
    // kmv
    val kmv = "target/test_fence/kmv"
    KmvLayout.build(
      docs(0 until 6, "k").withColumn("source", lit("s")),
      "source", "doc_id", "text", kmv)
    LsmLayout.acquireWriterEpoch(spark, kmv)
    intercept[IllegalStateException] {
      KmvLayout.refresh(
        docs(6 until 9, "k").withColumn("source", lit("s")),
        "source", "doc_id", "text", kmv, batchId = "b1",
        writerEpoch = Some(0L))
    }
    // ivf
    val ivf = "target/test_fence/ivf"
    val vecs = (1 to 12).map(i =>
      (i.toLong, (0 until 4).map(j => math.sin(i + j).toFloat)))
      .toDF("vec_id", "embedding")
    IvfLayout.build(vecs, "vec_id", "embedding", ivf,
      Similarity.hyperplanes(2, 4).map(_.map(_.toDouble)))
    LsmLayout.acquireWriterEpoch(spark, ivf)
    intercept[IllegalStateException] {
      IvfLayout.refresh(vecs, "vec_id", "embedding", ivf,
        batchId = "b1", writerEpoch = Some(0L))
    }
    // chunk store
    val cs = "target/test_fence/chunks"
    ChunkStore.build(docs(0 until 6, "c"), "doc_id", "text", cs)
    LsmLayout.acquireWriterEpoch(spark, cs)
    intercept[IllegalStateException] {
      ChunkStore.refresh(docs(6 until 9, "c"), "doc_id", "text", cs,
        batchId = "b1", writerEpoch = Some(0L))
    }
    // registry (ingest AND forget)
    val reg = "target/test_fence/registry"
    ClusterRegistry.build(docs(0 until 6, "r"), "doc_id", "text", reg)
    LsmLayout.acquireWriterEpoch(spark, reg)
    intercept[IllegalStateException] {
      ClusterRegistry.ingest(docs(6 until 9, "r"),
        "doc_id", "text", reg, batchId = "b1", writerEpoch = Some(0L))
    }
    intercept[IllegalStateException] {
      ClusterRegistry.forget(Seq(1L).toDF("doc_id"), "doc_id", reg,
        batchId = "d1", writerEpoch = Some(0L))
    }
  }
}
