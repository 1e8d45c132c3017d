package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The maintained IVF layout: refresh ≡ rebuild, retry idempotency,
  * forget ≡ rebuild, compact, and probe-cell parity with the engine's
  * codegen'd assignment. The s23/s48/s49 oracles gate the served
  * rankings end-to-end; these pin the pieces. */
class IvfLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8
  private def cents: Seq[Seq[Double]] =
    Similarity.hyperplanes(4, dim).map(_.map(_.toDouble))

  private def vecs = (1 to 60).map { i =>
    (i.toLong, (0 until dim).map(j =>
      math.sin(i * 0.37 + j * 1.13).toFloat).toSeq)
  }.toDF("vec_id", "embedding")

  private def ranked(p: String, q: Seq[Double]) =
    IvfLayout.topK(spark, p, q, nprobe = 2, k = 10, excludeId = Some(1L))
      .as[(Long, Double)].collect().toSeq

  private def queryVec: Seq[Double] =
    (0 until dim).map(j => math.cos(j * 0.21))

  test("a wrong-dimension query fails loudly instead of zip-truncating") {
    val p = "target/test_ivflayout/dimcheck"
    IvfLayout.build(vecs, "vec_id", "embedding", p, cents)
    val e = intercept[IllegalArgumentException] {
      IvfLayout.topK(spark, p, queryVec.take(dim - 2), nprobe = 2, k = 5)
    }
    assert(e.getMessage.contains("dimension"))
  }

  test("refresh == rebuild; retry and marker-less replay are no-ops") {
    val inc = "target/test_ivflayout/inc"
    val full = "target/test_ivflayout/full"
    val delta = vecs.filter(col("vec_id") % 4 === 0)
    IvfLayout.build(
      vecs.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding", inc, cents)
    IvfLayout.refresh(delta, "vec_id", "embedding", inc, batchId = "b1")
    IvfLayout.build(vecs, "vec_id", "embedding", full, cents)
    assert(ranked(inc, queryVec) === ranked(full, queryVec))
    val phys = spark.read.parquet(s"$inc/vectors").count()
    IvfLayout.refresh(delta, "vec_id", "embedding", inc, batchId = "b1")
    new java.io.File(s"$inc/_applied/b1").delete()
    IvfLayout.refresh(delta, "vec_id", "embedding", inc, batchId = "b1")
    assert(spark.read.parquet(s"$inc/vectors").count() === phys,
      "a replayed batch must replace its generation, not append")
    assert(ranked(inc, queryVec) === ranked(full, queryVec))
  }

  test("refresh assigns with the STORED centroids, not caller state") {
    // build with the real centroid table, then refresh — the delta's
    // cells must agree with a full rebuild's cells for the same ids
    val inc = "target/test_ivflayout/cells"
    val delta = vecs.filter(col("vec_id") % 4 === 0)
    IvfLayout.build(
      vecs.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding", inc, cents)
    IvfLayout.refresh(delta, "vec_id", "embedding", inc, batchId = "b1")
    val stored = spark.read.parquet(s"$inc/vectors")
      .select(col("vec_id"), col("cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    val expected = vecs
      .select(col("vec_id"),
        Similarity.nearestCell(
          Similarity.asDouble(col("embedding")), cents).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(stored === expected,
      "every stored vector must sit in its engine-assigned cell")
  }

  test("tombstone == rebuild on remaining; compact drops rows physically; auto-compaction folds") {
    val del = "target/test_ivflayout/forget"
    val rem = "target/test_ivflayout/remain"
    IvfLayout.build(vecs, "vec_id", "embedding", del, cents)
    IvfLayout.tombstone(
      vecs.filter(col("vec_id") % 3 === 1).select("vec_id"),
      "vec_id", del, batchId = "d1")
    IvfLayout.build(
      vecs.filter(col("vec_id") % 3 =!= 1), "vec_id", "embedding", rem, cents)
    assert(ranked(del, queryVec) === ranked(rem, queryVec))
    // idempotent re-delivery (new batch) and same-batch retry
    IvfLayout.tombstone(
      vecs.filter(col("vec_id") % 3 === 1).select("vec_id"),
      "vec_id", del, batchId = "d2")
    IvfLayout.tombstone(
      vecs.filter(col("vec_id") % 3 === 1).select("vec_id"),
      "vec_id", del, batchId = "d1")
    assert(spark.read.parquet(s"$del/tombstones").count() ===
      vecs.filter(col("vec_id") % 3 === 1).count())
    val physBefore = spark.read.parquet(s"$del/vectors").count()
    IvfLayout.compact(spark, del)
    val snap = LsmLayout.snapshot(spark, del)
    assert(spark.read.parquet(s"$del/vectors")
      .filter(col("gen") === snap.base).count() < physBefore)
    assert(LsmLayout.liveTombstoneBatches(spark, del, snap).isEmpty)
    assert(ranked(del, queryVec) === ranked(rem, queryVec))
    // second cycle: the GC sweeps superseded dirs and the forget-set
    IvfLayout.compact(spark, del)
    assert(!new java.io.File(s"$del/tombstones").exists())
    assert(ranked(del, queryVec) === ranked(rem, queryVec))
    // auto-compaction: threshold 2, third refresh folds
    Seq(101L, 102L, 103L).foreach { id =>
      val d = Seq((id, (0 until dim).map(j =>
        math.sin(id * 0.53 + j).toFloat).toSeq)).toDF("vec_id", "embedding")
      IvfLayout.refresh(d, "vec_id", "embedding", del,
        batchId = s"a$id", compactAfterGenerations = 2)
    }
    assert(LsmLayout.liveGenerationCount(spark, del, s"$del/vectors") === 2)
  }
}
