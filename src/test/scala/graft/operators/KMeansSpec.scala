package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  // two well-separated 2-cell blobs in 4 dims; init centroids off-center
  private val blobA = Seq.tabulate(5)(i =>
    (i.toLong, Seq(1.0f + i * 0.01f, 1.0f, 0.0f, 0.0f)))
  private val blobB = Seq.tabulate(5)(i =>
    (100L + i, Seq(-1.0f - i * 0.01f, -1.0f, 0.0f, 0.0f)))
  private val init: Seq[Seq[Long]] =
    Seq(Seq(500000L, 0L, 0L, 0L), Seq(-500000L, 0L, 0L, 0L))

  test("train converges to the blob means (exact integer arithmetic)") {
    val out = KMeans
      .train(vecs(blobA ++ blobB), "vec_id", "embedding", init, rounds = 2)
      .collect()
    assert(out.length == 2 * 4)
    // each blob lands in its own cell with all 5 members
    assert(out.forall(_.getAs[Long]("n") == 5L))
    // dim-1 centroid of cell 0 = mean(1.00..1.04) = 1.02 on the 1e-6 grid
    val c0d1 = out.find(r =>
      r.getAs[Int]("cell") == 0 && r.getAs[Long]("dim") == 1L).get
    assert(math.abs(c0d1.getAs[Double]("centroid") - 1.02) < 1e-6)
    val c1d1 = out.find(r =>
      r.getAs[Int]("cell") == 1 && r.getAs[Long]("dim") == 1L).get
    assert(math.abs(c1d1.getAs[Double]("centroid") + 1.02) < 1e-6)
  }

  test("checkpointed deep-round loop is bit-identical to the unchecked loop") {
    // 6 rounds with a checkpoint every 2 vs the same loop unchecked —
    // truncation must be plan-only (every round is exact integer math)
    val emb = vecs(blobA ++ blobB)
    def run(every: Int) =
      KMeans.train(emb, "vec_id", "embedding", init, rounds = 6,
        checkpointEvery = every)
        .orderBy("cell", "dim").collect().toSeq
    assert(run(2) == run(0), "checkpointing changed the trained model")
  }

  test("bit-reproducible under any partitioning (the quantization contract)") {
    val base = vecs(blobA ++ blobB)
    def run(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      KMeans.train(df, "vec_id", "embedding", init, rounds = 3)
        .orderBy("cell", "dim").collect().toSeq
    val a = run(base.repartition(1))
    val b = run(base.repartition(7, col("vec_id")))
    assert(a == b, "training diverged under repartitioning")
  }

  test("an empty cell keeps its previous centroid across rounds") {
    // all points near +1: cell 1 (init −0.5) attracts nothing and must
    // survive the update unchanged instead of vanishing or going null
    val out = KMeans
      .train(vecs(blobA), "vec_id", "embedding", init, rounds = 2)
      .collect()
    assert(out.map(_.getAs[Int]("cell")).distinct.toSeq == Seq(0))
    // the final ASSIGNMENT only reports non-empty cells; the loop not
    // throwing and cell 0's stats being complete proves the empty cell
    // stayed a valid centroid through both updates
    assert(out.length == 4 && out.forall(_.getAs[Long]("n") == 5L))
  }

  test("rounds move the centroid: round-2 result differs from round-0 stats") {
    val emb = vecs(blobA ++ blobB)
    val r0 = KMeans.train(emb, "vec_id", "embedding", init, rounds = 0)
      .orderBy("cell", "dim").collect().toSeq
    val r2 = KMeans.train(emb, "vec_id", "embedding", init, rounds = 2)
      .orderBy("cell", "dim").collect().toSeq
    // same cell structure here (blobs are separable from the init), but
    // the reported centroids must be the TRAINED means, not the init
    assert(r0 == r2,
      "separable blobs: assignment is stable from round 0, stats identical")
    // a boundary point that SWITCHES cells once the centroid it first
    // joined is dragged away by the far members: x ∈ {0, 0.1, 0.7, 1.0},
    // init (0.75, 1.0) — round 0 grabs 0.7 into cell 0, the update moves
    // cell 0 to 0.2667, and the next assignment hands 0.7 to cell 1
    val drift = Seq(
      (0L, Seq(0.0f, 0f, 0f, 0f)), (1L, Seq(0.1f, 0f, 0f, 0f)),
      (2L, Seq(0.7f, 0f, 0f, 0f)), (3L, Seq(1.0f, 0f, 0f, 0f)))
    val dInit: Seq[Seq[Long]] =
      Seq(Seq(750000L, 0L, 0L, 0L), Seq(1000000L, 0L, 0L, 0L))
    def ns(rounds: Int): Map[Int, Long] =
      KMeans.train(vecs(drift), "vec_id", "embedding", dInit, rounds)
        .filter(col("dim") === 1).collect()
        .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n")).toMap
    assert(ns(0) == Map(0 -> 3L, 1 -> 1L), "round-0 grab")
    assert(ns(1) == Map(0 -> 2L, 1 -> 2L),
      "one Lloyd round must re-hand the boundary point")
  }
}
