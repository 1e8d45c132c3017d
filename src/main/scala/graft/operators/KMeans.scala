package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means training loop (Lloyd's algorithm, Lloyd 1982) in
  * EXACT integer arithmetic — the full-training sibling of the single
  * [[graft.queries.NorthStar]] n58 step, and the third iterative trainer
  * in the engine after [[BpeTrainer]] (n67) and the logreg step (n76).
  *
  * Why quantized: a float Lloyd iteration is not reproducible — centroid
  * means depend on reduction order, so two runs (or two engines) drift
  * apart after round 1. Here vectors are quantized ONCE to a 1e-6 grid
  * (`floor(v·1e6)` as BIGINT — IEEE-exact on any engine), distances are
  * integer sums (max |diff| ≤ ~2e6 → diff² ≤ 4e12, ×64 dims ≤ 2.6e14,
  * far under 2^53 AND 2^63: exact, associative, partial-agg safe), and
  * each new centroid is `floor(qsum / n)` — one double division of two
  * exactly-representable integers (exactly representable while
  * |qsum| < 2^53, i.e. cells below ~4.5e9 members at the ~1e6
  * component scale; beyond that both engines still perform the SAME
  * int64→double rounding, so cross-engine bit-parity holds even where
  * the grid-exactness claim no longer does), identically rounded
  * everywhere. Every
  * round is therefore bit-reproducible across partitionings, cluster
  * sizes, and engines — which is what lets a DuckDB oracle replay the
  * whole loop (n79).
  *
  * Scale shape (the 100 TB contract):
  *  - centroids live in ONE broadcast row as `array<array<long>>` —
  *    k×d longs, metadata-sized; the corpus NEVER shuffles;
  *  - assignment is a map-only HOF argmin over that row (same fused
  *    shape as [[graft.functions.NearestCell]], integer domain);
  *  - the update is the n58 partial-agg shape: posexplode feeds
  *    map-side combines, the one exchange per round carries ≤ k×d
  *    BIGINT partial rows per task, never vectors;
  *  - empty cells keep their previous centroid (left-join coalesce), so
  *    k is stable across rounds.
  */
object KMeans {

  /** Map-only quantization: `(id, graft__qv: array<long>)` on the 1e-6
    * grid. */
  def quantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol),
      transform(col(vecCol).cast("array<double>"),
        x => floor(x * lit(1000000.0)).cast("long")).as("graft__qv"))

  /** The 1-row broadcastable centroid table from literal init centroids
    * (already on the 1e-6 grid), ordered by cell index. */
  def centroidRow(emb: DataFrame, init: Seq[Seq[Long]]): DataFrame =
    emb.sparkSession.range(1).select(
      array(init.map(c => array(c.map(lit(_)): _*)): _*).as("graft__cents"))

  /** Integer squared-L2 argmin over the broadcast centroid row — a
    * map-only projection; ties break to the lower cell index (struct
    * sort), the [[Similarity.nearestCell]] convention. */
  def assign(qvecs: DataFrame, cents: DataFrame): DataFrame =
    qvecs.crossJoin(broadcast(cents))
      .withColumn("cell",
        element_at(
          array_sort(transform(col("graft__cents"), (c, i) =>
            struct(
              aggregate(
                zip_with(col("graft__qv"), c, (x, y) => (x - y) * (x - y)),
                lit(0L), (a, v) => a + v).as("d"),
              i.as("i")))),
          1).getField("i"))
      .drop("graft__cents")

  /** One Lloyd update: per-(cell, dim) BIGINT partial sums (the only
    * exchange of the round — ≤ k×d slim rows per task), then the new
    * quantized centroid `floor(qsum/n)` folded back into a fresh 1-row
    * centroid table; cells that attracted no vectors keep their
    * previous centroid. */
  def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val upd = assigned
      .select(col("cell"),
        posexplode(col("graft__qv")).as(Seq("graft__pos", "graft__x")))
      .groupBy(col("cell"), col("graft__pos"))
      .agg(count(lit(1)).as("graft__n"), sum(col("graft__x")).as("graft__s"))
      .withColumn("graft__qc",
        floor(col("graft__s").cast("double") / col("graft__n").cast("double"))
          .cast("long"))
    val arrs = upd.groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(
          struct(col("graft__pos").as("p"), col("graft__qc").as("q")))),
        s => s.getField("q")).as("graft__arr"))
    prev
      .select(posexplode(col("graft__cents")).as(Seq("cell", "graft__prev")))
      .join(arrs, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("graft__arr"), col("graft__prev")).as("graft__arr"))
      .agg(transform(
        array_sort(collect_list(struct(col("cell"), col("graft__arr")))),
        s => s.getField("graft__arr")).as("graft__cents"))
  }

  /** `rounds` Lloyd updates from `init`, then a final assignment;
    * returns the trained model as per-(cell, dim) stats:
    * (cell, dim 1-based, n, qsum, centroid = qsum / (1e6·n)).
    *
    * Deep-round lineage discipline (the BpeTrainer pattern): each
    * round's centroid row depends on a full corpus aggregation over the
    * PREVIOUS row's lineage, so an unchecked k-round loop builds a
    * plan k corpus-aggs deep — analysis cost grows with k even though
    * the data is one row. Past `checkpointEvery` rounds the loop
    * truncates via [[IterationCheckpoint.localCounted]] (internal-row
    * rebuild, fresh stats) and eagerly releases the superseded round's
    * blocks. Checkpointing cannot change values: every round is exact
    * integer arithmetic, so the truncated and untruncated loops are
    * bit-identical (KMeansSpec pins it). */
  /** The trained model itself: the 1-row quantized centroid table
    * after `rounds` Lloyd updates — the artifact [[train]] assigns
    * against, exposed for model-centric consumers (centroid audits,
    * index builds). Same loop, same checkpoint discipline. */
  def trainedCentroidRow(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      init: Seq[Seq[Long]],
      rounds: Int,
      checkpointEvery: Int = 4): DataFrame = {
    val sc = emb.sparkSession.sparkContext
    val qv = quantize(emb, idCol, vecCol)
    var cents = centroidRow(emb, init)
    var held: scala.collection.Set[Int] = Set.empty
    for (r <- 1 to rounds) {
      cents = update(assign(qv, cents), cents)
      if (checkpointEvery > 0 && r % checkpointEvery == 0 && r < rounds) {
        val (ck, ids, _) = IterationCheckpoint.localCounted(cents)
        IterationCheckpoint.release(sc, held)
        cents = ck
        held = ids
      }
    }
    // blocks behind the LAST surviving checkpoint stay held: the
    // returned plan reads them (a truncated localCheckpoint cannot be
    // recomputed). One 1-row RDD; ContextCleaner reclaims it with the
    // frame. Every superseded round was released eagerly above.
    cents
  }

  def train(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      init: Seq[Seq[Long]],
      rounds: Int,
      checkpointEvery: Int = 4): DataFrame = {
    val qv = quantize(emb, idCol, vecCol)
    val cents =
      trainedCentroidRow(emb, idCol, vecCol, init, rounds, checkpointEvery)
    assign(qv, cents)
      .select(col("cell"),
        posexplode(col("graft__qv")).as(Seq("graft__pos", "graft__x")))
      .select(col("cell"), (col("graft__pos") + 1).cast("long").as("dim"),
        col("graft__x"))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("graft__x")).as("qsum"))
      .select(col("cell"), col("dim"), col("n"), col("qsum"),
        (col("qsum").cast("double") /
          (lit(1000000.0) * col("n").cast("double"))).as("centroid"))
  }
}
