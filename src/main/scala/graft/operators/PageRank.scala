package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One exact power-iteration step of PageRank (Brin & Page 1998) over
  * an edge relation — the graph-centrality building block next to
  * [[DedupClusters]]' connectivity: rank duplicates' cluster HUBS, find
  * the most-linked documents in a citation/link graph, weight training
  * samples by graph authority. All arithmetic is integer fixed-point:
  * the uniform start mass is `scale` per node, each node sends
  * floor(scale / out-degree) along every out-edge, and the damped
  * update is rank₁ = (1−d)·scale + d·(received mass) with d = 85/100
  * in exact BIGINT floor arithmetic — associative, partitioning-
  * independent, SQL-replayable. (Floor truncation loses ≤ deg−1 mass
  * units per node per step — the standard integer-PageRank tradeoff,
  * deterministic here; dangling mass is dropped, not redistributed.)
  *
  * Scale shape: out-degrees are one grouped count over the edge list;
  * per-edge mass is an equi-join on the source (both sides edge-list
  * sized, uniform hash keys); received mass is one grouped sum with
  * map-side partials. Nothing is quadratic; node payloads never enter
  * the exchanges — ids and longs only. Multi-step PageRank ([[train]])
  * iterates this under [[IterationCheckpoint]] exactly like the CC
  * fixpoint.
  */
object PageRank {

  /** (id, deg, rank1) for every node appearing in `edges`; directed
    * edges src → dst. */
  def step(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    val e = edges.select(
      col(srcCol).cast("long").as("graft__u"),
      col(dstCol).cast("long").as("graft__v"))
    val deg = e.groupBy(col("graft__u"))
      .agg(count(lit(1)).as("graft__deg"))
    val mass = e.join(deg, Seq("graft__u"))
      .select(col("graft__v"),
        expr(s"${scale}L div graft__deg").as("graft__m"))
      .groupBy(col("graft__v"))
      .agg(sum(col("graft__m")).as("graft__mass"))
    val nodes = e.select(col("graft__u").as("id"))
      .union(e.select(col("graft__v").as("id")))
      .distinct()
    nodes
      .join(deg.withColumnRenamed("graft__u", "id"), Seq("id"), "left")
      .join(mass.withColumnRenamed("graft__v", "id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("graft__deg"), lit(0L)).as("deg"),
        (lit(scale - scale * dampNum / dampDen) +
          expr(s"(coalesce(graft__mass, 0L) * ${dampNum}L) div ${dampDen}L"))
          .as("rank1"))
  }

  /** Full multi-round power iteration: rank_{r+1}(v) = (1−d)·scale +
    * d·Σ_{u→v} floor(rank_r(u)/deg(u)), starting uniform at `scale`,
    * all in the same exact BIGINT floor arithmetic as [[step]]
    * (train(rounds = 1) ≡ step — law-pinned in PageRankSpec). Returns
    * (id, deg, pr) after `rounds` damped updates.
    *
    * Loop discipline (the KMeans/BPE/CC pattern): the edge list, the
    * out-degree table and the node universe are computed once and
    * persisted ([[Materialize.shared]] — released by the runner sweep);
    * each round is one edge↔rank equi-join plus one grouped sum, so the
    * per-round cost is edge-list-sized regardless of round number. The
    * rank frame's lineage is truncated every `checkpointEvery` rounds
    * via [[IterationCheckpoint.localCounted]] (fresh stats — see its
    * scaladoc for why plain localCheckpoint compounds join stats), and
    * superseded checkpoint blocks are released eagerly. Checkpointing
    * cannot change values: every round is exact integer arithmetic, so
    * truncated and untruncated loops are bit-identical (spec-pinned).
    */
  def train(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val sc = edges.sparkSession.sparkContext
    val e = Materialize.shared(edges.select(
      col(srcCol).cast("long").as("graft__u"),
      col(dstCol).cast("long").as("graft__v")))
    val deg = Materialize.shared(
      e.groupBy(col("graft__u")).agg(count(lit(1)).as("graft__deg")))
    val nodes = Materialize.shared(
      e.select(col("graft__u").as("id"))
        .union(e.select(col("graft__v").as("id")))
        .distinct())
    val base = lit(scale - scale * dampNum / dampDen)
    var rank = nodes.select(col("id"), lit(scale).as("graft__pr"))
    var held: scala.collection.Set[Int] = Set.empty
    for (r <- 1 to rounds) {
      val mass = e.join(deg, Seq("graft__u"))
        .join(rank.withColumnRenamed("id", "graft__u"), Seq("graft__u"))
        .select(col("graft__v"),
          expr("graft__pr div graft__deg").as("graft__m"))
        .groupBy(col("graft__v"))
        .agg(sum(col("graft__m")).as("graft__mass"))
      rank = nodes
        .join(mass.withColumnRenamed("graft__v", "id"), Seq("id"), "left")
        .select(col("id"),
          (base +
            expr(s"(coalesce(graft__mass, 0L) * ${dampNum}L) div ${dampDen}L"))
            .as("graft__pr"))
      if (checkpointEvery > 0 && r % checkpointEvery == 0 && r < rounds) {
        val (ck, ids, _) = IterationCheckpoint.localCounted(rank)
        IterationCheckpoint.release(sc, held)
        rank = ck
        held = ids
      }
    }
    rank
      .join(deg.withColumnRenamed("graft__u", "id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("graft__deg"), lit(0L)).as("deg"),
        col("graft__pr").as("pr"))
  }
}
