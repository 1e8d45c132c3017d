package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding output) into
  * duplicate CLUSTERS so a pipeline can keep exactly one representative
  * per cluster. Reference intent: the reference dedups per-key only
  * (load_fact.py DELETE-then-INSERT); pair-to-cluster resolution is the
  * north-star extension that makes near-dup output actionable.
  *
  * Algorithm: iterative min-label propagation with pointer-jumping.
  * Each round every vertex takes the minimum label over itself, its
  * neighbors, and its current label's label (path compression) —
  * neighbor-min alone converges in O(diameter) rounds, the jump step
  * compresses chains so convergence is O(log diameter), the behavior of
  * the published large-star/small-star MapReduce formulation (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14).
  *
  * Scale design:
  *  - the edge list is symmetrized once, deduplicated, and
  *    materialized — every round re-joins against the SAME edges, so
  *    an expensive upstream pair producer (the whole MinHash pipeline)
  *    runs exactly once;
  *  - per-round shuffle carries (long, long) label pairs keyed by
  *    vertex id — uniform, high-cardinality keys, no driver-side state;
  *  - duplicate clusters in a real corpus are small (a handful of
  *    mirrors of one document), so diameters are tiny and the loop
  *    exits after 2-3 rounds; the iteration cap is a runaway guard for
  *    adversarial chain graphs, not the expected path;
  *  - the per-round convergence probe is a count over the CHANGED rows
  *    only. An iterative fixpoint cannot be expressed as one static
  *    Catalyst plan (no recursion in Spark SQL), so driver-side loop
  *    control is inherent here — unlike a scalar total that belongs in
  *    the plan (see n26), each action decides whether another round is
  *    needed at all. This is how GraphX/GraphFrames CC works too.
  */
object DedupClusters {

  /** Resolve components of the graph formed by `edges`.
    *
    * @param edges  one row per undirected edge (duplicate and reversed
    *               rows are fine — the input is symmetrized+deduped)
    * @param srcCol long-compatible vertex column
    * @param dstCol long-compatible vertex column
    * @return (id, component): one row per vertex that appears in any
    *         edge; `component` is the minimum vertex id reachable from
    *         `id` (a canonical, deterministic cluster representative).
    */
  def components(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      reliableCheckpointDir: Option[String] = None): DataFrame = {
    val e = edges.select(
      col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // localCheckpoint (eager), not persist: each round's labels feed
    // three joins in the NEXT round, so without truncation the logical
    // plan doubles every iteration and analyzer/optimizer time grows
    // exponentially — the classic Spark iterative-algorithm trap
    // (GraphX/GraphFrames checkpoint for the same reason). After the
    // checkpoint every round plans against a fresh leaf relation. A
    // fault-tolerant deployment passes `reliableCheckpointDir` (tested
    // code path, see DedupClustersSpec); the content (label pairs) is
    // tiny relative to the corpus either way.
    //
    // Superseded rounds are unpersisted EAGERLY (GraphX does the same):
    // checkpoint blocks are only reclaimed by driver GC + ContextCleaner
    // otherwise, so a long run would pin O(rounds × |V|) executor
    // storage. A checkpointed round's blocks are its ONLY copy (the
    // lineage is truncated), so only rounds no longer referenced may be
    // released — never the current one or the returned result.
    //
    // `reliableCheckpointDir` swaps localCheckpoint for a RELIABLE
    // checkpoint (files under the given dir, typically HDFS/object
    // storage): rounds survive executor loss, the documented 100 TB
    // deployment mode. Reliable rounds hold no executor storage, so
    // release is a no-op there; the files are caller-managed (delete
    // the dir after consuming the result) — Spark only reclaims them
    // on context shutdown with the cleaner enabled.
    val sc = edges.sparkSession.sparkContext
    reliableCheckpointDir.foreach(sc.setCheckpointDir)
    def checkpointed(df: DataFrame): (DataFrame, scala.collection.Set[Int]) =
      if (reliableCheckpointDir.isDefined) (df.checkpoint(), Set.empty)
      else {
        val before = sc.getPersistentRDDs.keySet
        val out = df.localCheckpoint()
        (out, sc.getPersistentRDDs.keySet -- before)
      }
    def release(ids: scala.collection.Set[Int]): Unit = ids.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }

    val (sym, symIds) = checkpointed(
      e.union(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())

    var (labels, labelIds) = checkpointed(
      sym
        .select(col("u").as("id"))
        .distinct()
        .withColumn("comp", col("id")))

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among neighbors
      val nbrMin = sym
        .join(labels, sym("v") === labels("id"))
        .groupBy(sym("u").as("id"))
        .agg(min(col("comp")).as("graft__nbr"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
      // label of my label (pointer jump) — a no-op in round 1, where
      // every label is still its own id, so the join is skipped there
      // the OLD label rides along into the checkpoint, so the
      // convergence probe below is a scan of the just-materialized
      // blocks — no extra join/shuffle per round
      val (next, nextIds) = checkpointed(
        (if (iter == 0) stepped.withColumn("graft__jcomp", lit(null).cast("long"))
        else {
          val jump = labels
            .select(col("id").as("graft__jid"), col("comp").as("graft__jcomp"))
          stepped.join(jump, stepped("comp") === col("graft__jid"), "left")
        })
        .select(
          col("id"),
          col("comp").as("graft__old"),
          least(
            col("comp"),
            coalesce(col("graft__nbr"), col("comp")),
            coalesce(col("graft__jcomp"), col("comp"))).as("comp")))

      val changed = next
        .filter(col("comp") =!= col("graft__old"))
        .limit(1)
        .count()
      release(labelIds) // this round is materialized; the previous one is unreferenced
      labels = next.select(col("id"), col("comp"))
      labelIds = nextIds
      converged = changed == 0L
      iter += 1
    }
    release(symIds) // edges are not referenced by the checkpointed result
    // Fail loudly rather than return labels that may still be mid-merge:
    // a silent partial result would under-merge clusters and a dedup
    // pipeline would keep extra "representatives". With pointer jumping
    // convergence is O(log diameter), so 25 rounds covers diameters up
    // to ~2^25 — hitting the cap means something is pathologically wrong
    // (or maxIter was lowered), not a big-but-healthy graph.
    if (!converged) {
      release(labelIds) // nothing references the partial labels
      throw new IllegalStateException(
        s"DedupClusters.components did not converge in $maxIter rounds")
    }
    labels
  }

  /** Cluster near-dup pairs and tag each member: `component` is the
    * canonical (minimum) doc id of its cluster, `keep` marks the one
    * representative a dedup pipeline would retain. */
  def keepOnePerCluster(
      pairs: DataFrame,
      idA: String,
      idB: String): DataFrame =
    components(pairs, idA, idB)
      .select(
        col("id").as("doc_id"),
        col("comp").as("component"),
        (col("id") === col("comp")).as("keep"))
}
