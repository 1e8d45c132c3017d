package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram CONTAINMENT scoring — the asymmetric companion to the
  * Jaccard resemblance the near-dup family uses (Broder 1997 defines
  * both: resemblance |A∩B|/|A∪B| vs containment |A∩B|/|A|). Containment
  * is what sub-document detection needs: a short document fully pasted
  * inside a long one has containment ≈ 1 while its Jaccard can be
  * arbitrarily small, so resemblance-tuned LSH (n3/n18) structurally
  * misses the pair. Training-data pipelines hit this constantly —
  * boilerplate wrappers around a quoted article, aggregator pages
  * embedding whole posts, prompt templates around a shared payload.
  *
  * Emits DIRECTED pairs (id_sub, id_sup, containment): id_sub's
  * distinct-shingle set is ≥ threshold contained in id_sup's. A
  * symmetric near-dup pair appears in both directions.
  *
  * Scale shape (the CrossDupSpans discipline, not the LSH one):
  *  - shingling is the fused per-row codegen pass (distinct within the
  *    row, no explode-then-distinct shuffle);
  *  - the ONE exchange is the fp-keyed inverted join — shuffle rows are
  *    (fp, doc_id, n) longs, text never enters an exchange;
  *  - pair aggregation is a hash groupBy with map-side partials;
  *  - `maxDf` is the 100 TB knob: dropping grams shared by more than
  *    `maxDf` documents (stop-gram suppression) bounds the per-fp
  *    bucket fan-out that drives the join's quadratic term, at the
  *    documented cost of under-counting intersections built entirely
  *    from ubiquitous grams — pairs whose evidence is ONLY stop-grams
  *    are noise for sub-document detection. The gated query runs
  *    uncapped so the DuckDB oracle is mirrored exactly.
  */
object Containment {

  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleWidth: Int = 3,
      maxDf: Option[Long] = None): DataFrame = {
    val sh = Partitioning.spread(docs)
      .select(
        col(idCol).as("doc_id"),
        TextOps.shinglesFromTokens(
          TextOps.tokens(col(textCol)), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)

    // (fp, doc_id, n): n rides along from the per-row array size so no
    // second aggregation/join is needed to recover |S(sub)| later.
    // xxhash64 is engine-local but only equality matters here; a 64-bit
    // collision across a corpus vocabulary is ~n^2/2^64 — negligible.
    val fps = sh.select(
      col("doc_id"),
      size(col("sh")).cast("long").as("n"),
      explode(col("sh")).as("g"))
      .select(col("doc_id"), col("n"), xxhash64(col("g")).as("fp"))

    // Materialized: the narrow (fp, doc_id, n) stream feeds BOTH sides
    // of the inverted self-join (and the df prefilter when capped) —
    // without it each consumer re-runs the scan→shingle→hash chain.
    val stream = Materialize.shared(fps)

    val pruned = maxDf match {
      case Some(cap) =>
        // df is computed on the same narrow (fp) stream; the semi-join
        // back is fp-keyed like everything else in the operator.
        val keep = stream.groupBy(col("fp"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
          .select(col("fp"))
        stream.join(keep, Seq("fp"), "left_semi")
      case None => stream
    }

    pruned.alias("a")
      .join(
        pruned.select(col("fp"), col("doc_id").as("id_sup")).alias("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") =!= col("id_sup"))
      .groupBy(col("a.doc_id").as("id_sub"), col("id_sup"))
      .agg(max(col("a.n")).as("n_sub"), count(lit(1)).as("i"))
      .withColumn("containment", col("i").cast("double") / col("n_sub"))
      .filter(col("containment") >= threshold)
      .select(col("id_sub"), col("id_sup"), col("containment"))
  }
}
