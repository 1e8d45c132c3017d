package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): exact
  * brute-force top-k cosine as the correctness baseline, sign-random
  * hyperplane LSH bucketing as the approximate scale path, and a
  * label-blocked near-duplicate pair join.
  *
  * All vector math is higher-order array functions (zip_with/aggregate)
  * in double precision — codegen'd Catalyst expressions, no UDF
  * serialization on the hot path. A custom codegen Expression would be
  * the next step if profiling demanded it (SURVEY.md §7.3), but HOFs
  * keep the whole scan→score→top-k pipeline inside whole-stage codegen.
  *
  * Scale notes:
  *  - brute-force top-k: one scan, per-partition partial top-k via
  *    orderBy+limit (Spark plans TakeOrderedAndProject — no global
  *    sort shuffle, only k rows per partition reach the driver-side
  *    merge);
  *  - LSH: bucket id is a cheap projection; the search touches only the
  *    probe bucket's partitions (1/2^planes of the data in expectation);
  *  - near-dup: the pair join is blocked on the label key, so the
  *    quadratic blow-up is bounded by the largest block, not the table.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns — the native
    * codegen'd expression (graft.functions.CosineSimilarity): one fused
    * loop, no per-product array allocation, bit-identical to the
    * equivalent higher-order-function fold. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  def asDouble(vec: Column): Column = vec.cast("array<double>")

  /** Exact top-k by cosine against a single query vector (broadcast
    * 1-row cross join). Ties broken by id; similarity rounded so the
    * ordering survives cross-engine double comparison. */
  def topKCosine(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int): DataFrame =
    emb
      .crossJoin(broadcast(query.select(asDouble(col(queryVecCol)).as("graft__qv"))))
      .select(
        col(idCol),
        round(cosine(asDouble(col(vecCol)), col("graft__qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Deterministic ±1 hyperplanes: component (j,i) is +1 iff the first
    * hex digit of md5("j_i") is even. Shared with the DuckDB oracle by
    * embedding the generated constants on both sides — no RNG state.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until dim).map { i =>
        val hex = md.digest(s"${j}_$i".getBytes(StandardCharsets.UTF_8))
        val first = (hex(0) >> 4) & 0xf
        if (first % 2 == 0) 1 else -1
      }
    }
  }

  /** LSH bucket id: bit j set iff dot(vec, plane_j) > 0. */
  def bucket(vec: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val lit_p = array(p.map(x => lit(x.toDouble)): _*)
      val dot = aggregate(
        zip_with(vec, lit_p, (x, h) => x * h), lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: brute-force search restricted to the query
    * vector's LSH bucket. */
  def annTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      planes: Seq[Seq[Int]],
      k: Int): DataFrame = {
    val q = query.select(
      asDouble(col(queryVecCol)).as("graft__qv"),
      bucket(asDouble(col(queryVecCol)), planes).as("graft__qb"))
    emb
      .withColumn("graft__b", bucket(asDouble(col(vecCol)), planes))
      .crossJoin(broadcast(q))
      .filter(col("graft__b") === col("graft__qb"))
      .select(
        col(idCol),
        round(cosine(asDouble(col(vecCol)), col("graft__qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: coarse-quantize vectors to their nearest centroid,
    * then search only the `nprobe` centroids closest to the query —
    * the inverted-file counterpart to the hyperplane LSH path. At
    * 100 TB the assignment is a one-off projection (typically
    * materialized as a partition/bucket key) and each query touches
    * nprobe/nlist of the data. Centroids are caller-supplied so the
    * index is deterministic (e.g. per-label means or a fixed sample —
    * no RNG inside the operator).
    */
  private def centroidLit(c: Seq[Double]): Column = array(c.map(lit): _*)

  private def dist2(v: Column, c: Seq[Double]): Column =
    aggregate(
      zip_with(v, centroidLit(c), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Index of the nearest centroid (squared-L2 argmin) — the coarse
    * quantizer shared by [[ivfTopK]] and [[semDedup]]. A fused codegen'd
    * expression (graft.functions.NearestCell): one k×d loop over an
    * embedded double[][], no per-centroid intermediate arrays, constant
    * plan size in k — at a correctly-sized nlist (k ∝ N / target cell
    * size) the assignment is the dominant map-side cost of an IVF
    * build, and the HOF spelling paid an array allocation per centroid
    * per row. Ties break to the lower index (strict-< argmin), the same
    * order the HOF twin's struct sort yields; cells are bit-identical
    * (law-tested against [[nearestCellHof]]). */
  def nearestCell(v: Column, centroids: Seq[Seq[Double]]): Column =
    call_function("graft_nearest_cell", v,
      array(centroids.map(c => array(c.map(lit): _*)): _*))

  /** The higher-order-function spelling of [[nearestCell]] — kept as
    * the law-test twin (SimilaritySpec pins bit-identical cells) and as
    * the reference for the arithmetic the fused expression must match. */
  private[graft] def nearestCellHof(v: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(
      array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
        struct(dist2(v, c).as("d"), lit(i).as("i"))
      }: _*)), 1).getField("i")

  /** The `nprobe` cells nearest to `v` — the query-side probe set of an
    * IVF search (squared-L2 ranking, ties to the lower index; the same
    * struct-sort convention as [[nearestCellHof]], so probe ranking and
    * member assignment can never disagree). */
  def probeCells(v: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    slice(
      transform(
        array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
          struct(dist2(v, c).as("d"), lit(i).as("i"))
        }: _*)),
        s => s.getField("i")),
      1, nprobe)

  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      centroids: Seq[Seq[Double]],
      nprobe: Int,
      k: Int): DataFrame = {
    def nearest(v: Column): Column = nearestCell(v, centroids)
    // probe set: the nprobe centroids nearest to the query vector
    val q = query.select(asDouble(col(queryVecCol)).as("graft__qv"))
      .withColumn("graft__probes",
        probeCells(col("graft__qv"), centroids, nprobe))
    emb
      .withColumn("graft__cell", nearest(asDouble(col(vecCol))))
      .crossJoin(broadcast(q))
      .filter(array_contains(col("graft__probes"), col("graft__cell")))
      .select(
        col(idCol),
        round(cosine(asDouble(col(vecCol)), col("graft__qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batched IVF retrieval — the multi-query scale path (one corpus
    * pass serves Q queries): each query expands to its `nprobe` probe
    * cells ([[probeCells]]) and candidate generation is an EQUI-join on
    * the cell — queries×nprobe slim rows broadcast onto the corpus's
    * map-side cell assignment, so each query scores only nprobe/nlist
    * of the data (a cross join would score all of it). Per-query top-k
    * via [[TopK.twoLevel]] so no per-query reducer funnel. Output:
    * (qidCol, idCol, sim, rk). */
  def ivfMultiTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      qidCol: String,
      queryVecCol: String,
      centroids: Seq[Seq[Double]],
      nprobe: Int,
      k: Int): DataFrame = {
    val probes = query
      .select(col(qidCol), asDouble(col(queryVecCol)).as("graft__qv"))
      .withColumn("cell",
        explode(probeCells(col("graft__qv"), centroids, nprobe)))
    val scored = emb
      .select(col(idCol), asDouble(col(vecCol)).as("graft__v"))
      .withColumn("cell", nearestCell(col("graft__v"), centroids))
      .join(broadcast(probes), Seq("cell"))
      .select(col(qidCol), col(idCol),
        round(cosine(col("graft__v"), col("graft__qv")), 6).as("sim"))
    TopK.twoLevel(scored, Seq(col(qidCol)),
      pmod(hash(col(idCol)), lit(32)),
      Seq(col("sim").desc, col(idCol)), k)
      .select(col(qidCol), col(idCol), col("sim"), col("rk"))
  }

  /** Near-duplicate vector pairs within a blocking key (e.g. label):
    * the join is equi on the block, quadratic only inside it. Norms are
    * computed once per vector BEFORE the join (O(n) instead of O(pairs)
    * sqrt folds); sqrt(dot(v,v)) is the identical expression either
    * way, so the similarity value is bit-for-bit unchanged. */
  def blockedNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    // fused codegen'd loop; bit-identical to the HOF zip_with/aggregate
    // fold (same left-to-right accumulation), no per-pair array alloc
    def dot(x: Column, y: Column): Column = call_function("graft_dot", x, y)
    val side = Partitioning.spread(emb)
      .select(col(blockCol).as("graft__blk"), col(idCol),
        asDouble(col(vecCol)).as("graft__v"))
      .withColumn("graft__norm", sqrt(dot(col("graft__v"), col("graft__v"))))
    side.alias("l")
      .join(
        side.alias("r"),
        col(s"l.graft__blk") === col(s"r.graft__blk") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(
        col(s"l.$idCol").as("id_a"),
        col(s"r.$idCol").as("id_b"),
        col(s"l.graft__blk").as("block"),
        round(
          dot(col("l.graft__v"), col("r.graft__v")) /
            (col("l.graft__norm") * col("r.graft__norm")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * coarse-quantizing every vector to its nearest centroid cell and
    * dropping, WITHIN each cell, any vector that has a higher-similarity
    * twin with a lower id (the deterministic stand-in for the paper's
    * keep-one-per-near-dup-group rule). Returns every input id with its
    * cell and a `keep` flag.
    *
    * Scale shape: the cell assignment is a map-only projection (the same
    * coarse quantizer an IVF index materializes anyway), and the
    * quadratic pair join is equi on the cell — bounded by the largest
    * cell, never all-pairs, exactly like [[blockedNearDupPairs]] but
    * with the blocking key LEARNED from the geometry instead of a given
    * label. The drop set ships ids only, and the final tag is a
    * broadcast-friendly left join on id. */
  def semDedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      threshold: Double,
      saltBuckets: Int = 0): DataFrame = {
    // 0 = auto: enough salts that cells × salts ≈ 2× the cluster's
    // parallelism (replication is pure overhead beyond that — a 16-way
    // salt on a 4-core dev box makes the join 16× heavier for zero
    // extra concurrency), capped so the linear replication cost stays
    // far below the quadratic work it spreads
    val s =
      if (saltBuckets > 0) saltBuckets
      else math.max(1, math.min(64,
        (2 * emb.sparkSession.sparkContext.defaultParallelism +
          centroids.size - 1) / centroids.size))
    // Per-row work hoisted out of the pair join: the cell (coarse
    // quantization) AND the vector norm. sqrt(dot(v,v)) here is the
    // same left-to-right fold CosineSimilarity runs per pair, so
    // dot/(norm_a*norm_b) below is bit-identical to graft_cosine —
    // two of cosine's three folds amortized to O(rows).
    val dot = call_function("graft_dot", _: Column, _: Column)
    val celled = emb
      .select(col(idCol), asDouble(col(vecCol)).as("graft__v"))
      .withColumn("cell", nearestCell(col("graft__v"), centroids))
      .withColumn("graft__norm",
        sqrt(dot(col("graft__v"), col("graft__v"))))
    // The centroid count bounds cell size — but it is also the join's
    // key cardinality, and a well-sized coarse quantizer has FEWER
    // cells than the cluster has cores (n54: 16). An equi-join on the
    // bare cell would put each cell's whole quadratic workload on one
    // task. Salting restores parallelism without changing the pair
    // set: each row gets a deterministic salt, the left side is
    // replicated once per salt value, and the join key is
    // (cell, right-side salt) — every (a,b) pair still meets exactly
    // once (at a's replica tagged with b's salt), but the work now
    // spreads over cells × saltBuckets tasks. Replication cost is
    // saltBuckets × the row side — linear — against the quadratic
    // pair work it parallelizes.
    val salted = celled.withColumn(
      "graft__salt", pmod(hash(col(idCol)), lit(s)))
    // Pin the replicated side's partitioning to the join key with an
    // EXPLICIT partition count. Two silent parallelism collapses
    // otherwise: a broadcast-hash plan probes in the a-side's incoming
    // partitioning (a handful of scan splits), and under a shuffle
    // plan AQE coalesces by BYTES (~64 MB advisory), which under-sizes
    // a join whose work is quadratic in rows per partition, not linear
    // in bytes. A fixed count is exempt from AQE coalescing and the
    // sort-merge/shuffled-hash path reuses it as its own exchange.
    val spark = emb.sparkSession
    val parts = math.max(s * centroids.size,
      2 * spark.sparkContext.defaultParallelism)
    val aSide = salted
      .withColumn("graft__bsalt",
        explode(array((0 until s).map(lit): _*)))
      .repartition(parts, col("cell"), col("graft__bsalt"))
    val dropped = aSide.alias("a")
      .join(
        salted.alias("b"),
        col("a.cell") === col("b.cell") &&
          col("a.graft__bsalt") === col("b.graft__salt") &&
          col(s"b.$idCol") < col(s"a.$idCol"))
      .filter(
        round(
          dot(col("a.graft__v"), col("b.graft__v")) /
            (col("a.graft__norm") * col("b.graft__norm")), 6) >= threshold)
      .select(col(s"a.$idCol"))
      .distinct()
      .withColumn("graft__dropped", lit(true))
    celled
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(!col("graft__dropped"), lit(true)).as("keep"))
  }

  /** Batched brute-force retrieval — the exact multi-query baseline
    * (one corpus pass serves Q queries): the query batch is
    * metadata-sized → broadcast; scoring is a map-only fused-cosine
    * projection over the corpus (Q× row blowup on the map side, never
    * a shuffle of vectors); per-query top-k is [[TopK.twoLevel]] —
    * local winners per (query, salt-of-id) bucket first — because a
    * one-level window partitioned by query puts each query's whole
    * corpus ranking on ONE reducer. Output: (qidCol, idCol, sim, rk).
    */
  def bruteMultiTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      qidCol: String,
      queryVecCol: String,
      k: Int): DataFrame = {
    val q = query.select(col(qidCol),
      asDouble(col(queryVecCol)).as("graft__qv"))
    val scored = emb
      .select(col(idCol), asDouble(col(vecCol)).as("graft__v"))
      .crossJoin(broadcast(q))
      .select(col(qidCol), col(idCol),
        round(cosine(col("graft__v"), col("graft__qv")), 6).as("sim"))
    TopK.twoLevel(scored, Seq(col(qidCol)),
      pmod(hash(col(idCol)), lit(32)),
      Seq(col("sim").desc, col(idCol)), k)
      .select(col(qidCol), col(idCol), col("sim"), col("rk"))
  }

  /** Recall@k audit of an approximate retrieval result against the
    * exact one — the metric every ANN deployment monitors before
    * trading exactness for probe fraction. Both inputs are per-query
    * top-k id sets shaped (qidCol, idCol); output is one row per query
    * in `exact`: (qidCol, n_hits, recall) with recall = n_hits / k as
    * a single exact-integer division (bit-identical cross-engine).
    *
    * Scale shape: the retrieval RESULTS are queries×k rows — metadata,
    * not corpus — so the intersection join and per-query count are
    * trivially broadcastable regardless of corpus size; the expensive
    * part is producing the inputs, which each follow their own scale
    * path ([[bruteMultiTopK]] map-only scan, [[ivfMultiTopK]] partial
    * probe). The left join keeps zero-hit queries in the audit (the
    * failure you most need to see). */
  def recallAtK(
      exact: DataFrame,
      approx: DataFrame,
      qidCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val hits = exact.select(col(qidCol), col(idCol))
      .join(broadcast(approx.select(col(qidCol), col(idCol))),
        Seq(qidCol, idCol))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("graft__hits"))
    exact.select(col(qidCol)).distinct()
      .join(broadcast(hits), Seq(qidCol), "left")
      .select(col(qidCol),
        coalesce(col("graft__hits"), lit(0L)).as("n_hits"))
      .withColumn("recall",
        col("n_hits").cast("double") / lit(k).cast("double"))
  }

  /** Margin-based alignment mining (Artetxe & Schwenk 2019, "Margin-
    * based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings"): raw cosine is a poor pairing score because some
    * vectors sit in dense "hub" regions where EVERYTHING scores high;
    * the margin discounts each pair by the average similarity of both
    * endpoints' k nearest neighbors. Emits each query's single best
    * target by margin (forward mining).
    *
    * Arithmetic: cosine → round 6 (the engine's established parity
    * point) → 1e6-scaled BIGINT; the "distance" margin variant
    * a − (avgₓ + avg_y)/2 is computed SCALED BY 2k as
    * 2k·c − Σtopkₓ − Σtopk_y, a monotone transform that needs no
    * division at all — every comparison is exact-integer, so ranking
    * can never drift cross-engine on float summation order.
    *
    * Scale shape: queries are a batch → broadcast; the pair relation
    * is batch × corpus, map-only after the broadcast. Σtopkₓ is a
    * per-query aggregate over corpus-sized groups (map-side
    * combinable after the per-partition top-k below); Σtopk_y groups
    * are batch-sized per target — a narrow (tid, ci) aggregate. The
    * final per-query argmax is a TopK, not a global sort. For corpus-
    * scale candidate generation plug an IVF/LSH shortlist in as
    * `corpus` — the margin math is candidate-set-agnostic. */
  def marginMining(
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(
      col(qidCol).as("sid"), asDouble(col(qvecCol)).as("graft__qv"))
    val pairs = corpus
      .select(col(idCol).as("tid"), asDouble(col(vecCol)).as("graft__v"))
      .crossJoin(broadcast(q))
      .select(col("sid"), col("tid"),
        round(round(cosine(col("graft__v"), col("graft__qv")), 6) *
          1000000d).cast("long").as("ci"))
    val shared = Materialize.shared(pairs)

    def topSum(keyCol: String, otherCol: String) = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("ci").desc, col(otherCol))
      shared
        .withColumn("graft__rn", row_number().over(w))
        .filter(col("graft__rn") <= k)
        .groupBy(col(keyCol))
        .agg(sum(col("ci")).as(s"graft__sum_$keyCol"))
    }

    val best = Window.partitionBy(col("sid"))
      .orderBy(col("margin").desc, col("tid"))
    shared
      .join(topSum("sid", "tid"), "sid")
      .join(topSum("tid", "sid"), "tid")
      .withColumn("margin",
        lit(2L * k) * col("ci") - col("graft__sum_sid") - col("graft__sum_tid"))
      .withColumn("graft__rn", row_number().over(best))
      .filter(col("graft__rn") === 1)
      .select(col("sid"), col("tid"), col("margin"))
  }

  /** Pack the sign bits of vector components [from, until) into one
    * BIGINT (bit j-from set iff component j > 0). Two 32-bit halves
    * per 64-dim vector rather than one 64-bit word: bit 63 of a BIGINT
    * is the sign bit, and the << that would set it overflows
    * differently across engines — two halves keep every shift inside
    * exact cross-engine territory. */
  private def packSignBits(v: Column, from: Int, until: Int): Column =
    aggregate(
      sequence(lit(from), lit(until - 1)),
      lit(0L),
      (acc, j) => acc + when(
        element_at(v, (j + 1).cast("int")) > 0d,
        call_function("shiftleft", lit(1L), (j - from).cast("int")))
        .otherwise(lit(0L)))

  /** The 1-bit sign-code relation (id, lo, hi) — 16 bytes per vector.
    * Map-only; this is what s35 materializes as a stored layout so the
    * Hamming scan never touches the vector table. */
  def signCodes(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol),
      packSignBits(asDouble(col(vecCol)), 0, 32).as("lo"),
      packSignBits(asDouble(col(vecCol)), 32, 64).as("hi"))

  /** Serve a Hamming-shortlist + exact-rerank query from a STORED code
    * relation: the scan side is (id, lo, hi) only; vectors are read
    * for exactly ONE row (the query) plus the shortlist rerank, which
    * rejoins the vector table by id with the shortlist broadcast. */
  def binaryTopKFromCodes(
      codes: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      shortlist: Int,
      k: Int): DataFrame = {
    val q = signCodes(query, idCol, queryVecCol)
      .crossJoin(query.select(asDouble(col(queryVecCol)).as("graft__qv")))
      .select(col("lo").as("graft__qlo"), col("hi").as("graft__qhi"),
        col("graft__qv"))
    val short = codes
      .crossJoin(broadcast(q))
      .select(col(idCol), col("graft__qv"),
        (call_function("bit_count",
          col("lo").bitwiseXOR(col("graft__qlo"))) +
          call_function("bit_count",
            col("hi").bitwiseXOR(col("graft__qhi"))))
          .cast("long").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(shortlist)
    emb.select(col(idCol), asDouble(col(vecCol)).as("graft__v"))
      .join(broadcast(short), Seq(idCol))
      .select(col(idCol), col("hamming"),
        round(cosine(col("graft__v"), col("graft__qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Binary-quantization retrieval: 1-bit sign codes + Hamming
    * shortlist + exact cosine rerank — the coarsest point on the
    * compression curve the PQ family (n104/n116) occupies: a 64-dim
    * f32 vector (256 B) codes to 8 B of sign bits, so Hamming
    * scanning touches 32× less data than exact scoring and runs on
    * two XOR+popcount ops per candidate (both codegen'd integer
    * primitives). Standard two-stage contract (Jégou-style): the
    * Hamming top-`shortlist` is a cheap superset filter, the exact
    * rerank restores true cosine order within it. Recall follows the
    * sign-LSH collision bound (a Goemans-Williamson angle argument —
    * the n5 hyperplane family with axis-aligned planes).
    *
    * Scale shape: codes are map-only; the query's code + vector ride
    * ONE broadcast row; shortlist is a TakeOrdered (never a global
    * sort); at corpus scale the shortlist carries ids only and the
    * rerank REJOINS vectors by id (here the 64 rows carry their
    * vectors directly — candidate-sized either way). */
  def binaryHammingTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      shortlist: Int,
      k: Int): DataFrame = {
    def coded(df: DataFrame, id: String, vc: String) = df.select(
      col(id), asDouble(col(vc)).as("graft__v"),
      packSignBits(asDouble(col(vc)), 0, 32).as("graft__lo"),
      packSignBits(asDouble(col(vc)), 32, 64).as("graft__hi"))
    val q = coded(query, idCol, queryVecCol).select(
      col("graft__v").as("graft__qv"), col("graft__lo").as("graft__qlo"),
      col("graft__hi").as("graft__qhi"))
    coded(emb, idCol, vecCol)
      .crossJoin(broadcast(q))
      .select(col(idCol), col("graft__v"), col("graft__qv"),
        (call_function("bit_count",
          col("graft__lo").bitwiseXOR(col("graft__qlo"))) +
          call_function("bit_count",
            col("graft__hi").bitwiseXOR(col("graft__qhi"))))
          .cast("long").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(shortlist)
      .select(col(idCol), col("hamming"),
        round(cosine(col("graft__v"), col("graft__qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Product-quantization ADC retrieval (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split each vector
    * into `subspaces` contiguous sub-vectors, code each sub-vector as
    * its nearest codebook centroid, and score candidates against a
    * query with the Asymmetric Distance Computation trick — a
    * per-query lookup table of (subspace, code) → partial dot, so
    * scoring a coded vector is `subspaces` table lookups and adds,
    * never a decode. The compression is the 100 TB lever: a 64-dim
    * f32 vector (256 B) codes to `subspaces` bytes, so the candidate
    * set an executor can hold in memory grows ~64×.
    *
    * This implementation uses the shared deterministic ±1 codebook
    * ([[hyperplanes]], the same generator behind the IVF/LSH family)
    * and quantizes vectors to the 1e-3 integer grid, making BOTH the
    * code assignment (argmax integer dot, ties to the lower code) and
    * the ADC score exact BIGINT arithmetic — bit-reproducible at any
    * partitioning and replayable by a SQL oracle. A production index
    * trains per-subspace codebooks instead (the [[KMeans]] operator
    * slots in directly — its exact-grid discipline is the same).
    *
    * Scale shape: coding is a map-only projection; the query's LUT is
    * a 1-row broadcast; scoring is map-only adds; top-k plans as
    * TakeOrdered (k rows per partition reach the driver merge). */
  private def pqQuantize(c: Column): Column =
    transform(asDouble(c), x => floor(x * lit(1000.0)).cast("long"))

  /** The codebook as ONE array<array<long>> literal column. PQ
    * arithmetic loops over it with higher-order functions instead of
    * unrolling K×width expression terms per subspace — the unrolled
    * spelling codegen'd a 15-second first-plan cost at K=16, w=16,
    * m=4; the HOF loop plans in milliseconds and computes the same
    * exact integers. */
  private def pqCodebookLit(codebook: Seq[Seq[Int]]): Column =
    array(codebook.map(c => array(c.map(s => lit(s.toLong)): _*)): _*)

  /** Exact integer dot of the centroid `cent` (array<long>) with the
    * `width` entries of `v` starting at 1-based offset `o+1`. */
  private def pqSubDot(v: Column, o: Int, width: Int, cent: Column): Column =
    aggregate(zip_with(cent, slice(v, o + 1, width), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)

  /** Per-subspace K dot products of `v` against the whole codebook. */
  private def pqDots(
      v: Column, o: Int, width: Int, cb: Column): Column =
    transform(cb, cent => pqSubDot(v, o, width, cent))

  /** Argmax over the dot array, ties to the LOWER code:
    * array_position returns the FIRST index of the max (1-based). */
  private def pqArgmax(dots: Column): Column =
    (array_position(dots, array_max(dots)) - 1L).cast("long")

  /** The coding half: (idCol, code_0 .. code_{subspaces-1}) — the
    * index-build output a serving deployment STORES (a `subspaces`-byte
    * row standing in for the full vector; the s26 layout query writes
    * exactly this table). Map-only. */
  def pqCodes(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: Seq[Seq[Int]],
      subspaces: Int): DataFrame = {
    val width = codebook.head.size
    val cb = pqCodebookLit(codebook)
    emb.select(col(idCol), pqQuantize(col(vecCol)).as("graft__v"))
      .select(col(idCol) +: (0 until subspaces).map(m =>
        pqArgmax(pqDots(col("graft__v"), m * width, width, cb))
          .as(s"code_$m")): _*)
  }

  /** The serving half: ADC top-k over an already-coded table — the
    * query's per-subspace lookup tables broadcast as one row, scoring
    * is `subspaces` list-indexing adds per candidate, top-k plans as
    * TakeOrdered. The scan this runs over reads ONLY the code columns
    * (the ~64× I/O + memory lever vs rescanning vectors). */
  def pqAdc(
      codes: DataFrame,
      idCol: String,
      query: DataFrame,
      queryVecCol: String,
      codebook: Seq[Seq[Int]],
      subspaces: Int,
      k: Int): DataFrame = {
    val width = codebook.head.size
    val cb = pqCodebookLit(codebook)
    val q = query.select(pqQuantize(col(queryVecCol)).as("graft__qv"))
      .select((0 until subspaces).map(m =>
        pqDots(col("graft__qv"), m * width, width, cb)
          .as(s"graft__lut$m")): _*)
    codes.crossJoin(broadcast(q))
      .select(col(idCol),
        (0 until subspaces).map(m =>
          element_at(col(s"graft__lut$m"),
            (col(s"code_$m") + 1).cast("int"))).reduce(_ + _)
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  def pqTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      codebook: Seq[Seq[Int]],
      subspaces: Int,
      k: Int): DataFrame =
    pqAdc(pqCodes(emb, idCol, vecCol, codebook, subspaces),
      idCol, query, queryVecCol, codebook, subspaces, k)

  /** One distributed power-iteration step y = G·x₀ of the corpus
    * Gramian G = Σ_v v vᵀ with the all-ones start vector x₀ — the
    * first step of dominant-direction extraction (PCA top component,
    * spectral embedding-quality probes) re-expressed so the d×d matrix
    * is NEVER materialized: y_j = Σ_v v_j · (Σ_i v_i), i.e. each row
    * contributes its vector scaled by its own element sum.
    *
    * Exactness: vectors are quantized to the 1e-3 grid as BIGINTs, so
    * every product and sum is exact integer arithmetic — associative,
    * bit-reproducible at any partitioning, and replayable by a SQL
    * oracle. Overflow headroom: for unit-scale 64-dim vectors each
    * |term| ≤ 64e6, so the BIGINT sum is safe to ~1.4e11 rows; beyond
    * that, shard the sum by key range or coarsen the grid.
    *
    * Scale shape: the per-row scalar (element sum) and per-dim terms
    * are a map-only projection; the only exchange is the per-dimension
    * aggregate, which map-side partials shrink to d rows per partition
    * (the corpus never shuffles). */
  def gramPowerStep(
      emb: DataFrame,
      vecCol: String): DataFrame = {
    val qv = transform(asDouble(col(vecCol)),
      x => floor(x * lit(1000.0)).cast("long"))
    val rowSum = aggregate(col("graft__qv"), lit(0L), (a, x) => a + x)
    emb
      .select(qv.as("graft__qv"))
      .select(col("graft__qv"), rowSum.as("graft__s"))
      .select(posexplode(col("graft__qv")).as(Seq("graft__pos", "graft__q")),
        col("graft__s"))
      .groupBy((col("graft__pos") + 1).cast("long").as("dim"))
      .agg(sum(col("graft__q") * col("graft__s")).as("y"))
  }

  /** Full power iteration for the DOMINANT direction of the corpus
    * Gramian G = Σ_v v vᵀ — [[gramPowerStep]] iterated into a trainer
    * (the n119/n79/n67 loop discipline): y_{t+1} = G·y_t computed as
    * Σ_v v·(v·y_t) with the d×d matrix never materialized, then
    * RESCALED by an arithmetic right-shift so the exact BIGINT
    * arithmetic never overflows at any round count.
    *
    * Exactness: vectors quantize to the 1e-3 grid; y_t is BIGINT; the
    * per-round shift is greatest(bitlen(max|y|) − 15, 0), computed
    * WITH `length(bin(m))` (the n90 trick — no libm log), and applied
    * with an arithmetic shift (floor semantics — identical for Spark's
    * `shiftright` and DuckDB's `>>`, including negatives). Every round
    * is therefore bit-reproducible and SQL-replayable; the oracle
    * unrolls the whole loop. Post-shift |y| < 2^15, so per-row dots
    * are ≤ 64·10³·2^15 ≈ 2e9 and the dim aggregate is safe to ~4e9
    * rows per partition-free sum — far beyond any drill scale.
    *
    * Scale shape per round: y rides in as ONE broadcast d-row array;
    * the dot and the per-dim contributions are map-only; the only
    * exchange is the d-row dimension aggregate (map-side partials) and
    * a 1-row max. The y frame is checkpointed every round (d rows) so
    * plan depth stays constant. */
  def powerIteration(
      emb: DataFrame,
      vecCol: String,
      rounds: Int,
      dim: Int = 64): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val spark = emb.sparkSession
    val sc = spark.sparkContext
    val qv = transform(asDouble(col(vecCol)),
      x => floor(x * lit(1000.0)).cast("long"))
    val q = Materialize.shared(emb.select(qv.as("graft__qv")))
    import spark.implicits._
    var y = (1 to dim).map(d => (d.toLong, 1L)).toDF("dim", "y")
    var held: scala.collection.Set[Int] = Set.empty
    for (_ <- 1 to rounds) {
      // the d-row state as ONE broadcast array ordered by dim
      val yArr = y
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("y")))),
          s => s.getField("y")).as("graft__y"))
      val raw = q
        .crossJoin(broadcast(yArr))
        .select(col("graft__qv"),
          aggregate(
            zip_with(col("graft__qv"), col("graft__y"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("graft__dot"))
        .select(posexplode(col("graft__qv"))
          .as(Seq("graft__pos", "graft__q")), col("graft__dot"))
        .groupBy((col("graft__pos") + 1).cast("long").as("dim"))
        .agg(sum(col("graft__q") * col("graft__dot")).as("y"))
      val shift = raw
        .agg(greatest(
          length(bin(max(abs(col("y"))))).cast("int") - lit(15),
          lit(0)).as("graft__sh"))
      val next = raw.crossJoin(broadcast(shift))
        .select(col("dim"), expr("shiftright(y, graft__sh)").as("y"))
      val (ck, ids, _) = IterationCheckpoint.localCounted(next)
      IterationCheckpoint.release(sc, held)
      y = ck
      held = ids
    }
    y
  }

  /** MMR diversity re-rank (Carbonell & Goldstein 1998): retrieve a
    * candidate pool by relevance, then greedily pick results that
    * balance relevance against similarity to what is already picked —
    * mmr = λ·rel − (1−λ)·max_{p∈picked} sim(c, p), here λ = 0.7 on a
    * ×10 integer grid (7·rel − 3·maxSim) over the engine's round-6
    * 1e6-quantized cosines (the n130 discipline) so every round's
    * argmax is exact-integer and the oracle unrolls the whole greedy.
    * The first pick is pure relevance (empty picked set ⇒ maxSim = 0).
    *
    * Scale shape: the corpus-sized work is ONE broadcast-query scan +
    * TakeOrdered into the candidate pool; everything after — the
    * pairwise similarity table and the greedy rounds — runs on k-row
    * bounded metadata (the BpeTrainer bounded-state argument), with
    * the pool cached once via Materialize.shared. Greedy selection is
    * inherently sequential in k; keeping it as k tiny plan rounds
    * (not a driver loop over collected rows) leaves every argmax
    * distributed and ties broken identically cross-engine. */
  def mmrRerank(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      kCandidates: Int,
      kPicks: Int): DataFrame = {
    require(kPicks >= 1 && kCandidates >= kPicks,
      "need kCandidates >= kPicks >= 1")
    val qv = query.select(asDouble(col(queryVecCol)).as("graft__qv"))
    val cand = Materialize.shared(
      vecs
        .crossJoin(broadcast(qv))
        .select(col(idCol).as("graft__id"),
          asDouble(col(vecCol)).as("graft__v"),
          round(round(cosine(asDouble(col(vecCol)), col("graft__qv")), 6) *
            1000000d).cast("long").as("rel"))
        .orderBy(col("rel").desc, col("graft__id"))
        .limit(kCandidates))
    val pairs = Materialize.shared(
      cand.select(col("graft__id").as("graft__ia"), col("graft__v").as("graft__va"))
        .crossJoin(broadcast(
          cand.select(col("graft__id").as("graft__ib"),
            col("graft__v").as("graft__vb"))))
        .filter(col("graft__ia") =!= col("graft__ib"))
        .select(col("graft__ia"), col("graft__ib"),
          round(round(cosine(col("graft__va"), col("graft__vb")), 6) *
            1000000d).cast("long").as("graft__s")))
    val sc = vecs.sparkSession.sparkContext
    var picked = cand
      .orderBy(col("rel").desc, col("graft__id")).limit(1)
      .select(lit(1L).as("rank"), col("graft__id"), col("rel"),
        (col("rel") * 7).as("mmr"))
    var held: scala.collection.Set[Int] = Set.empty
    for (i <- 2 to kPicks) {
      // materialize the previous round's picks before referencing them
      // three times below (anti-join, max-sim agg, union): `scored`
      // otherwise embeds the whole recursive plan per reference, so
      // plan size and re-evaluation grow ~3^kPicks — the k-row relation
      // is bounded metadata, flattening it each round keeps every
      // round's plan one join deep (the labelPropagationTrain
      // checkpoint/release discipline; the final round's blocks are
      // swept by the runner's releaseAll)
      val (flat, ids, _) = IterationCheckpoint.localCounted(picked)
      IterationCheckpoint.release(sc, held)
      held = ids
      picked = flat
      val pickedIds = picked.select(col("graft__id").as("graft__ib"))
      val scored = cand
        .join(picked.select(col("graft__id")), Seq("graft__id"), "left_anti")
        .join(pairs.join(broadcast(pickedIds), Seq("graft__ib"))
          .groupBy(col("graft__ia").as("graft__id"))
          .agg(max(col("graft__s")).as("graft__ms")), Seq("graft__id"))
        .select(lit(i.toLong).as("rank"), col("graft__id"), col("rel"),
          (col("rel") * 7 - col("graft__ms") * 3).as("mmr"))
      picked = picked.unionByName(
        scored.orderBy(col("mmr").desc, col("graft__id")).limit(1))
    }
    picked.select(col("rank"), col("graft__id").as("doc_id"),
      col("rel"), col("mmr"))
  }
}
