package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  private val rng = new scala.util.Random(11)
  private val vecs: Seq[(Long, Seq[Float], Int)] =
    (0L until 50L).map(i => (i, Seq.fill(16)(rng.nextFloat() - 0.5f), (i % 5).toInt))

  test("topKCosine matches a driver-side brute force") {
    val df = embDf(vecs)
    val q = vecs.head._2
    val expected = vecs.tail
      .map { case (id, v, _) => id -> BigDecimal(cos(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    val got = Similarity.topKCosine(
      df.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      df.filter(col("vec_id") === 0), "embedding", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got === expected)
  }

  test("annTopK returns results from the probe bucket, ranked like brute force") {
    val df = embDf(vecs)
    val planes = Similarity.hyperplanes(3, 16)
    val got = Similarity.annTopK(
      df.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      df.filter(col("vec_id") === 0), "embedding", planes, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // every ANN hit must be a genuine cosine value (subset of brute force)
    val all = vecs.tail.map { case (id, v, _) =>
      id -> BigDecimal(cos(vecs.head._2, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got.foreach { case (id, s) => assert(math.abs(all(id) - s) < 1e-9) }
    // ranked descending
    assert(got.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("hyperplanes are deterministic and ±1") {
    val p1 = Similarity.hyperplanes(4, 16)
    val p2 = Similarity.hyperplanes(4, 16)
    assert(p1 === p2)
    assert(p1.flatten.forall(x => x == 1 || x == -1))
  }

  test("graft_cosine generates compilable codegen (no interpreter fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = spark.range(1, 4)
        .selectExpr("cast(array(id * 1.0, 0.0) as array<double>) AS v")
        .selectExpr("graft_cosine(v, cast(array(1.0, 0.0) as array<double>)) AS c")
        .collect().map(_.getDouble(0))
      // all vectors are positive multiples of (1,0) → cosine exactly 1
      assert(got.toSeq === Seq(1.0, 1.0, 1.0))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("ivfTopK searches only probed cells and ranks like brute force") {
    val df = embDf(vecs)
    // deterministic centroids: per-label means of the fixture vectors
    val centroids = vecs.groupBy(_._3).toSeq.sortBy(_._1).map { case (_, vs) =>
      val dim = vs.head._2.length
      (0 until dim).map(i => vs.map(_._2(i).toDouble).sum / vs.size)
    }
    val got = Similarity.ivfTopK(
      df.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      df.filter(col("vec_id") === 0), "embedding",
      centroids, nprobe = 3, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got.nonEmpty && got.size <= 5)
    // every hit is a genuine cosine value and ordering is descending
    val all = vecs.tail.map { case (id, v, _) =>
      id -> BigDecimal(cos(vecs.head._2, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got.foreach { case (id, s) => assert(math.abs(all(id) - s) < 1e-9) }
    assert(got.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // with ALL cells probed, IVF degenerates to exact brute force
    val exhaustive = Similarity.ivfTopK(
      df.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      df.filter(col("vec_id") === 0), "embedding",
      centroids, nprobe = centroids.size, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val brute = all.toSeq.sortBy { case (id, s) => (-s, id) }.take(5)
    assert(exhaustive === brute)
  }

  test("blockedNearDupPairs only pairs within a block, exact threshold") {
    // two near-identical vectors in block 0, one in block 1
    val v = Seq.fill(8)(0.5f)
    val almost = v.updated(0, 0.51f)
    val df = embDf(Seq((1L, v, 0), (2L, almost, 0), (3L, v, 1)))
    val pairs = Similarity.blockedNearDupPairs(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L))) // 1-3 identical but cross-block
  }

  test("semDedup drops the higher-id twin within a cell, keeps cross-cell twins") {
    val centroids = Seq(Seq.fill(8)(1.0), Seq.fill(8)(-1.0))
    val plus = Seq.fill(8)(0.5f)
    val plusTwin = plus.updated(0, 0.51f) // cos ≈ 0.9998 with plus
    val minus = Seq.fill(8)(-0.5f)
    // 4 is the same direction as 1/2 but lands in the same cell —
    // orthogonal enough to survive the 0.9 threshold
    val ortho = Seq.tabulate(8)(i => if (i < 4) 0.7f else 0.1f)
    val df = embDf(Seq(
      (1L, plus, 0), (2L, plusTwin, 0), (3L, minus, 0), (4L, ortho, 0)))
    val out = Similarity
      .semDedup(df, "vec_id", "embedding", centroids, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L)) // every id tagged
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 === 0 && byId(2L)._2 === 0 && byId(4L)._2 === 0)
    assert(byId(3L)._2 === 1) // negative direction → the other centroid
    assert(byId(1L)._3, "lowest id of the twin pair must survive")
    assert(!byId(2L)._3, "higher-id twin in the same cell must drop")
    assert(byId(3L)._3, "sole member of its cell survives")
    assert(byId(4L)._3, "below-threshold neighbor survives")
  }

  test("graft_dot generates compilable codegen (no interpreter fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = spark.range(1, 4)
        .selectExpr("cast(array(id * 2.0, 3.0) as array<double>) AS v")
        .selectExpr("graft_dot(v, cast(array(1.0, 2.0) as array<double>)) AS d")
        .collect().map(_.getDouble(0))
      assert(got.toSeq === Seq(8.0, 10.0, 12.0)) // 2i + 6
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("graft_nearest_cell: bit-identical cells to the HOF argmin, codegen compiles") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val rnd = new scala.util.Random(23)
      val rows = (0L until 200L).map { i =>
        (i, Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat), 0)
      }
      // includes an exact-tie shape: centroid 0 and 2 are identical, so
      // every row tie-breaks — the fused argmin must keep the LOWER index
      val cents = Seq(
        Seq.fill(16)(0.25), Seq.fill(16)(-0.5), Seq.fill(16)(0.25),
        (0 until 16).map(d => if (d % 2 == 0) 1.0 else -1.0))
      val df = embDf(rows).select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      val got = df.select(col("vec_id"),
        Similarity.nearestCell(col("v"), cents).as("fused"),
        Similarity.nearestCellHof(col("v"), cents).as("hof"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(got.nonEmpty)
      got.foreach { case (id, fused, hof) =>
        assert(fused === hof, s"cell mismatch for vec $id")
      }
      assert(got.forall(_._2 != 2), "ties must break to the lower index")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("probeCells ranks cells by squared distance, lower index on ties") {
    val centroids = Seq(
      Seq.fill(16)(1.0), Seq.fill(16)(-1.0),
      Seq.fill(16)(0.5), Seq.fill(16)(0.5)) // 2 and 3 tie everywhere
    val got = embDf(vecs)
      .select(col("vec_id"),
        Similarity.probeCells(
          Similarity.asDouble(col("embedding")), centroids, nprobe = 4)
          .as("probes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v, _) =>
      val byDist = centroids.zipWithIndex.map { case (c, i) =>
        (v.map(_.toDouble).zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.sorted.map(_._2)
      assert(got(id) === byDist, s"probe order for vec $id")
      // the tied pair (2, 3) must come out lower-index-first
      assert(got(id).indexOf(2) < got(id).indexOf(3))
    }
  }

  test("ivfMultiTopK at nprobe = nlist equals per-query brute force") {
    val df = embDf(vecs)
    val centroids = Similarity.hyperplanes(2, 16).map(_.map(_.toDouble))
    val queries = vecs.take(3)
    val got = Similarity.ivfMultiTopK(
      df.filter(col("vec_id") >= 3), "vec_id", "embedding",
      df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding")),
      "query_id", "embedding", centroids, nprobe = centroids.size, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    queries.foreach { case (qid, qv, _) =>
      val expected = vecs.drop(3)
        .map { case (id, v, _) => id ->
          BigDecimal(cos(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((id, s), r) => (qid, id, s, (r + 1).toLong) }
      assert(got(qid).sortBy(_._4).toSeq === expected, s"query $qid")
    }
  }

  test("ivfMultiTopK partial probe returns only probed-cell members, correctly ranked") {
    val df = embDf(vecs)
    val centroids = Similarity.hyperplanes(3, 16).map(_.map(_.toDouble))
    val got = Similarity.ivfMultiTopK(
      df.filter(col("vec_id") >= 3), "vec_id", "embedding",
      df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding")),
      "query_id", "embedding", centroids, nprobe = 2, k = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    // driver twin: per-vector cell, per-query 2-cell probe set
    def cell(v: Seq[Float]): Int =
      centroids.zipWithIndex.map { case (c, i) =>
        (v.map(_.toDouble).zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.min._2
    def probes(v: Seq[Float]): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        (v.map(_.toDouble).zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.sorted.take(2).map(_._2)
    vecs.take(3).foreach { case (qid, qv, _) =>
      val ps = probes(qv).toSet
      val members = vecs.drop(3).filter { case (_, v, _) => ps.contains(cell(v)) }
        .map(_._1).toSet
      assert(got(qid).map(_._2).toSet === members, s"probe membership, query $qid")
    }
  }

  test("semDedup: salting is plan-only — same keep set at any bucket count") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat), 0)
    }
    val centroids = Seq(Seq.fill(8)(1.0), Seq.fill(8)(-1.0))
    def run(s: Int) = Similarity
      .semDedup(embDf(rows), "vec_id", "embedding", centroids,
        threshold = 0.6, saltBuckets = s)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(run(1) === run(16), "pair set must not depend on salt buckets")
  }

  test("powerIteration: round 1 == shifted gramPowerStep; partitioning-invariant; finds the dominant axis") {
    import spark.implicits._
    // corpus concentrated on dim 2 with noise on dim 4 — the dominant
    // Gramian direction is axis 2
    val vs = Seq(
      Array(0.0f, 0.9f, 0.0f, 0.1f),
      Array(0.0f, 0.8f, 0.0f, -0.2f),
      Array(0.1f, 1.0f, 0.0f, 0.1f),
      Array(0.0f, -0.9f, 0.1f, 0.0f)) // sign flips don't change G
    val df = vs.map(Tuple1(_)).toDF("embedding")
    val raw = Similarity.gramPowerStep(df, "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = raw.values.map(math.abs).max
    val sh = math.max(java.lang.Long.toBinaryString(m).length - 15, 0)
    val one = Similarity.powerIteration(df, "embedding", rounds = 1, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === raw.map { case (k, v) => k -> (v >> sh) },
      "round 1 must be gramPowerStep followed by the documented shift")
    def run(parts: Int) = Similarity
      .powerIteration(df.repartition(parts), "embedding", rounds = 3, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val y = run(1)
    assert(y === run(3), "exact integers + deterministic shift ⇒ partition-invariant")
    assert(math.abs(y(2L)) > 2 * math.abs(y(1L)) &&
      math.abs(y(2L)) > 2 * math.abs(y(4L)),
      s"three rounds must concentrate mass on the dominant axis: $y")
  }

  test("mmrRerank diversifies where pure relevance would pick the near-dup") {
    import spark.implicits._
    // q = x-axis; a and b are the same direction (b a hair off, rel
    // ties at the 1e6 grid, id breaks to a); c is less relevant but
    // ORTHOGONAL to a. Pure top-2 by relevance = (a, b); MMR at λ=0.7
    // must pick c second: score_b = 7·8e5 − 3·1e6 = 2.6e6 <
    // score_c = 7·6e5 − 3·0 = 4.2e6.
    val vecs = Seq(
      (1L, Seq(0.8, 0.6, 0.0)),
      (2L, Seq(0.8, 0.6, 0.0001)),
      (3L, Seq(0.6, -0.8, 0.0))).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(
      vecs, "vec_id", "embedding", q, "embedding",
      kCandidates = 3, kPicks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(x => (x._1, x._2)).toSeq === Seq((1L, 1L), (2L, 3L)),
      s"expected picks a then c, got ${got.toSeq}")
    assert(got(0)._3 === 7L * 800000L && got(1)._3 === 4200000L)
  }

  test("mmrRerank stays flat-plan at larger k (the 3^k recursive-plan regression)") {
    import spark.implicits._
    // before the per-round materialization, each greedy round embedded
    // the previous `picked` plan three times, so analysis/evaluation
    // grew ~3^kPicks and k = 12 effectively hung; with the k-row picks
    // checkpointed per round this completes in seconds and returns the
    // full ranking
    val vecs = (1 to 24).map { i =>
      val a = i * 0.26
      (i.toLong, Seq(math.cos(a), math.sin(a), math.cos(2 * a) * 0.5))
    }.toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(
      vecs, "vec_id", "embedding", q, "embedding",
      kCandidates = 24, kPicks = 12).collect()
    assert(got.length === 12)
    assert(got.map(_.getLong(0)).sorted.toSeq === (1L to 12L),
      "ranks must be 1..k exactly once")
    assert(got.map(_.getLong(1)).distinct.length === 12,
      "picks must be distinct docs")
  }
}
