package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupOperatorsSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shinglesFromTokens: word 3-grams, distinct, short-doc guard") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x y z x y z x y z").toDF("text")
      .withColumn("ws", TextOps.tokens(col("text")))
      .select(TextOps.shinglesFromTokens(col("ws"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) === Set("a b c", "b c d"))
    assert(got(1) === Set.empty[String]) // shorter than n → empty, not desc-sequence
    assert(got(2) === Set("x y z", "y z x", "z x y")) // distinct collapses repeats
  }

  test("MinHash LSH finds planted near-dup pairs with exact Jaccard") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"w$i").mkString(" ") + " w99"
    val unrelated = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated))

    val pairs = MinHashNearDup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length === 1)
    val (a, b, j) = pairs.head
    assert((a, b) === (1L, 2L))
    // exact Jaccard of the shingle sets: each doc has 58 shingles and
    // only the final shingle differs → intersection 57, union 59
    assert(math.abs(j - 57.0 / 59.0) < 1e-12)
  }

  test("MinHash: staged materializer matches the cached variant") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"w$i").mkString(" ") + " w99"
    val unrelated = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated))

    def run(m: MinHashNearDup.Materializer) =
      MinHashNearDup.nearDupPairs(docs, "doc_id", "text", 0.5, materialize = m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    graft.warehouse.Warehouse.createDatabase(spark, "graft_test")
    val staged = run(MinHashNearDup.stagedMaterializer("graft_test.mh_"))
    assert(staged === run(MinHashNearDup.cacheMaterializer))
    // the staging tables were really written through the catalog
    assert(spark.catalog.tableExists("graft_test.mh_shingled"))
    assert(spark.catalog.tableExists("graft_test.mh_sketches"))
  }

  test("MinHash: disjoint docs produce no candidate pairs") {
    val docs = docsDf(Seq(
      1L -> (1 to 40).map(i => s"a$i").mkString(" "),
      2L -> (1 to 40).map(i => s"b$i").mkString(" ")))
    assert(MinHashNearDup.nearDupPairs(docs, "doc_id", "text", 0.1).count() === 0)
  }

  test("SimHash: identical docs get identical hashes; near-dups small hamming") {
    val base = (1 to 50).map(i => s"t$i").mkString(" ")
    val docs = docsDf(Seq(
      1L -> base,
      2L -> base,
      3L -> (base + " extra"),
      4L -> (200 to 260).map(i => s"z$i").mkString(" ")))
    val h = SimHash.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 3)
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 3)

    val pairs = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("graft_simhash_of generates compilable codegen (no interpreter fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = spark.range(1, 3)
        .selectExpr("array(concat('w', id), 'x', 'x', cast(null as string)) AS ws")
        .selectExpr("graft_simhash_of(ws) AS h")
        .collect().map(_.getLong(0))
      assert(got(0) !== got(1), "different word sets, different simhashes")
      assert(got.forall(h => h >= 0L && h < (1L << 60)))
      // all-null / empty word arrays: zero votes → simhash 0 (callers
      // filter empty token arrays; the expression must stay total)
      val zero = spark
        .sql("SELECT graft_simhash_of(cast(array() as array<string>)) AS h")
        .collect()(0).getLong(0)
      assert(zero === 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("n59 line dedup: survivors globally unique, cover every distinct input line") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("n59_line_dedup")(spark, sf).collect()
    // re-split outputs into 8-token blocks — alignment survives because
    // every kept block except a doc's final one is exactly 8 tokens
    val outLines = out.flatMap { r =>
      r.getAs[String]("clean_text").split(" ").grouped(8).map(_.mkString(" "))
    }
    assert(outLines.length === outLines.distinct.length)
    val inDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).grouped(8).map(_.mkString(" ")).toSeq)
    val inLines = inDocs.flatMap(_._2)
    assert(outLines.sorted.toSeq === inLines.distinct.sorted.toSeq)
    val kept = out.map(_.getAs[Long]("n_kept")).sum
    val dropped = out.map(_.getAs[Long]("n_dropped")).sum
    assert(kept === outLines.length.toLong)
    // docs that lost EVERY line are absent from the output — their
    // lines count toward the corpus total but not kept+dropped
    val outDocs = out.map(_.getAs[Long]("doc_id")).toSet
    val vanished = inDocs.filterNot(d => outDocs(d._1)).map(_._2.length.toLong).sum
    assert(kept + dropped + vanished === inLines.length.toLong)
    assert(vanished === 0L || inDocs.filterNot(d => outDocs(d._1))
      .forall(_._2.forall(outLines.contains)),
      "every vanished doc's lines must survive in some earlier doc")
  }

  test("TextOps: portable hash & counts match reference values") {
    import spark.implicits._
    val r = Seq("the cat and the hat").toDF("text").select(
      TextOps.nTokens(col("text")).as("nt"),
      TextOps.matchCount(col("text"), "\\bthe\\b").as("the_n"),
      TextOps.hexHash60(lit("hello")).as("h"))
      .head
    assert(r.getLong(0) === 5)
    assert(r.getLong(1) === 2)
    // ('0x' || substr(md5('hello'),1,15))::UBIGINT — verified in DuckDB
    assert(r.getLong(2) === 419982666956583591L)
  }
}
