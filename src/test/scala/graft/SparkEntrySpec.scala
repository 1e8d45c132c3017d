package graft

/** Registry integrity: the driver-contract surface itself. */
class SparkEntrySpec extends SparkTestBase {

  test("every query has a unique lowercase name and runs at sf0.001") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
    assert(names.size >= 288) // registry-loss guard (round 16, continued)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("lifecycle phase tags name real queries") {
    val missing = SparkEntry.lifecycleQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"phase tags without queries: $missing")
  }

  test("entry() (flagship star join) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("n70 split leaks no near-dup pair across splits (sf0.001)") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    try {
      val split = SparkEntry.queries("n70_leakage_safe_split")(spark, d)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // every doc assigned, to a sane distribution
      assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
      assert(split.values.count(_ == "train") > split.size / 2)
      // THE property: both ends of every near-dup pair share a split
      val pairs = SparkEntry.queries("n3_minhash_neardup")(spark, d)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty, "fixture must contain near-dups to make the test real")
      pairs.foreach { case (a, b) =>
        assert(split(a) === split(b),
          s"near-dup pair ($a,$b) split across ${split(a)}/${split(b)} — leakage")
      }
    } finally spark.catalog.clearCache()
  }

  test("every query at least plans against sf0.001 (no analysis errors)") {
    try SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, "/root/testdata/sf0.001").queryExecution.analyzed
      catch {
        case e: Throwable => fail(s"$name failed analysis: ${e.getMessage}")
      }
    } finally spark.catalog.clearCache()
  }
}
