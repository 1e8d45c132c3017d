package graft

/** Registry integrity: the driver-contract surface itself. */
class SparkEntrySpec extends SparkTestBase {

  test("every query has a unique lowercase name and runs at sf0.001") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
    assert(names.size >= 56)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() (flagship star join) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
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
