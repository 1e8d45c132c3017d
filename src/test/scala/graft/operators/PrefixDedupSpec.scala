package graft.operators

import graft.SparkTestBase

class PrefixDedupSpec extends SparkTestBase {

  import spark.implicits._

  // every text ≥ 32 chars so the default block key applies (operator
  // contract: corpus min length >= blockLen)
  private val pad = "0123456789abcdef0123456789abcdef" // 32 chars

  private def pairs(rows: Seq[(Long, String)]) =
    PrefixDedup.prefixPairs(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("strict prefixes pair up; equal texts and non-prefixes do not") {
    val rows = Seq(
      1L -> s"$pad hello world",
      2L -> s"$pad hello world and more trailing text",
      3L -> s"$pad hello world", // exact dup of 1 — NOT a strict prefix
      4L -> s"$pad completely different body")
    val got = pairs(rows)
    assert(got.keySet === Set(
      (1L, 2L), (3L, 2L))) // both copies are prefixes of the longer doc
    assert(got((1L, 2L)) === (44L, 67L))
  }

  test("same 32-char block but diverging later is rejected by the verify") {
    val rows = Seq(
      1L -> s"$pad shared then APPLE",
      2L -> s"$pad shared then ORANGE and longer")
    assert(pairs(rows).isEmpty)
  }

  test("chains report every prefix relation, not just adjacent ones") {
    val rows = Seq(
      1L -> s"$pad a",
      2L -> s"$pad a b",
      3L -> s"$pad a b c")
    assert(pairs(rows).keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
