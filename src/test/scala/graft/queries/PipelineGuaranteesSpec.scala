package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Semantic guarantees of the round-9 pipeline queries, checked on the
  * REAL testdata (sf0.001) — properties the DuckDB hash compare proves
  * only implicitly, asserted here as explicit invariants so a future
  * edit that keeps both engines wrong-in-the-same-way still fails.
  */
class PipelineGuaranteesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("n96 waterfill: allocation is feasible, capped, and budget-bounded") {
    val rows = q("n96_budget_waterfill").collect()
    val avail = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("avail")).toMap
    val alloc = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("allocated")).toMap
    val take1 = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("take1")).toMap
    val budget = avail.values.sum * 9 / 10
    // never allocate more than a language has
    alloc.foreach { case (l, a) => assert(a <= avail(l), s"$l over-allocated") }
    // round 2 only grows allocations
    take1.foreach { case (l, t) => assert(alloc(l) >= t, s"$l shrank") }
    // total inside the budget (floor arithmetic may leave small slack)
    assert(alloc.values.sum <= budget, "budget exceeded")
    assert(alloc.values.sum >= (budget * 95) / 100,
      s"allocator left >5% of the budget unspent: ${alloc.values.sum} of $budget")
    // the skewed corpus must make the mechanism BIND: someone capped,
    // someone grew past the fair share
    assert(alloc.exists { case (l, a) => a == avail(l) }, "no language capped")
    assert(alloc.exists { case (l, a) => a > take1(l) },
      "surplus was never redistributed")
  }

  test("n95 fuzzy decontam: flags exactly the docs with a >=0.8-Jaccard bench twin") {
    // driver-side exact twin over the same corpus: 3-shingle sets per
    // doc, cross-set Jaccard vs every src0 doc
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val bench = docs.filter(_._2 == "src0").map { case (id, _, t) => id -> shingles(t) }
    val corp = docs.filter(_._2 != "src0").map { case (id, _, t) => id -> shingles(t) }
    val expected = corp.flatMap { case (cid, cs) =>
      val hits = bench.flatMap { case (bid, bs) =>
        val i = (cs & bs).size
        val j = i.toDouble / (cs.size + bs.size - i)
        if (j >= 0.8) Some((bid, j)) else None
      }
      if (hits.isEmpty) None
      else Some(cid -> hits.maxBy { case (bid, j) => (j, -bid) })
    }.toMap
    val got = q("n95_fuzzy_decontam").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === expected.keySet,
      s"flag set mismatch: got ${got.keySet}, expected ${expected.keySet}")
    got.foreach { case (cid, (bid, j)) =>
      assert(bid === expected(cid)._1, s"best match for $cid")
      assert(math.abs(j - expected(cid)._2) < 1e-9, s"jaccard for $cid")
    }
    assert(expected.nonEmpty, "test corpus must contain planted near-dups")
  }
}
