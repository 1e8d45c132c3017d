package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.SkewJoin

class WarehouseSpec extends SparkTestBase {

  test("bucketed co-located join plans without exchanges") {
    import spark.implicits._
    val left = (1L to 2000L).map(i => (i, i % 7)).toDF("k", "v")
    val right = (1L to 500L).map(i => (i, s"n$i")).toDF("k2", "name")
    Warehouse.createDatabase(spark, "graft_test")
    Warehouse.stageBucketed(left, "graft_test.b_left", "k", 4)
    Warehouse.stageBucketed(right, "graft_test.b_right", "k2", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_test.b_left")
        .join(spark.table("graft_test.b_right"), col("k") === col("k2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not exchange either side:\n$plan")
      assert(joined.count() === 500L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append accumulates, overwrite replaces (S3/S4)") {
    import spark.implicits._
    val path = "target/sinks/test_append"
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b = Seq((3L, "c")).toDF("id", "v")
    Warehouse.overwrite(a, path)
    Warehouse.append(b, path)
    assert(spark.read.parquet(path).count() === 3)
    Warehouse.overwrite(b, path)
    assert(spark.read.parquet(path).count() === 1)
  }

  test("salted join equals the plain join exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // heavy skew: 80% of big-side rows share key 1
    val big = (1 to 5000).map { i =>
      (if (rng.nextDouble() < 0.8) 1L else (i % 50).toLong, i)
    }.toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("k2", "name")

    val plain = big.join(small, col("k") === col("k2"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", "k2", 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }
}
