package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: time one registered query N times in a single session
  * (cache cleared between runs, like Bench) to separate steady-state
  * operator cost from session/codegen warmup.
  *
  * Usage: runMain graft.tools.Profile <query_name>[,<query_name>...] [sfDir] [n]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    def known = SparkEntry.queries.keys.toSeq.sorted.mkString(", ")
    if (args.isEmpty) {
      System.err.println(
        "usage: Profile <query>[,<query>...] [sfDir] [n]\nqueries: " + known)
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}\nqueries: " + known)
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 4
    val spark = Sessions.local(appName = "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[profile] $name: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
