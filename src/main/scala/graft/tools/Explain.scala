package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: print the formatted physical plan (and optionally time) of
  * one registered query — the ".explain then iterate" loop.
  *
  * Usage: runMain graft.tools.Explain <query_name> [sfDir] [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(appName = "graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("time")) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
