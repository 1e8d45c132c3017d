package graft

import org.apache.spark.sql.SparkSession

/** Single place where engine sessions are configured — reader-affecting
  * settings live here, not inside the data path (no `spark.conf.set` in
  * readers; see Tables).
  *
  * - shuffle partitions sized to local cores (32 on the harness box; a
  *   real cluster would size to 2-3× total cores or rely on AQE
  *   coalescing, which is on by default in Spark 4).
  * - session TZ pinned UTC so timestamp↔epoch casts match DuckDB.
  * - parquet timestamps read as TimestampType (not NTZ); TIMESTAMP(NANOS)
  *   columns surface as long for compatibility with the nanos vintage of
  *   events.ts (Tables truncates to micros when it sees the long form —
  *   a no-op config for micros-vintage data).
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def local(threads: String = cpus, appName: String = "graft"): SparkSession =
    SparkSession
      .builder()
      .appName(appName)
      .withExtensions(graft.functions.GraftFunctions.register)
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .getOrCreate()
}
