package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{NorthStar, Relational, Sinks}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator (SURVEY.md §2 + north-star §7.4) registers a
  * [[QuerySpec]] in one of the packs below; this object is only assembly.
  */
object SparkEntry {
  private def packs: Seq[QuerySpec] =
    Relational.all ++ Sinks.all ++ NorthStar.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join monthly rollup (J1+A3 — the reference's headline
    * "trips per month per region" question, README.md:56-63). */
  def entry(spark: SparkSession): DataFrame =
    packs.find(_.name == "j1_star_join").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
