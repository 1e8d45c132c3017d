package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark program plus (when SQL-expressible)
  * a DuckDB oracle twin over the same parquet tables.
  *
  * Column names must match between `run`'s output and `oracle` — the
  * harness sorts columns by name before hashing values (builder contract).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"bad query name: $name")
}

object QuerySpec {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}
