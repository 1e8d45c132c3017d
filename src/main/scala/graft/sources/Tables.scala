package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Readers for the harness tables (/root/repo/TESTDATA.md).
  *
  * Parquet-only (SURVEY.md §1.3): explicit footer schemas, vectorized
  * reader, column pruning + predicate pushdown for free. The reference's
  * CSV ingest (etl.py:54-56,122-124) survives as [[graft.transform.CsvIngest]]
  * for raw bikeshare files; the engine proper speaks parquet.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    // Reader-affecting session config (timestamps as TimestampType not
    // NTZ; TIMESTAMP(NANOS) surfaced as long) is set once at session
    // construction in graft.Sessions — no conf mutation in the data path.
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
      // Spark 4 refuses to read natively — the session reads nanos as
      // long and we truncate to micros; integer `div`, a double division
      // would lose precision above 2^53 ns) and plain TIMESTAMP(MICROS)
      // (read natively). Branch on the read type so both vintages work;
      // DuckDB's CAST(ts AS TIMESTAMP) truncates nanos identically.
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        // Sanity-gated: a long ts is ASSUMED to be nanoseconds, but a
        // future vintage shipping epoch-MICROS as plain BIGINT would be
        // silently corrupted 1000x by the truncation. Corrupted values
        // land ~year 1970 (micros read as nanos) or year ~52000 (millis
        // read as nanos), so requiring the truncated timestamp to fall
        // in 1990-2100 turns that silent corruption into a loud per-row
        // failure naming the suspect vintage. One long comparison per
        // row, inside codegen — free at scan scale.
        raw.withColumn("ts", expr(
          """timestamp_micros(
            |  CASE WHEN ts IS NULL THEN NULL
            |       WHEN ts div 1000 BETWEEN 631152000000000 AND 4102444800000000
            |         THEN ts div 1000
            |       ELSE raise_error(concat(
            |         'events.ts long-vintage sanity check: ', CAST(ts AS STRING),
            |         ' does not land in 1990-2100 when read as nanoseconds; ',
            |         'a plain epoch-micros/millis BIGINT vintage would be ',
            |         'silently corrupted - inspect the parquet logical type'))
            |  END)""".stripMargin))
      else raw
    } else {
      // Same vintage defense for the date-typed columns: the generator
      // has already changed one temporal type between rounds (ts above),
      // and every consumer treats o_orderdate/l_shipdate as TIMESTAMP.
      // A DATE vintage would silently shift epoch arithmetic; normalize
      // at the read (no-op on the current TIMESTAMP(MICROS) data).
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema.fields.foldLeft(raw) { (df, f) =>
        if (f.dataType == org.apache.spark.sql.types.DateType)
          df.withColumn(f.name, col(f.name).cast("timestamp"))
        else df
      }
    }
  }
}
