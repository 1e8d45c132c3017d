package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.warehouse.Warehouse

/** Sink/warehouse operator queries (SURVEY.md §2.1 S3/S4/S8/S9): each
  * performs a REAL write (parquet path or catalog table) and returns a
  * read-back aggregate the DuckDB oracle reproduces from the source
  * table — proving round-trip fidelity, append/overwrite semantics and
  * catalog DDL, not just the transform.
  *
  * Writes go under target/sinks and the session warehouse dir
  * (target/warehouse); every query starts with an overwrite or DROP so
  * re-runs are deterministic. Writers are distributed (one file per
  * task — no coalesce funnel).
  */
object Sinks {
  import Q._

  private val base = "target/sinks"

  val all: Seq[QuerySpec] = Seq(

    // ----- S3: append sink (etl.py:101-102 month-append, done right) ----
    // Overwrite half the rows, append the other half, read the union
    // back. Partitioned by the rollup key so the read-back prunes.
    QuerySpec(
      "s3_sink_append",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val path = s"$base/s3_append"
      Warehouse.overwrite(
        orders.filter(col("o_orderkey") % 2 === 0), path, Seq("o_orderstatus"))
      Warehouse.append(
        orders.filter(col("o_orderkey") % 2 === 1), path, Seq("o_orderstatus"))
      s.read.parquet(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    // ----- S4: overwrite sink (etl.py:105,178-180; last-write-wins) -----
    QuerySpec(
      "s4_sink_overwrite",
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem WHERE l_quantity <= 25 GROUP BY l_returnflag""".stripMargin) {
      (s, d) =>
        // projection before the writes: overwrite semantics are what is
        // under test, not 16-column write throughput
        val li = t(s, d, "lineitem").select("l_returnflag", "l_quantity")
        val path = s"$base/s4_overwrite"
        Warehouse.overwrite(li, path)
        Warehouse.overwrite(li.filter(col("l_quantity") <= 25), path)
        s.read.parquet(path)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"))
    },

    // ----- S2: string-typed CSV scan (etl.py:122-124) -------------------
    // Real CSV round-trip: write orders as CSV with the reference's
    // timestamp format (etl.py:101), read back string-typed (every
    // column StringType), push the casts into a select — the weather
    // path's exact mechanism, verified against the parquet source.
    QuerySpec(
      "s2_csv_scan",
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS price,
        |  CAST(o_orderdate AS TIMESTAMP) AS order_ts
        |FROM orders""".stripMargin) { (s, d) =>
      val path = s"$base/s2_csv"
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
      graft.transform.CsvIngest.csvStringTyped(s, path)
        .select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          col("o_totalprice").cast("double").as("price"),
          to_timestamp(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_ts"))
    },

    // ----- S8: warehouse staging (stage_redshift.py DELETE+COPY) --------
    QuerySpec(
      "s8_warehouse_stage",
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
        |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      Warehouse.createDatabase(s, "graft")
      Warehouse.stage(t(s, d, "customer"), "graft.s8_customer")
      s.table("graft.s8_customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("balance"))
    },

    // ----- S10: bucketed tables + co-located join -----------------------
    // Both tables bucketed 8× on the join key: the join needs NO
    // exchange of either side — the bucketing IS the shuffle, paid once
    // at write time and amortized over every subsequent join. This is
    // the 100 TB co-location strategy (WarehouseSpec asserts the
    // exchange-free plan).
    QuerySpec(
      "s10_bucketed_join",
      """SELECT o_orderstatus, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      Warehouse.createDatabase(s, "graft")
      Warehouse.stageBucketed(
        t(s, d, "lineitem").select("l_orderkey", "l_quantity"),
        "graft.s10_lineitem", "l_orderkey", 8)
      Warehouse.stageBucketed(
        t(s, d, "orders").select("o_orderkey", "o_orderstatus"),
        "graft.s10_orders", "o_orderkey", 8)
      s.table("graft.s10_lineitem")
        .join(s.table("graft.s10_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    },

    // ----- S11: upsert / MERGE (load_fact.py DELETE-then-INSERT) --------
    // Updates (10% of orders, repriced by an exact +1000.00 — additive
    // so both engines transform identical doubles identically, no
    // rounding boundary) win over base rows per key; the
    // oracle reproduces the merge with a QUALIFY over the same union.
    QuerySpec(
      "s11_upsert",
      """SELECT o_orderkey, o_totalprice, src FROM (
        |  SELECT o_orderkey, o_totalprice, src,
        |    row_number() OVER (PARTITION BY o_orderkey ORDER BY prec DESC) AS rn
        |  FROM (
        |    SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
        |           'update' AS src, 1 AS prec
        |    FROM orders WHERE o_orderkey % 10 = 0
        |    UNION ALL
        |    SELECT o_orderkey, o_totalprice, 'base' AS src, 0 AS prec
        |    FROM orders))
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), lit("base").as("src"))
      val updates = t(s, d, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          lit("update").as("src"))
      Warehouse.upsert(orders, updates,
        keyCols = Seq("o_orderkey"), order = Seq("src"))
    },

    // ----- S12: sorted layout + predicate-pruned scan -------------------
    // Staged sorted by the filter key: range partitioning + in-file
    // sort cluster key ranges so the predicate below skips row groups
    // via parquet min/max stats (and the filter is pushed to the scan).
    QuerySpec(
      "s12_sorted_scan",
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin) {
      (s, d) =>
        Warehouse.createDatabase(s, "graft")
        Warehouse.stageSorted(
          t(s, d, "lineitem").select("l_orderkey", "l_quantity"),
          "graft.s12_lineitem", "l_orderkey")
        s.table("graft.s12_lineitem")
          .filter(col("l_orderkey").between(1000, 2000))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    },

    // ----- S13: catalog partition pruning (etl.py:53-54 done right) -----
    // Staged partitionBy(o_orderstatus): a predicate on the partition
    // key is resolved against the catalog's directory listing at
    // planning time (PartitionFilters in the scan — WarehouseSpec
    // asserts it), so non-matching partitions are never opened. This is
    // the reference's manual per-month file naming as a first-class
    // catalog feature; at 100 TB it is the difference between reading
    // one month and listing-then-skipping twelve.
    QuerySpec(
      "s13_partition_prune",
      """SELECT o_orderkey, o_totalprice
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      Warehouse.createDatabase(s, "graft")
      Warehouse.stage(
        t(s, d, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus"),
        "graft.s13_orders", partitionBy = Seq("o_orderstatus"))
      s.table("graft.s13_orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // ----- S9: DDL + INSERT (create_tables.sql / load_dimension.py) -----
    QuerySpec(
      "s9_ddl_catalog",
      "SELECT r_regionkey, r_name FROM region") { (s, d) =>
      Warehouse.createDatabase(s, "graft")
      Warehouse.dropTable(s, "graft.s9_region")
      Warehouse.createTable(s, "graft.s9_region", "r_regionkey INT, r_name STRING")
      t(s, d, "region").createOrReplaceTempView("graft__s9_src")
      s.sql("INSERT INTO graft.s9_region SELECT r_regionkey, r_name FROM graft__s9_src")
      s.table("graft.s9_region").select(col("r_regionkey"), col("r_name"))
    },

    // ----- S14: JSON-lines source round-trip ----------------------------
    // The other ubiquitous ingest format (raw crawl/event feeds ship as
    // JSONL). Write → read back with an EXPLICIT schema — schema
    // inference is a full extra pass over the data plus a driver-side
    // merge, unacceptable at 100 TB, and silently types every absent
    // batch differently; a production reader always pins the schema —
    // then aggregate, proving value fidelity against the parquet
    // source of truth.
    QuerySpec(
      "s14_jsonl_roundtrip",
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      val path = s"$base/s14_jsonl"
      t(s, d, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").json(path)
      s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .json(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("chars"),
          countDistinct(col("source")).as("n_sources"))
    },

    // ----- S15: ORC source round-trip -----------------------------------
    // The other columnar format Spark ships natively (warehouse
    // migrations routinely read legacy ORC). Same discipline as the
    // parquet path: the post-roundtrip filter and projection reach the
    // ORC reader (ORC carries min/max stripe stats like parquet row
    // groups), proving the scan path — not just the codec — works.
    QuerySpec(
      "s15_orc_roundtrip",
      """SELECT source, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE n_chars > 100 GROUP BY source""".stripMargin) {
      (s, d) =>
        val path = s"$base/s15_orc"
        t(s, d, "documents")
          .select("doc_id", "source", "n_chars")
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .filter(col("n_chars") > 100)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    },

    // ----- s16: Avro source/sink round-trip -----------------------------
    // Same contract as s15 for the bundled row-major format (Spark 4
    // ships sql/avro in-core, though this build's service registry omits
    // the short name — the public connector class is addressed
    // directly): write a projection to Avro, read it back, aggregate —
    // proving schema round-trip. Avro is row-major, so unlike
    // parquet/ORC the filter does not push to the reader; it stays a
    // post-scan Filter, the honest shape for this format.
    QuerySpec(
      "s16_avro_roundtrip",
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE n_chars > 100 GROUP BY lang""".stripMargin) {
      (s, d) =>
        val path = s"$base/s16_avro"
        val avro = "org.apache.spark.sql.avro.AvroFileFormat"
        t(s, d, "documents")
          .select("doc_id", "lang", "n_chars")
          .write.mode("overwrite").format(avro).save(path)
        s.read.format(avro).load(path)
          .filter(col("n_chars") > 100)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    },

    // ----- s17: XML source/sink round-trip ------------------------------
    // Spark 4's built-in XML connector (SPARK-44265): write one <doc>
    // element per row under a <docs> root, read back with the same
    // rowTag and an EXPLICIT schema (inference is a second full pass —
    // wrong default at scale), aggregate. Proves the semi-structured
    // ingest path end to end.
    QuerySpec(
      "s17_xml_roundtrip",
      """SELECT source, count(*) AS n,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      val path = s"$base/s17_xml"
      t(s, d, "documents")
        .select("doc_id", "source", "n_chars")
        .write.mode("overwrite")
        .option("rootTag", "docs").option("rowTag", "doc")
        .format("xml").save(path)
      s.read
        .schema("doc_id BIGINT, source STRING, n_chars BIGINT")
        .option("rowTag", "doc")
        .format("xml").load(path)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), max(col("n_chars")).as("max_chars"))
    },

    // ----- s18: SCD type-2 merge (history-keeping dimension upsert) -----
    // s11 is the type-1 merge (last write wins); warehouses also need
    // the history-keeping form: an update CLOSES the key's current row
    // (valid_to := effective ts) and becomes the new open row, so every
    // balance is queryable as-of any date. Repriced keys end with TWO
    // rows, untouched keys with one open row. The +500.00 delta is
    // additive-exact (s11's determinism argument). Cost tracks the
    // update batch, not accumulated history — see Warehouse.scd2Merge.
    QuerySpec(
      "s18_scd2_merge",
      """WITH base AS (
        |  SELECT c_custkey, c_acctbal,
        |    TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_acctbal + 500.0 AS c_acctbal,
        |    TIMESTAMP '2024-06-01 00:00:00' AS valid_from
        |  FROM customer WHERE c_custkey % 2 = 1)
        |SELECT b.c_custkey, b.c_acctbal, b.valid_from,
        |  CASE WHEN u.c_custkey IS NOT NULL
        |       THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to
        |FROM base b LEFT JOIN upd u ON b.c_custkey = u.c_custkey
        |UNION ALL
        |SELECT c_custkey, c_acctbal, valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to
        |FROM upd""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer")
      val base = cust.select(
        col("c_custkey"), col("c_acctbal"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val updates = cust
        .filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"),
          (col("c_acctbal") + 500.0).as("c_acctbal"),
          lit("2024-06-01 00:00:00").cast("timestamp").as("valid_from"))
      Warehouse.scd2Merge(base, updates, Seq("c_custkey"))
    },

    // ----- s19: small-file compaction (warehouse maintenance) -----------
    // The maintenance op every streaming/append warehouse needs: a
    // table fragmented into many small files (here: a 64-way scatter,
    // the worst case a micro-batch writer produces) is rewritten as a
    // few LARGE files range-clustered on the scan key —
    // repartitionByRange + sortWithinPartitions, so the output is
    // globally range-ordered without any single-task funnel (each of
    // the 4 writers sorts only its range; at 100 TB you'd size the
    // range count to ~1 GB files). Content fidelity is the oracle
    // (byte-identical rows); SinksSpec asserts the file count actually
    // dropped and the per-file key ranges are disjoint — the properties
    // compaction exists to deliver.
    QuerySpec(
      "s19_compact",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem") { (s, d) =>
      val small = s"$base/s19_small"
      val path = s"$base/s19_compacted"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .repartition(64)
        .write.mode("overwrite").parquet(small)
      s.read.parquet(small)
        .repartitionByRange(4, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    },

    // ----- s20: z-order clustered layout (two-key scan pruning) ---------
    // s12 sorts on ONE key — a filter on any other key reads every
    // file. Z-order (operators/ZOrder) interleaves two keys' bits so
    // every file gets a narrow min/max envelope on BOTH — the standard
    // multi-dimensional layout (Delta/Iceberg OPTIMIZE ZORDER BY).
    // The query filters on the SECOND key after the round-trip —
    // content fidelity is the oracle; WarehouseSpec measures the
    // envelope narrowing that makes the layout worth paying for.
    QuerySpec(
      "s20_zorder_scan",
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 300""".stripMargin) { (s, d) =>
      val path = s"$base/s20_zorder"
      graft.operators.ZOrder.cluster(
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_quantity"),
        path, "l_orderkey", "l_partkey", nFiles = 8)
      s.read.parquet(path)
        .filter(col("l_partkey").between(100, 300))
        .select("l_orderkey", "l_partkey", "l_quantity")
    },

    // ----- s22: schema-evolution read (mergeSchema) ---------------------
    // The warehouse reality dynamic overwrite (s21) doesn't cover: a
    // long-lived table whose WRITER gained a column mid-life. Batch 1
    // lands without n_chars, batch 2 with it; a mergeSchema read
    // reconciles the union schema and old rows surface NULL — no
    // rewrite of historical files (at 100 TB, rewriting history for a
    // new column is the anti-pattern this exists to avoid). Filter
    // pushdown still reaches both file generations. Spark leaves
    // mergeSchema off by default because footer-merging every file
    // costs a driver pass — turning it on per-read (not per-session)
    // is the deliberate choice here.
    QuerySpec(
      "s22_schema_evolution",
      """SELECT lang,
        |  count(*) AS n,
        |  CAST(count(n_chars) AS BIGINT) AS n_with_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM (
        |  SELECT lang, CAST(NULL AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1)
        |GROUP BY lang""".stripMargin) { (s, d) =>
      val path = s"$base/s22_evolving"
      val docs = t(s, d, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang")
        .write.mode("overwrite").parquet(path)
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "n_chars")
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          count(col("n_chars")).as("n_with_chars"),
          sum(col("n_chars")).as("chars"))
    },

    // ----- s21: dynamic partition overwrite (incremental reload) --------
    // The incremental-load primitive s4's static overwrite can't
    // express: a batch that recomputes SOME partitions replaces
    // exactly the partitions it contains and leaves the rest
    // untouched (Spark's partitionOverwriteMode=dynamic, set per-write
    // so the session default stays static). Here the initial load
    // lands all statuses; the reload batch carries only the 'F'
    // partition (half its rows, repriced) — after the write, 'F' is
    // the batch and 'O'/'P' are the original files, which is what the
    // oracle reconstructs. At 100 TB this is the difference between
    // rewriting one day's partition and rewriting the table; both
    // writes are distributed and partition-pruned on read (s13).
    QuerySpec(
      "s21_dynamic_overwrite",
      """WITH batch AS (
        |  SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice,
        |         o_orderstatus
        |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderstatus <> 'F'
        |  UNION ALL SELECT * FROM batch)
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      val path = s"$base/s21_dynamic"
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      orders.write.mode("overwrite")
        .partitionBy("o_orderstatus").parquet(path)
      orders
        .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus").parquet(path)
      s.read.parquet(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    // ----- s24: incremental aggregate maintenance (MV delta refresh) ----
    // The most common warehouse maintenance job there is: a summary
    // table refreshed by MERGING a new batch's partial aggregates,
    // never rescanning history. COUNT and SUM are self-mergeable when
    // the summary stores them as partials (sum of sums, sum of
    // counts) — the same associativity Spark's own partial aggregation
    // relies on, lifted to the storage layer. Here the pre-1996
    // history is summarized and WRITTEN, then the 1996+ delta's
    // partials union-merge with the STORED summary: the refresh reads
    // the summary file (groups, not rows) plus only the delta rows
    // (date filter pushed to the orders scan — plan-pinned), and the
    // oracle proves merged == full recompute. Money is exact integer
    // cents (partials must be associative — double sums are not).
    QuerySpec(
      "s24_incremental_agg",
      """SELECT o_orderstatus,
        |  CAST(year(o_orderdate) AS BIGINT) AS year,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val path = s"$base/s24_summary"
      val cutoff = "1996-01-01"
      def partials(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_orderstatus"),
          year(col("o_orderdate")).cast("long").as("year"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      val orders = t(s, d, "orders")
        .select("o_orderstatus", "o_orderdate", "o_totalprice")
      // the stored summary: history already aggregated away
      partials(orders.filter(col("o_orderdate") < lit(cutoff)))
        .write.mode("overwrite").parquet(path)
      // the refresh: stored groups + delta partials, one merge agg
      s.read.parquet(path)
        .unionByName(partials(orders.filter(col("o_orderdate") >= lit(cutoff))))
        .groupBy(col("o_orderstatus"), col("year"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("total_cents")).as("total_cents"))
    },

    // ----- s27: retention vacuum (lifecycle / compliance) ----------------
    // "Keep the last N days" as a PHYSICAL operation: the events fact
    // lands partitioned by day, the vacuum deletes every partition
    // directory older than the retention threshold (a metadata-sized
    // directory walk — no data read, no tombstones on the read path),
    // and the read-back proves exactly the retained days remain. The
    // threshold is config in production; here it derives
    // deterministically from the data (min day + 10) via a
    // metadata-sized 1-row aggregate so the oracle can replay it.
    QuerySpec(
      "s27_retention_vacuum",
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
        |  count(*) AS n
        |FROM events
        |WHERE CAST(ts AS DATE) >=
        |  (SELECT min(CAST(ts AS DATE)) + INTERVAL 10 DAY FROM events)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val path = s"$base/s27_retention"
      val ev = t(s, d, "events")
        .select(col("event_id"), col("ts"),
          col("ts").cast("date").cast("string").as("event_date"))
      ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
      val keepFrom = ev
        .agg(date_add(min(col("ts").cast("date")), 10).cast("string")
          .as("graft__from"))
        .head().getString(0)
      Warehouse.retentionVacuum(s, path, "event_date", keepFrom)
      // partition-column type inference reads the dir value back as a
      // DATE; the report column is the ISO day string
      s.read.parquet(path)
        .groupBy(col("event_date").cast("string").as("event_date"))
        .agg(count(lit(1)).as("n"))
    },

    // ----- s36: CDC change-stream apply (Debezium-style landing) --------
    // A change log with op codes and per-key sequence numbers lands on
    // the customer snapshot: deletes (k%10=0), a double update where
    // only the later seq may win (k%10=1), delete-then-reinsert within
    // one batch (k%10=2 — the latest op must win, not the delete), and
    // brand-new keys arriving as inserts (k%10=3). The applied table is
    // WRITTEN and read back (Sinks discipline); the oracle replays
    // compaction (row_number over seq DESC) + full-outer apply in SQL.
    QuerySpec(
      "s36_cdc_apply",
      """WITH base AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                     c_acctbal AS bal FROM customer),
        |chg AS (
        |  SELECT k, CAST(1 AS BIGINT) AS seq, 'D' AS op, seg, bal
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL SELECT k, 1, 'U', seg, bal + 100.0 FROM base WHERE k % 10 = 1
        |  UNION ALL SELECT k, 2, 'U', seg, bal + 500.0 FROM base WHERE k % 10 = 1
        |  UNION ALL SELECT k, 1, 'D', seg, bal FROM base WHERE k % 10 = 2
        |  UNION ALL SELECT k, 2, 'I', 'REBORN', 0.0 FROM base WHERE k % 10 = 2
        |  UNION ALL SELECT k + 1000000, 1, 'I', 'FRESH', k / 100.0
        |  FROM base WHERE k % 10 = 3),
        |latest AS (SELECT k, op, seg, bal FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM chg) WHERE rn = 1),
        |applied AS (
        |  SELECT coalesce(l.k, b.k) AS k,
        |    CASE WHEN l.op IS NOT NULL THEN l.seg ELSE b.seg END AS seg,
        |    CASE WHEN l.op IS NOT NULL THEN l.bal ELSE b.bal END AS bal
        |  FROM base b FULL OUTER JOIN latest l ON b.k = l.k
        |  WHERE l.op IS NULL OR l.op <> 'D')
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS balance
        |FROM applied GROUP BY seg""".stripMargin) { (s, d) =>
      val snap = t(s, d, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
      val k = col("k")
      def part(m: Int) = snap.filter(k % 10 === m)
      val chg = Seq(
        part(0).select(k, lit(1L).as("seq"), lit("D").as("op"),
          col("seg"), col("bal")),
        part(1).select(k, lit(1L).as("seq"), lit("U").as("op"),
          col("seg"), (col("bal") + 100.0).as("bal")),
        part(1).select(k, lit(2L).as("seq"), lit("U").as("op"),
          col("seg"), (col("bal") + 500.0).as("bal")),
        part(2).select(k, lit(1L).as("seq"), lit("D").as("op"),
          col("seg"), col("bal")),
        part(2).select(k, lit(2L).as("seq"), lit("I").as("op"),
          lit("REBORN").as("seg"), lit(0.0).as("bal")),
        part(3).select((k + 1000000L).as("k"), lit(1L).as("seq"),
          lit("I").as("op"), lit("FRESH").as("seg"),
          (k / lit(100.0)).as("bal"))
      ).reduce(_ unionByName _)
      val path = s"$base/s36_cdc"
      Warehouse.overwrite(
        Warehouse.cdcApply(snap, chg, Seq("k"), "seq", "op"), path)
      s.read.parquet(path)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), dsum(col("bal")).as("balance"))
    },

    // ----- s38: zone-map manifest file skipping -------------------------
    // The Delta/Iceberg file-skipping index as a first-class table: the
    // fact lands range-clustered (8 files, disjoint key envelopes), a
    // per-file min/max manifest is built in one narrow scan, and the
    // range query consults the MANIFEST first — only envelope-
    // overlapping files are handed to the scan (WarehouseSpec pins the
    // file count). s12 showed row-group pruning INSIDE files; this is
    // the layer above it: skipping whole files from metadata, the way a
    // 100 TB table avoids even opening cold objects.
    QuerySpec(
      "s38_zonemap_scan",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_orderkey BETWEEN 5000 AND 9000
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val path = s"$base/s38_zonemap"
      t(s, d, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(path)
      val manifest = Warehouse.zoneMapManifest(s, path, "l_orderkey")
      Warehouse.zoneMapRead(s, path, manifest, "l_orderkey", 5000L, 9000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    },

    // ----- s39: per-file Bloom manifest (needle lookup, unclustered key) --
    // s38's zone maps only prune on the CLUSTERING key — a point probe
    // on any other high-cardinality column overlaps every file's
    // envelope and reads the whole table. The Bloom manifest is the
    // layer for that case (Parquet's bloom_filter / Delta file stats):
    // orders land date-clustered, the probe is a single o_orderkey
    // needle, and the per-file Blooms prune to the one file holding it
    // (+ rare false positives, re-verified by the pushed exact filter —
    // WarehouseSpec pins the file count and the no-false-negative law).
    // The probed key is plan-time metadata (max orderkey — the s23/s25
    // one-row .head() derivation), so the oracle can name the same row.
    QuerySpec(
      "s39_bloom_manifest",
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders)"""
        .stripMargin) { (s, d) =>
      val path = s"$base/s39_bloom"
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
      orders
        .repartitionByRange(8, col("o_orderdate"), col("o_orderkey"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(path)
      val manifest =
        Warehouse.bloomManifest(s, path, "o_orderkey", 262144, 7)
      val key = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      Warehouse.bloomPointRead(s, path, manifest, "o_orderkey", key, 262144, 7)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").as("total"))
    })
}
