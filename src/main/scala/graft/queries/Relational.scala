package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QuerySpec
import graft.sources.Tables

/** Shared query helpers. */
object Q {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Exact cross-engine SUM of a 2-decimal double measure: aggregate in
    * decimal (associative + exact, so partial/final agg order is
    * irrelevant), emit double. Plain double sums differ in low bits
    * between engines/partitionings and would break the hash compare.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Fixed-point twin of [[dsum]]: sum the measure as integer cents on
    * primitive longs — allocation-free inside whole-stage codegen,
    * unlike decimal aggregation which boxes a Decimal per row. The
    * result is the SAME double: both paths correctly round the
    * identical exact rational n/100 (`round` first — the raw double
    * ×100 sits a few ulps off the integer, and a bare cast would
    * truncate it wrong). Overflow-safe to ~9e16 cents under ANSI.
    */
  def centsSum(c: Column): Column =
    sum(round(c * 100).cast("long")) / 100.0

  /** Fixed-point sum of price·(1-discount) in 1e-4 units (two 2-decimal
    * factors → exact 4-decimal products on longs). */
  def centsDiscSum(price: Column, discount: Column): Column =
    sum(round(price * 100).cast("long") *
      (lit(100L) - round(discount * 100).cast("long"))) / 10000.0

  /** DuckDB twin of [[graft.operators.TextOps.hexHash60]] — the
    * portable 60-bit md5 hash (same spelling as NorthStar's hex60). */
  def hex60Sql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::UBIGINT)::BIGINT"
}

/** The reference's relational operator surface (SURVEY.md §2) re-expressed
  * as Spark-first queries over the harness tables, each with a DuckDB
  * oracle twin. Reference sites cited per query.
  */
object Relational {
  import Q._

  val all: Seq[QuerySpec] = Seq(

    // ----- S1/S2: scan + projection with pushed filter ------------------
    // Reference: CSV scans at etl.py:54-56,122-124; ours is a parquet scan
    // where both the filter and the 3-column projection reach the reader.
    QuerySpec(
      "s1_scan_project",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 10") {
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") < 10)
          .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    // ----- S5: in-memory literal seed table -----------------------------
    // Reference: NOAA WT weather-type catalog built from literal rows
    // (etl.py:142-163 — ids 1..19, 21, 22). Descriptions paraphrased
    // from the public GHCN-Daily documentation (WT01..WT22 codes).
    QuerySpec(
      "s5_seed_weather_type",
      "SELECT * FROM (VALUES " +
        WeatherTypeCatalog.rows
          .map { case (i, s) => s"($i, '${s.replace("'", "''")}')" }
          .mkString(", ") +
        ") AS t(weather_type_id, description)") { (s, _) =>
      WeatherTypeCatalog.df(s)
    },

    // ----- S7/U2: series generation — the hourly datetime spine ---------
    // Reference: generate_series via spark.range at etl.py:8-24,184 plus
    // calendar widening at etl.py:186-192. Divergence (SURVEY.md §7.5):
    // inclusive full leap year (8,784 hours), not the end-exclusive 8,760.
    // Computed calendar parts emitted as BIGINT on both sides.
    QuerySpec(
      "s7_datetime_spine",
      """SELECT ts AS date_hour,
        |  hour(ts) AS hour, day(ts) AS day, weekofyear(ts) AS week,
        |  month(ts) AS month, dayofweek(ts) + 1 AS weekday,
        |  year(ts) AS year, quarter(ts) AS quarter
        |FROM generate_series(TIMESTAMP '2020-01-01 00:00:00',
        |  TIMESTAMP '2020-12-31 23:00:00', INTERVAL 1 HOUR) t(ts)""".stripMargin) {
      (s, _) =>
        graft.transform.DatetimeSpine.hourly(s, "2020-01-01", "2021-01-01")
    },

    // ----- F1: project + rename -----------------------------------------
    // Reference: station projections etl.py:61-64,69-72.
    QuerySpec(
      "f1_project_rename",
      "SELECT c_custkey AS cust_id, c_name AS name, c_acctbal AS balance FROM customer") {
      (s, d) =>
        t(s, d, "customer").select(
          col("c_custkey").as("cust_id"),
          col("c_name").as("name"),
          col("c_acctbal").as("balance"))
    },

    // ----- F2-F5 + D1 + D3: the trip-clean compound ---------------------
    // Reference: subtract(same-station && duration<300) at etl.py:58.
    // The subtracted set is a subset of the left side and all columns are
    // non-null, so EXCEPT ≡ negated-filter + distinct — one scan and one
    // shuffle instead of the two-scan EXCEPT (the round-1 plan shuffled
    // both sides on all 16 columns). except() remains the right tool only
    // when the right side is a genuinely different relation.
    QuerySpec(
      "d1_except_clean",
      """SELECT * FROM lineitem
        |EXCEPT
        |SELECT * FROM lineitem
        |WHERE l_returnflag = l_linestatus AND l_quantity < 5""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem")
          .filter(!(col("l_returnflag") === col("l_linestatus") &&
            col("l_quantity") < 5))
          .distinct()
    },

    // ----- F5: null predicate -------------------------------------------
    // Reference: bikeid non-null filter etl.py:64-65,72-73. The testdata
    // has no nulls, so a derived nullable column exercises the operator.
    QuerySpec(
      "f5_null_filter",
      """SELECT o_orderkey, o_orderstatus
        |FROM orders WHERE nullif(o_orderstatus, 'O') IS NOT NULL""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .filter(nullif(col("o_orderstatus"), lit("O")).isNotNull)
          .select("o_orderkey", "o_orderstatus")
    },

    // ----- F6/F7: derived columns + casts -------------------------------
    // Reference: withColumn + cast chains at etl.py:19,23,91-93,174-177.
    // epoch seconds via ts→long cast; cents via floor (truncating double→
    // long casts round differently across engines, floor is IEEE-stable).
    QuerySpec(
      "f6_derive_cast",
      """SELECT o_orderkey,
        |  CAST(floor(epoch_us(o_orderdate) / 1000000) AS BIGINT) AS epoch_s,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        col("o_orderdate").cast("long").as("epoch_s"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    },

    // ----- D2: union + distinct -----------------------------------------
    // Reference: start ∪ end station ids at etl.py:76,103.
    QuerySpec(
      "d2_union_distinct",
      "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier") {
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()
    },

    // ----- D5: intersect (engine completeness; reference has none) ------
    QuerySpec(
      "d5_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
    },

    // ----- U4: pivot (long→wide; the inverse of U1) ---------------------
    // Explicit pivot values pin the output schema; empty cells are NULL
    // on both sides (count over no rows vs sum over no matches).
    QuerySpec(
      "u4_pivot",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS "O"
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
    },

    // ----- A7: rollup (hierarchical subtotals) --------------------------
    QuerySpec(
      "a7_rollup",
      """SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
        |  count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .rollup(
            year(col("o_orderdate")).cast("long").as("year"),
            month(col("o_orderdate")).cast("long").as("month"))
          .agg(count(lit(1)).as("n"))
    },

    // ----- A8: grouping sets (via the spark.sql surface) ----------------
    // Exercises the SQL entry point over registered views — the engine
    // speaks both DataFrame and SQL (SURVEY §3.3).
    QuerySpec(
      "a8_grouping_sets",
      """SELECT year(o_orderdate) AS year, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
        |                        (year(o_orderdate)), ())""".stripMargin) {
      (s, d) =>
        t(s, d, "orders").createOrReplaceTempView("graft__orders")
        s.sql(
          """SELECT year(o_orderdate) AS year, o_orderstatus, count(*) AS n
            |FROM graft__orders
            |GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
            |                        (year(o_orderdate)), ())""".stripMargin)
          .withColumn("year", col("year").cast("long"))
    },

    // ----- F11: LIKE pattern filter -------------------------------------
    QuerySpec(
      "f11_like_filter",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority LIKE '%URGENT%'
        |  AND o_orderpriority NOT LIKE '2%'""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderpriority").like("%URGENT%") &&
          !col("o_orderpriority").like("2%"))
        .select("o_orderkey", "o_orderpriority")
    },

    // ----- F10: null-safe equality (<=> / IS NOT DISTINCT FROM) ---------
    QuerySpec(
      "f10_null_safe_eq",
      """SELECT o_orderkey,
        |  (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM
        |   nullif(o_orderpriority, '1-URGENT')) AS same_nullness
        |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        (nullif(col("o_orderstatus"), lit("O")) <=>
          nullif(col("o_orderpriority"), lit("1-URGENT"))).as("same_nullness"))
    },

    // ----- X12: date arithmetic pack ------------------------------------
    QuerySpec(
      "x12_date_arith",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus_3m"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since"))
    },

    // ----- W4: RANGE-frame rolling window (per-entity trailing hour) ----
    // Event-time range frames (not row counts) — the per-user trailing
    // feature window of a streaming feature store, expressed in batch.
    QuerySpec(
      "w4_range_frame",
      """WITH e AS (SELECT event_id, user_id,
        |             CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000) AS BIGINT) AS es
        |           FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY es
        |                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM e""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .withColumn("es", unix_timestamp(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(
            Window.partitionBy(col("user_id")).orderBy(col("es"))
              .rangeBetween(-3600, Window.currentRow)).as("n_last_hour"))
    },

    // ----- X13: conditional + regex scalar pack -------------------------
    QuerySpec(
      "x13_conditional_regex",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'large'
        |       WHEN o_totalprice > 100000 THEN 'medium'
        |       ELSE 'small' END AS size_band,
        |  greatest(o_orderkey, o_custkey) AS gkey,
        |  least(o_orderkey, o_custkey) AS lkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |  regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num
        |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "large")
          .when(col("o_totalprice") > 100000, "medium")
          .otherwise("small").as("size_band"),
        greatest(col("o_orderkey"), col("o_custkey")).as("gkey"),
        least(col("o_orderkey"), col("o_custkey")).as("lkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_or_open"),
        regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).as("prio_num"))
    },

    // ----- X15: map functions (dynamic-key model) -----------------------
    // n7 parses props with a FIXED struct schema; MapType is the other
    // JSON model — keys unknown at plan time (feature bags, A/B flags).
    // from_json to map<string,long>, then the map-function family:
    // lookup, cardinality, key enumeration, transform_values, probe of
    // an absent key. All per-row and codegen'd — map-only at any scale.
    // Lookups go through try_element_at so an absent key (or a NULL map
    // from malformed props) yields NULL under ANSI instead of throwing,
    // and the absent-key probe is computed on BOTH sides (the oracle
    // used to hardcode FALSE) with NULL maps pinned to false — the
    // twins stay semantically parallel under any testdata change.
    QuerySpec(
      "x15_map_funcs",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  array_to_string(json_keys(props), ',') AS key_list,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled,
        |  coalesce(json_extract(props, '$.missing') IS NOT NULL, FALSE)
        |    AS has_missing
        |FROM events""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType)).as("graft__m"))
        .select(col("event_id"),
          try_element_at(col("graft__m"), lit("k")).as("k_val"),
          size(col("graft__m")).cast("long").as("n_keys"),
          array_join(map_keys(col("graft__m")), ",").as("key_list"),
          try_element_at(
            transform_values(col("graft__m"), (_, v) => v * 2L), lit("k"))
            .as("k_doubled"),
          coalesce(map_contains_key(col("graft__m"), "missing"), lit(false))
            .as("has_missing"))
    },

    // ----- X16: order-independent table checksum ------------------------
    // The replication/reconciliation primitive — see TableChecksum for
    // the full contract. Two commutative folds of the per-row 60-bit md5
    // residue: a two-level modular sum (bucketed, overflow-safe to
    // ~7e13 rows vs the single-level form's 8.6e9) and a bit_xor (exact
    // at any row count; even-multiplicity-blind, which the sum covers).
    // Fields coalesce to '\N' before concatenation on BOTH engines —
    // concat_ws skips NULLs while SQL '||' nulls the row out, so an
    // un-sentineled checksum drifts on the first nullable column.
    // Doubles pinned as integer cents — cross-engine float formatting
    // is exactly the divergence a checksum must not inherit. Map-only,
    // then an 8192-group fold, then a 1-row fold.
    QuerySpec(
      "x16_table_checksum",
      s"""WITH h AS (
         |  SELECT ${hex60Sql(
               "coalesce(CAST(l_orderkey AS VARCHAR), '\\N') || '|' || " +
               "coalesce(CAST(l_linenumber AS VARCHAR), '\\N') || '|' || " +
               "coalesce(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR), '\\N')")} AS h
         |  FROM lineitem),
         |b AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(h % 1000000007) % 1000000007 AS BIGINT) AS bs,
         |    bit_xor(h) AS bx
         |  FROM h GROUP BY h % 8192)
         |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
         |  CAST(sum(bs) % 1000000007 AS BIGINT) AS checksum_sum,
         |  CAST(bit_xor(bx) AS BIGINT) AS checksum_xor
         |FROM b""".stripMargin) { (s, d) =>
      graft.operators.TableChecksum.checksum(
        t(s, d, "lineitem"),
        graft.operators.TableChecksum.serialized(Seq(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_quantity") * 100).cast("long"))))
    },

    // ----- A9: cube (all subtotal combinations) -------------------------
    QuerySpec(
      "a9_cube",
      """SELECT year(o_orderdate) AS year, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (year(o_orderdate), o_orderstatus)""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .cube(
            year(col("o_orderdate")).cast("long").as("year"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
    },

    // ----- X11: string-function pack ------------------------------------
    QuerySpec(
      "x11_string_funcs",
      """SELECT c_custkey,
        |  upper(c_name) AS name_u,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  replace(c_name, '#', '-') AS dashed,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  substr(c_name, 1, 8) AS prefix
        |FROM customer""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_u"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
        expr("replace(c_name, '#', '-')").as("dashed"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"))
    },

    // ----- U1: unpivot / melt (wide→long) -------------------------------
    // Reference: WT-flag melt at etl.py:107-118 (driver loop replaced by
    // the native unpivot — single scan, no per-column pass).
    QuerySpec(
      "u1_unpivot",
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem").unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
    },

    // ----- F9/X9 + U1: flag unpivot with trim + suffix parse ------------
    // Reference: per-WT-column driver loop with row.strip()=="1" and
    // int(name[-2:]) (etl.py:107-118) → one native unpivot, a trim
    // filter, and a substring cast. Flags synthesized from orders so the
    // padded-whitespace matching has a DuckDB oracle.
    QuerySpec(
      "f9_flag_unpivot",
      """WITH f AS (SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'O' THEN '1 ' ELSE '' END AS wt01,
        |    CASE WHEN o_orderstatus = 'F' THEN ' 1' ELSE '' END AS wt02,
        |    CASE WHEN o_orderpriority LIKE '1%' THEN '1' ELSE '' END AS wt03
        |  FROM orders),
        |u AS (
        |  SELECT o_orderkey, 'wt01' AS wt_name, wt01 AS flag FROM f
        |  UNION ALL SELECT o_orderkey, 'wt02', wt02 FROM f
        |  UNION ALL SELECT o_orderkey, 'wt03', wt03 FROM f)
        |SELECT o_orderkey, CAST(substr(wt_name, 3, 2) AS INT) AS flag_id
        |FROM u WHERE trim(flag) = '1'""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", "1 ").otherwise("").as("wt01"),
          when(col("o_orderstatus") === "F", " 1").otherwise("").as("wt02"),
          when(col("o_orderpriority").startsWith("1"), "1").otherwise("").as("wt03"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("wt01"), col("wt02"), col("wt03")), "wt_name", "flag")
        .filter(trim(col("flag")) === "1")
        .select(col("o_orderkey"),
          substring(col("wt_name"), 3, 2).cast("int").as("flag_id"))
    },

    // ----- J1: star equi-join + grouped agg -----------------------------
    // Reference: schema-implied star joins (create_tables.sql:12-16,24-44;
    // README.md:56-63). Small dims broadcast — no shuffle of the fact side
    // beyond the final group-by.
    QuerySpec(
      "j1_star_join",
      """SELECT r_name, year(o_orderdate) AS year, month(o_orderdate) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, year, month""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(
          col("r_name"),
          year(col("o_orderdate")).cast("long").as("year"),
          month(col("o_orderdate")).cast("long").as("month"))
        .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("revenue"))
    },

    // ----- J2: multi-condition LEFT equi-join ---------------------------
    // Reference: sql_queries.py:13-19 (3-condition left join). No
    // broadcast hint: part scales with the data (~200k rows/sf), so a
    // hard hint would OOM at 100× — AQE broadcasts it while it is small
    // and falls back to shuffle join when it grows. (The nation/region
    // hints elsewhere are fine: those tables are constant-size.)
    QuerySpec(
      "j2_left_join_multi",
      """SELECT l_returnflag, count(p_partkey) AS matched, count(*) AS total
        |FROM lineitem LEFT JOIN part
        |  ON l_partkey = p_partkey AND l_quantity < p_size
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .join(
          t(s, d, "part"),
          col("l_partkey") === col("p_partkey") && col("l_quantity") < col("p_size"),
          "left")
        .groupBy(col("l_returnflag"))
        .agg(count(col("p_partkey")).as("matched"), count(lit(1)).as("total"))
    },

    // ----- J3: bridge-table join (1-to-many chain) ----------------------
    // Reference: weather_fact → date_with_weather_type → weather_type
    // (create_tables.sql:12-16, etl.py:165-168).
    QuerySpec(
      "j3_bridge_join",
      """SELECT r_name, n_name, count(*) AS n_cust
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, d) =>
      broadcast(t(s, d, "region"))
        .join(broadcast(t(s, d, "nation")), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
    },

    // ----- J4/J5: semi + anti joins (EXISTS / NOT EXISTS) ---------------
    // Query-time idioms over the star FKs (SURVEY.md §2.3).
    QuerySpec(
      "j4_semi_join",
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders WHERE EXISTS
        |  (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(
          t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    },
    QuerySpec(
      "j5_anti_join",
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders WHERE NOT EXISTS
        |  (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(
          t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    },

    // ----- J6: salted join (skew mitigation, result-identical) ----------
    // The salted plan must produce exactly the plain join's rows — the
    // oracle is the unsalted join, so correctness of the salting
    // machinery is what's being checked.
    QuerySpec(
      "j6_salted_join",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      graft.operators.SkewJoin
        .saltedInnerJoin(
          t(s, d, "lineitem"), t(s, d, "orders"),
          "l_orderkey", "o_orderkey", saltFactor = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), centsSum(col("l_quantity")).as("qty"))
    },

    // ----- J8: full outer join (snapshot reconciliation) ----------------
    // The reconciliation shape warehouse diffing needs and no other
    // join covers: two snapshots of the same table (here: orders keys
    // ≢0 mod 3 vs even keys, the overlap repriced +5) compared in ONE
    // pass — rows only in A, only in B, or in both, classified with a
    // null-probe CASE. Full outer cannot broadcast either side (both
    // preserve unmatched rows), so the sort-merge on the key IS the
    // right 100 TB plan; the interesting part is what it avoids: the
    // naive A-anti-B ∪ B-anti-A ∪ A-semi-B spelling scans and
    // shuffles each snapshot three times, this one once.
    QuerySpec(
      "j8_full_outer",
      """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders
        |           WHERE o_orderkey % 3 <> 0),
        |b AS (SELECT o_orderkey, o_totalprice + 5.0 AS o_totalprice
        |      FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT
        |  CASE WHEN b.o_orderkey IS NULL THEN 'only_a'
        |       WHEN a.o_orderkey IS NULL THEN 'only_b'
        |       ELSE 'both' END AS presence,
        |  count(*) AS n,
        |  CAST(sum(CAST(coalesce(b.o_totalprice, a.o_totalprice)
        |    AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      val a = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey").as("a_key"), col("o_totalprice").as("a_price"))
      val b = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("b_key"),
          (col("o_totalprice") + 5.0).as("b_price"))
      a.join(b, col("a_key") === col("b_key"), "full_outer")
        .select(
          when(col("b_key").isNull, "only_a")
            .when(col("a_key").isNull, "only_b")
            .otherwise("both").as("presence"),
          coalesce(col("b_price"), col("a_price")).as("graft__price"))
        .groupBy(col("presence"))
        .agg(count(lit(1)).as("n"), dsum(col("graft__price")).as("total"))
    },

    // ----- J7: range join (value → tier band lookup) --------------------
    // Non-equi join against a tiny banded dimension: broadcast the
    // bands so the range probe is a broadcast nested-loop over 3 rows,
    // not a shuffle — the right plan when the band table is O(10) and
    // the fact side is the 100 TB one.
    QuerySpec(
      "j7_range_join",
      """SELECT tier, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 250.0),
        |             ('high', 250.0, 1000.0)) AS t(tier, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY tier""".stripMargin) { (s, d) =>
      import s.implicits._
      val tiers = Seq(
        ("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 1000.0))
        .toDF("tier", "lo", "hi")
      t(s, d, "events")
        .join(broadcast(tiers),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    },

    // ----- A1/A2: data-quality probes ------------------------------------
    // Reference: data_quality.py:5-6 count + null-key gates; strict ==0
    // semantics per SURVEY.md §7.5.
    QuerySpec(
      "a1_count",
      "SELECT count(*) AS n FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
    },
    QuerySpec(
      "a2_null_probe",
      "SELECT count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_null FROM lineitem") {
      (s, d) =>
        t(s, d, "lineitem")
          .agg(count(when(col("l_orderkey").isNull, 1)).as("n_null"))
    },

    // ----- A10: observed in-flight quality metrics ----------------------
    // The zero-extra-pass form of a1/a2: the SAME gate aggregates, but
    // as Dataset.observe accumulators riding the action the pipeline
    // already runs (here a noop sink standing in for the real write) —
    // at 100 TB a separate metrics scan is a whole job, so telemetry
    // must piggyback. The returned row is BUILT FROM the observed
    // metrics, so the oracle hash-checks that the accumulator path
    // yields exactly what a dedicated aggregation query would — the
    // contract that makes observe trustworthy as a quality gate. The
    // single local row is metadata, not data (no collect of rows).
    QuerySpec(
      "a10_observed_gate",
      """SELECT count(*) AS n_rows,
        |  CAST(count(l_suppkey) AS BIGINT) AS n_nonnull_key,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS measure_sum
        |FROM lineitem WHERE l_quantity > 10""".stripMargin) { (s, d) =>
      val (df, obs) = graft.quality.QualityChecks.observed(
        t(s, d, "lineitem").filter(col("l_quantity") > 10),
        keyCol = "l_suppkey", measureCol = "l_quantity")
      df.write.format("noop").mode("overwrite").save()
      val m = obs.get
      // build via explicit Row/schema, not a tuple: sum over zero rows
      // observes NULL, and asInstanceOf[Double] would silently unbox
      // that to 0.0 while the oracle emits NULL — the exact class of
      // cross-engine drift this gate exists to catch
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      s.createDataFrame(
        java.util.List.of(
          Row(m("n_rows"), m("n_nonnull_key"), m("measure_sum"))),
        StructType(Seq(
          StructField("n_rows", LongType, nullable = false),
          StructField("n_nonnull_key", LongType, nullable = false),
          StructField("measure_sum", DoubleType, nullable = true))))
    },

    // ----- A3: grouped counts (trips per month/year) --------------------
    // Reference: README.md:59 "total trips monthly and yearly".
    QuerySpec(
      "a3_group_count",
      """SELECT year(o_orderdate) AS year, month(o_orderdate) AS month, count(*) AS n
        |FROM orders GROUP BY year, month""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("year"),
          month(col("o_orderdate")).cast("long").as("month"))
        .agg(count(lit(1)).as("n"))
    },

    // ----- A4: grouped sums (TPC-H Q1 shape; ride-hours README.md:61) ----
    // Exact aggregation on fixed-point longs (centsSum): identical
    // doubles to the decimal oracle, but primitive codegen arithmetic —
    // no per-row Decimal boxing on the hottest aggregate. avg as
    // exact-sum / count (IEEE-deterministic across engines).
    QuerySpec(
      "a4_group_sum",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          centsSum(col("l_quantity")).as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_base_price"),
          centsDiscSum(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          (centsSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ----- A5: top group (highest-trip month, README.md:62) -------------
    QuerySpec(
      "a5_top_month",
      """SELECT year(o_orderdate) AS year, month(o_orderdate) AS month, count(*) AS n
        |FROM orders GROUP BY year, month
        |ORDER BY n DESC, year, month LIMIT 1""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("year"),
          month(col("o_orderdate")).cast("long").as("month"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("year"), col("month"))
        .limit(1)
    },

    // ----- A6: distinct aggregation -------------------------------------
    QuerySpec(
      "a6_count_distinct",
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
    },

    // ----- X1/X2: timestamp format round-trip ---------------------------
    // Reference: to_timestamp(date_format(...)) second-truncation at
    // etl.py:92-93; ours keeps the semantics via an explicit round-trip.
    QuerySpec(
      "x1_timestamp_roundtrip",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_rt
        |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        to_timestamp(
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("ts_rt"))
    },

    // ----- X6: md5 surrogate key ----------------------------------------
    // Reference: md5(a || b) at sql_queries.py:4.
    QuerySpec(
      "x6_md5_key",
      """SELECT l_orderkey, l_linenumber,
        |  md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR) AS row_md5
        |FROM lineitem""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        md5(concat(
          col("l_orderkey").cast("string"), lit("|"),
          col("l_linenumber").cast("string"))).as("row_md5"))
    },

    // ----- X7: epoch-millis ↔ timestamp ---------------------------------
    // Reference: TIMESTAMP 'epoch' + ts/1000 * interval '1 second' at
    // sql_queries.py:13 → native timestamp_millis/unix_millis.
    QuerySpec(
      "x7_epoch_millis",
      """SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
        |  epoch_ms(epoch_ms(CAST(ts AS TIMESTAMP))) AS ts_ms
        |FROM events""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        unix_millis(col("ts")).as("ms"),
        timestamp_millis(unix_millis(col("ts"))).as("ts_ms"))
    },

    // ----- O1: global sort + limit --------------------------------------
    // Query-time top-N (SURVEY.md §2.8); unique tiebreak for determinism.
    QuerySpec(
      "o1_sort_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ----- W1: deterministic surrogate key via row_number ----------------
    // Replaces monotonically_increasing_id (etl.py:91) per SURVEY.md §7.5.
    // Scale-safe form: range-partitioned local numbering + per-partition
    // offsets (SurrogateKey) instead of a global single-partition window.
    QuerySpec(
      "w1_row_number",
      """SELECT c_custkey,
        |  row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
        |FROM customer""".stripMargin) { (s, d) =>
      graft.operators.SurrogateKey
        .denseRowNumber(
          t(s, d, "customer").select(col("c_custkey"), col("c_acctbal")),
          "rn", col("c_acctbal").desc, col("c_custkey"))
        .select(col("c_custkey"), col("rn"))
    },

    // ----- W2: partitioned running aggregate ----------------------------
    // The testdata's lineitem is NOT keyed by (l_orderkey,
    // l_linenumber) — sf0.1 carries 118k duplicate pairs, and one
    // collides on the full (suppkey, shipdate, orderkey, linenumber)
    // prefix with DIFFERENT quantities, so that ordering alone is not
    // total and the two engines may disagree on one prefix sum (found
    // by the 10× sf0.1 sweep; sf0.01 has no colliding pair). Appending
    // l_quantity as the last key restores determinism without needing
    // a unique id: any rows still tied contribute EQUAL quantities, so
    // every prefix sum is order-independent.
    QuerySpec(
      "w2_running_sum",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // fixed-point long cents in the window frame (see Q.centsSum) —
      // same doubles as the decimal oracle, no per-row Decimal boxing
      t(s, d, "lineitem").select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        (sum(round(col("l_quantity") * 100).cast("long")).over(w) / 100.0)
          .as("running_qty"))
    },

    // ----- W3: rank within group ----------------------------------------
    QuerySpec(
      "w3_rank_in_group",
      """SELECT p_brand, p_partkey, p_retailprice,
        |  rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |FROM part""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(
          Window.partitionBy(col("p_brand"))
            .orderBy(col("p_retailprice").desc, col("p_partkey")))
          .cast("long").as("rnk"))
    },

    // ----- W6: forward fill (gap-filled time series) --------------------
    // The sensor/metrics gap-fill every time-series warehouse needs:
    // carry each user's last known reading forward across gaps —
    // last(value) IGNORE NULLS over an unbounded-preceding frame, the
    // one window family (null-skipping navigation) w1-w5 don't touch.
    // Gaps are planted deterministically (views report no value) so
    // every partition exercises both fill and leading-null. Per-user
    // partitioned window — no global sort; the ORDER BY key
    // (ts, event_id) is total within a partition, so the fill is
    // deterministic.
    QuerySpec(
      "w6_forward_fill",
      """SELECT event_id, user_id, ts,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS filled
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
        |      FROM events)""".stripMargin) { (s, d) =>
      val win = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "view", lit(null).cast("double"))
            .otherwise(col("value")).as("graft__v"))
        .select(col("event_id"), col("user_id"), col("ts"),
          last(col("graft__v"), ignoreNulls = true).over(win).as("filled"))
    },

    // ----- W5: navigation/distribution window pack ----------------------
    // The remaining window-function families in one partitioned pass:
    // lag/lead (navigation), ntile (distribution bucketing — the
    // length-balanced shard assignment shape), percent_rank/cume_dist
    // (exact small-integer ratios, bit-identical doubles; rounded like
    // the cosine queries for belt-and-braces), first_value. One window
    // spec → one sort per partition, no per-function re-shuffle; the
    // ORDER BY key is unique within each partition so every function is
    // deterministic.
    QuerySpec(
      "w5_window_funcs",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER win AS prev_ok,
        |  lead(o_orderkey) OVER win AS next_ok,
        |  ntile(4) OVER win AS quartile,
        |  round(percent_rank() OVER win, 6) AS pr,
        |  round(cume_dist() OVER win, 6) AS cd,
        |  first_value(o_orderkey) OVER win AS first_ok
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin) {
      (s, d) =>
        val win = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(win).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(win).as("next_ok"),
          ntile(4).over(win).cast("long").as("quartile"),
          round(percent_rank().over(win), 6).as("pr"),
          round(cume_dist().over(win), 6).as("cd"),
          first_value(col("o_orderkey")).over(win).as("first_ok"))
    })
}

/** NOAA GHCN-Daily WT weather-type catalog (etl.py:142-163 semantics;
  * descriptions paraphrased from the public GHCN-Daily readme WT codes).
  */
object WeatherTypeCatalog {
  val rows: Seq[(Int, String)] = Seq(
    1 -> "Fog or ice fog",
    2 -> "Heavy fog",
    3 -> "Thunder",
    4 -> "Ice pellets or sleet",
    5 -> "Hail",
    6 -> "Glaze or rime",
    7 -> "Dust or blowing sand",
    8 -> "Smoke or haze",
    9 -> "Blowing or drifting snow",
    10 -> "Tornado or funnel cloud",
    11 -> "High or damaging winds",
    12 -> "Blowing spray",
    13 -> "Mist",
    14 -> "Drizzle",
    15 -> "Freezing drizzle",
    16 -> "Rain",
    17 -> "Freezing rain",
    18 -> "Snow or snow pellets",
    19 -> "Unknown precipitation",
    21 -> "Ground fog",
    22 -> "Ice fog or freezing fog")

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF("weather_type_id", "description")
  }
}
