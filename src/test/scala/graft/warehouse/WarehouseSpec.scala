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

  test("salt spreads fully identical rows of a hot key") {
    import spark.implicits._
    // the degenerate case: N copies of ONE row (null-key / bot-payload
    // shape) — a row-content-only salt sends all of them to one bucket
    val factor = 8
    val hot = Seq.fill(400)((1L, "same-payload")).toDF("k", "payload")
    val salts = hot
      .select(SkewJoin.saltColumn(hot, factor).as("salt"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size === factor,
      s"identical rows must cover all $factor salt buckets, got $salts")
    assert(salts.forall(s => s >= 0 && s < factor))
  }

  test("partition-key filter prunes partitions at planning time (S13)") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"m${i % 6}")).toDF("id", "month")
    Warehouse.createDatabase(spark, "graft_test")
    Warehouse.stage(df, "graft_test.part_fact", partitionBy = Seq("month"))

    val q = spark.table("graft_test.part_fact").filter(col("month") === "m3")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // the month predicate must be a PartitionFilter (catalog/directory
    // pruning), not a post-scan data filter
    assert(scan.partitionFilters.map(_.sql).mkString(" ").contains("month"),
      s"expected month in PartitionFilters, got: ${scan.partitionFilters}")
    assert(q.collect().length === 50)
    // and the executed scan must have opened only the m3 directory's
    // files, not the whole table
    val totalFiles = spark.table("graft_test.part_fact").inputFiles.length
    assert(scan.metrics("numFiles").value < totalFiles,
      s"pruned scan read ${scan.metrics("numFiles").value} of $totalFiles files")
  }

  test("scd2Merge keeps full history and is repeatable batch over batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: String) = lit(s).cast("timestamp")
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .withColumn("valid_from", ts("2024-01-01 00:00:00"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val upd1 = Seq((1L, 11.0)).toDF("k", "v")
      .withColumn("valid_from", ts("2024-02-01 00:00:00"))
    val upd2 = Seq((1L, 12.0)).toDF("k", "v")
      .withColumn("valid_from", ts("2024-03-01 00:00:00"))
    val v2 = Warehouse.scd2Merge(
      Warehouse.scd2Merge(base, upd1, Seq("k")), upd2, Seq("k"))
    val rows = v2.orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getTimestamp(3)).map(_.toString).orNull))
    // key 1: three versions, each closed by the next, last open;
    // key 2: untouched single open row — history never rewritten
    assert(rows.toSeq === Seq(
      (1L, 10.0, "2024-02-01 00:00:00.0"),
      (1L, 11.0, "2024-03-01 00:00:00.0"),
      (1L, 12.0, null),
      (2L, 20.0, null)))
    // as-of query: exactly one valid version per key at any instant
    val asOf = v2.filter(
      col("valid_from") <= ts("2024-02-15 00:00:00") &&
        (col("valid_to").isNull || col("valid_to") > ts("2024-02-15 00:00:00")))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(asOf === Map(1L -> 11.0, 2L -> 20.0))
  }

  test("s19 compaction: few files, disjoint per-file key ranges, content intact (S19)") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val small = "target/test-sinks/compact_small"
    val out = "target/test-sinks/compact_out"
    val df = (1L to 10000L).map(i => (i % 997, i)).toDF("k", "v")
    df.repartition(64).write.mode("overwrite").parquet(small)
    assert(Files.list(Paths.get(small)).iterator().asScala
      .count(_.toString.endsWith(".parquet")) > 16, "fragmentation precondition")
    spark.read.parquet(small)
      .repartitionByRange(4, col("k"))
      .sortWithinPartitions(col("k"), col("v"))
      .write.mode("overwrite").parquet(out)
    val files = Files.list(Paths.get(out)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    assert(files.length <= 4, s"compaction produced ${files.length} files")
    // disjoint ranges: each file's [min(k), max(k)] must not overlap
    // another's — the property that lets parquet min/max stats prune
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $ranges")
      case _ => ()
    }
    // content survives byte-for-byte
    assert(spark.read.parquet(out).except(df).isEmpty &&
      df.except(spark.read.parquet(out)).isEmpty)
  }

  test("s21 dynamic partition overwrite rewrites only the batch's partitions (S21)") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = "target/test-sinks/dyn_overwrite"
    val init = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0), (4L, "C", 4.0))
      .toDF("id", "p", "v")
    init.write.mode("overwrite").partitionBy("p").parquet(path)
    def filesOf(part: String): Set[String] =
      Files.list(Paths.get(s"$path/p=$part")).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val aBefore = filesOf("A")
    val batch = Seq((9L, "B", 30.0)).toDF("id", "p", "v")
    batch.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p").parquet(path)
    // untouched partitions keep their exact files; B is replaced wholesale
    assert(filesOf("A") === aBefore)
    val rows = spark.read.parquet(path).select("id", "p", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(rows === Set(
      (1L, "A", 1.0), (2L, "A", 2.0), (9L, "B", 30.0), (4L, "C", 4.0)))
    // contrast: a STATIC overwrite of the same batch drops A and C
    batch.write.mode("overwrite").partitionBy("p").parquet(path)
    assert(spark.read.parquet(path).count() === 1L)
  }

  test("s20 z-order: every file's envelope narrows on BOTH keys; 1-key sort doesn't (S20)") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import graft.operators.ZOrder
    // two independent uniform keys — the case single-key sort can't serve
    val n = 20000L
    val df = (0L until n)
      .map(i => (i, java.lang.Long.reverse(i * 2654435761L) >>> 49))
      .map { case (a, b) => (a % 1024, b % 1024) }.toDF("k1", "k2")
    def spans(path: String): Seq[(Long, Long)] =
      Files.list(Paths.get(path)).iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("k1")) - min(col("k1")), max(col("k2")) - min(col("k2"))).head()
        (r.getLong(0), r.getLong(1))
      }
    val sorted = "target/test-sinks/zorder_1key"
    val zed = "target/test-sinks/zorder_2key"
    df.repartitionByRange(8, col("k1")).sortWithinPartitions(col("k1"))
      .write.mode("overwrite").parquet(sorted)
    ZOrder.cluster(df, zed, "k1", "k2", nFiles = 8, bits = 10)
    val s1 = spans(sorted)
    val sz = spans(zed)
    // single-key layout: k2 is unclustered — every file spans ~the full
    // 0..1023 range. Z-order: both keys' average spans shrink well
    // below full (8 files ≈ 3 curve splits → ~1/2-1/4 per dim).
    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    assert(avg(s1.map(_._2)) > 900, s"precondition: 1-key layout leaves k2 wide: $s1")
    assert(avg(sz.map(_._1)) < 700, s"z-order must narrow k1 envelopes: $sz")
    assert(avg(sz.map(_._2)) < 700, s"z-order must narrow k2 envelopes: $sz")
    // and the layout is pure reorganization — content intact
    assert(spark.read.parquet(zed).except(df).isEmpty &&
      df.except(spark.read.parquet(zed)).isEmpty)
  }

  test("s20 z-order: pruning survives SKEWED key distributions") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import graft.operators.ZOrder
    // power-law keys: cubing a uniform [0,1) concentrates half the rows
    // in the bottom ~1/8 of the key space on BOTH dims — the hot-head /
    // long-tail shape real ids and timestamps have. repartitionByRange
    // samples the z-values, so files stay row-balanced: the hot region
    // gets fine z-slices (tiny envelopes), the sparse tail wide ones.
    val n = 20000L
    def u(i: Long, salt: Long): Double =
      ((java.lang.Long.reverse(i * 2654435761L + salt) >>> 14).toDouble
        / (1L << 50).toDouble)
    val df = (0L until n)
      .map(i => (
        (1024 * math.pow(u(i, 1L), 3)).toLong,
        (1024 * math.pow(u(i, 2L), 3)).toLong))
      .toDF("k1", "k2")
    val zed = "target/test-sinks/zorder_skew"
    // 16 files: 4 curve splits — z-order needs enough slices that the
    // hot region separates from the tail (8 left a full-range slice)
    ZOrder.cluster(df, zed, "k1", "k2", nFiles = 16, bits = 10)
    // row-weighted spans: what a scan actually prunes — most ROWS must
    // sit in narrow-envelope files even though tail files stay wide
    val perFile = Files.list(Paths.get(zed)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.map { f =>
        val r = spark.read.parquet(f)
          .agg(count(lit(1)),
            max(col("k1")) - min(col("k1")),
            max(col("k2")) - min(col("k2"))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
    assert(perFile.size > 1)
    def weighted(span: ((Long, Long, Long)) => Long) =
      perFile.map(t => t._1.toDouble * span(t)).sum / n
    assert(weighted(_._2) < 400,
      s"row-weighted k1 envelope must stay narrow under skew: $perFile")
    assert(weighted(_._3) < 400,
      s"row-weighted k2 envelope must stay narrow under skew: $perFile")
    // content intact (layout-only operator, skew or not)
    assert(spark.read.parquet(zed).except(df).isEmpty &&
      df.except(spark.read.parquet(zed)).isEmpty)
  }

  test("retentionVacuum deletes exactly the below-threshold partitions") {
    import spark.implicits._
    val path = "target/test_warehouse/retention"
    val df = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"),
      (4L, "2024-01-10"), (5L, "2024-01-11"))
      .toDF("id", "day")
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    val removed = Warehouse.retentionVacuum(spark, path, "day", "2024-01-03")
    assert(removed === 2L) // 01 and 02; the boundary day itself is kept
    val left = spark.read.parquet(path)
      .select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(left === Set("2024-01-03", "2024-01-10", "2024-01-11"))
    // idempotent: nothing below the threshold remains
    assert(Warehouse.retentionVacuum(spark, path, "day", "2024-01-03") === 0L)
    // total over a missing path
    assert(Warehouse.retentionVacuum(spark, path + "_nope", "day", "x") === 0L)
  }

  test("retentionVacuum unescapes partition values and keeps null partitions") {
    import spark.implicits._
    val path = "target/test_warehouse/retention_escaped"
    // timestamp-shaped values: ':' is URI-escaped on write (%3A), so a
    // raw directory-name comparison would sort the escaped form wrong
    val df = Seq(
      (1L, "2024-01-01 08:00"), (2L, "2024-01-02 09:30"),
      (3L, "2024-01-05 10:00"), (4L, null: String))
      .toDF("id", "ts_part")
    df.write.mode("overwrite").partitionBy("ts_part").parquet(path)
    val removed =
      Warehouse.retentionVacuum(spark, path, "ts_part", "2024-01-03")
    assert(removed === 2L) // the two January-early days; null survives
    val left = spark.read.parquet(path)
      .select(col("ts_part").cast("string"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(left === Set(Some("2024-01-05 10:00"), None))
  }

  test("cdcApply: latest op wins, deletes drop, inserts land, untouched pass") {
    import spark.implicits._
    val base = Seq(
      (1L, "a", 10.0), // untouched
      (2L, "b", 20.0), // deleted
      (3L, "c", 30.0), // updated twice -> seq 2 wins
      (4L, "d", 40.0)  // deleted then re-inserted in-batch -> insert wins
    ).toDF("k", "seg", "bal")
    val chg = Seq(
      (2L, 1L, "D", "b", 20.0),
      (3L, 1L, "U", "c", 31.0),
      (3L, 2L, "U", "c2", 32.0),
      (4L, 1L, "D", "d", 40.0),
      (4L, 2L, "I", "d2", 0.0),
      (5L, 1L, "I", "new", 50.0), // brand-new key
      (6L, 1L, "D", "x", 0.0)     // delete of an unknown key: no-op
    ).toDF("k", "seq", "op", "seg", "bal")
    val out = Warehouse.cdcApply(base, chg, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, "a", 10.0), (3L, "c2", 32.0), (4L, "d2", 0.0), (5L, "new", 50.0)))
  }

  test("cdcApply compacts the log agg-shaped: no window over the change batch") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0)).toDF("k", "seg", "bal")
    val chg = Seq((1L, 1L, "U", "b", 2.0)).toDF("k", "seq", "op", "seg", "bal")
    val plan = Warehouse.cdcApply(base, chg, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"log compaction must be an aggregate:\n$plan")
  }

  test("zoneMapRead scans only envelope-overlapping files; empty ranges scan none") {
    import spark.implicits._
    val path = "target/sinks/test_zonemap"
    // write the 8 files deterministically — repartitionByRange samples
    // its boundaries with a suite-order-dependent seed, so the file
    // count/extent pin below would depend on which tests ran before
    // this one; 8 explicit 1,000-key slices make the pin exact by
    // construction (slice i holds keys i·1000+1 .. (i+1)·1000)
    (0 until 8).foreach { i =>
      (i * 1000L + 1 to (i + 1) * 1000L).map(k => (k, k % 5)).toDF("k", "v")
        .coalesce(1)
        .sortWithinPartitions("k")
        .write.mode(if (i == 0) "overwrite" else "append").parquet(path)
    }
    val manifest = Warehouse.zoneMapManifest(spark, path, "k")
    val totalFiles = manifest.count()
    assert(totalFiles === 8L)

    val pruned = Warehouse.zoneMapRead(spark, path, manifest, "k", 2000L, 2999L)
    // correctness: same rows as the unpruned filter
    assert(pruned.count() === 1000L)
    // pruning: the scan's file list must be a strict subset
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scans(qs.plan)
        }.flatten
      scans(df.queryExecution.executedPlan)
        .map(_.relation.location.inputFiles.length.toLong).sum
    }
    val n = scannedFiles(pruned)
    assert(n > 0 && n <= 2, s"range spanning ~1/8 of the keys must read <=2 files, read $n")

    // a range outside every envelope reads nothing and returns empty
    assert(Warehouse.zoneMapRead(spark, path, manifest, "k", 50000L, 60000L).isEmpty)
  }

  test("bloomPointRead prunes to ~1 file on an UNCLUSTERED key; no false negatives") {
    import spark.implicits._
    val path = "target/sinks/test_bloommanifest"
    // cluster by a scrambled column so the probe key k scatters across
    // files — the zone map on k would overlap every envelope and prune
    // nothing; this is exactly the case the bloom manifest exists for
    (1L to 8000L).map(i => (i, (i * 2654435761L) % 8000L)).toDF("k", "c")
      .repartitionByRange(8, col("c"))
      .sortWithinPartitions("c")
      .write.mode("overwrite").parquet(path)
    val manifest = Warehouse.bloomManifest(spark, path, "k", 65536, 7)
    assert(manifest.count() === 8L)

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scans(qs.plan)
        }.flatten
      scans(df.queryExecution.executedPlan)
        .map(_.relation.location.inputFiles.length.toLong).sum
    }

    // no false negatives: every probed key comes back, from few files
    Seq(1L, 999L, 4242L, 8000L).foreach { key =>
      val got = Warehouse.bloomPointRead(spark, path, manifest, "k", key,
        65536, 7)
      assert(got.select("k").as[Long].collect().toSeq === Seq(key))
      val n = scannedFiles(got)
      assert(n >= 1 && n <= 2,
        s"needle $key must read ~1 of 8 files (+rare FP), read $n")
    }
    // an absent key reads at most FP files and returns nothing
    assert(Warehouse.bloomPointRead(spark, path, manifest, "k", 123456L,
      65536, 7).isEmpty)
  }
}
