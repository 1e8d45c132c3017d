package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Ingest hardening for the JSONL source path (s14): raw feeds always
  * contain malformed lines, and at scale the reader must capture them
  * (PERMISSIVE + corrupt-record column) rather than kill the job
  * (FAILFAST) or silently drop rows (DROPMALFORMED). */
class JsonlSourceSpec extends SparkTestBase {

  test("malformed JSONL lines land in the corrupt-record column, good rows parse") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    dir.deleteOnExit()
    val f = Paths.get(dir.getPath, "part-0.json")
    Files.write(f,
      java.util.Arrays.asList(
        """{"doc_id": 1, "lang": "en"}""",
        """{"doc_id": 2, "lang": "de"""", // truncated — malformed
        """not json at all""",
        """{"doc_id": 4, "lang": "fr"}"""))

    val df = spark.read
      .schema("doc_id BIGINT, lang STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.getPath)
      .cache() // required before filtering on _corrupt_record (SPARK-21610)

    val good = df.filter(col("_corrupt_record").isNull)
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "en"), (4L, "fr")))

    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record")
      .collect().map(_.getString(0)).toSet
    assert(bad.size === 2)
    assert(bad.exists(_.contains("not json at all")))
    df.unpersist()
  }

  test("sharded JSONL export: maxRecordsPerFile bounds shard size, content round-trips") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_shards").toFile
    out.deleteOnExit()
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // the standard corpus-sharding knob: bounded shards regardless of
    // partition count, so downstream loaders stream fixed-size files
    docs.repartition(2)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 25)
      .json(out.getPath)

    val shards = out.listFiles().filter(_.getName.endsWith(".json"))
    assert(shards.length >= 4, s"expected >=4 shards, got ${shards.length}")
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(out.getPath)
    assert(back.count() === 100)
    assert(back.agg(sum($"doc_id")).head.getLong(0) === 5050L)
  }
}
