package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TableChecksumSpec extends SparkTestBase {
  import spark.implicits._

  private val P = TableChecksum.P

  private def fold(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = TableChecksum.checksumOfHashes(df).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("modular sum matches BigInt ground truth where a naive long sum overflows") {
    // 40 residues near 2^59: a single-level sum(h) is ~40 * 2^59 = 2.5 * 2^63
    // — silent wrap under Spark's non-ANSI sum. The two-level fold must
    // equal the BigInt result exactly.
    val hs = (0 until 40).map(i => (1L << 59) + i * 1000003L)
    val expSum = (hs.map(h => BigInt(h % P)).sum % P).toLong
    val expXor = hs.reduce(_ ^ _)
    val (n, s, x) = fold(hs.toDF("graft__h"))
    assert(n === 40L)
    assert(s === expSum)
    assert(x === expXor)
  }

  test("checksum is independent of row order and partitioning") {
    val hs = (1 to 5000).map(i => (i * 2654435761L) & ((1L << 60) - 1))
    val base = fold(hs.toDF("graft__h"))
    val shuffled = fold(scala.util.Random.shuffle(hs).toDF("graft__h").repartition(17))
    assert(base === shuffled)
  }

  test("sum column catches the even-multiplicity rows that xor cancels") {
    val once = fold(Seq(7L, 11L).toDF("graft__h"))
    val twice = fold(Seq(7L, 11L, 13L, 13L).toDF("graft__h"))
    // 13 xor 13 = 0, so xor alone can't tell these apart beyond n_rows...
    assert(once._3 === twice._3)
    // ...but the modular sum moves by 2*13.
    assert(once._2 !== twice._2)
    assert(once._1 !== twice._1)
  }

  test("NULL fields serialize to the sentinel, not silently dropped") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("x", null), Row("x", "\\N"))), schema)
    val ser = df.select(TableChecksum.serialized(Seq(col("a"), col("b"))).as("s"))
      .as[String].collect().toSeq
    // NULL pins to the sentinel rather than vanishing from concat_ws —
    // which also documents the sentinel's one collision: literal "\N" text.
    assert(ser === Seq("x|\\N", "x|\\N"))
    // And a null-bearing row still participates in the fold (n_rows = 2).
    val r = TableChecksum.checksum(df,
      TableChecksum.serialized(Seq(col("a"), col("b")))).collect()(0)
    assert(r.getLong(0) === 2L)
  }

  test("checksums differ when one row's field differs") {
    val d1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val d2 = Seq(("a", 1L), ("b", 3L)).toDF("k", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      TableChecksum.checksum(df, TableChecksum.serialized(Seq(col("k"), col("v"))))
        .collect()(0)
    val (r1, r2) = (ck(d1), ck(d2))
    assert(r1.getLong(0) === r2.getLong(0))
    assert(r1.getLong(1) !== r2.getLong(1))
    assert(r1.getLong(2) !== r2.getLong(2))
  }
}
