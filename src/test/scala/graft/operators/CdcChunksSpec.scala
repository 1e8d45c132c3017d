package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Laws for the content-defined chunker ([[TextOps.cdcChunks]]): chunks
  * partition the token stream, boundaries fall exactly after cut
  * tokens, and — the property that makes chunk hashes a block-level
  * dedup key — an edit before a cut point shifts no boundary after it.
  */
class CdcChunksSpec extends SparkTestBase {

  import spark.implicits._

  private val div = 4

  private def chunksOf(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(TextOps.cdcChunks(TextOps.tokens(col("text")), div).as("c"))
      .as[Seq[String]].collect().head

  /** Probe which of the given words are cut points under the portable
    * hash (evaluated through the engine, so the spec can't drift from
    * the implementation). */
  private def isCut(words: Seq[String]): Map[String, Boolean] =
    words.toDF("w")
      .select(col("w"), (TextOps.hexHash60(col("w")) % div === 0).as("c"))
      .as[(String, Boolean)].collect().toMap

  private val vocab = (0 until 40).map(i => s"tok$i")

  test("chunks rejoin to the original text (lossless partition)") {
    val texts = Seq(
      vocab.mkString(" "),
      "one",
      "a b a b a b",
      vocab.take(7).reverse.mkString(" "))
    texts.foreach { t =>
      assert(chunksOf(t).mkString(" ") === t, s"for text: $t")
    }
  }

  test("every chunk but the last ends with a cut token, and contains no other cut") {
    val text = vocab.mkString(" ")
    val cut = isCut(vocab)
    val cs = chunksOf(text)
    cs.dropRight(1).foreach { c =>
      val ws = c.split(" ")
      assert(cut(ws.last), s"chunk '$c' does not end at a cut token")
      assert(ws.init.forall(w => !cut(w)), s"chunk '$c' spans a cut token")
    }
    val lastWs = cs.last.split(" ")
    assert(lastWs.init.forall(w => !cut(w)))
  }

  test("an insertion before the first cut point shifts no later boundary") {
    val cut = isCut(vocab)
    assert(cut.values.exists(identity),
      "fixture vocab has no cut token; widen it")
    val first = vocab.indexWhere(cut)
    val text = vocab.mkString(" ")
    val edited = (vocab.take(first) ++ Seq("INSERTED") ++
      vocab.drop(first)).mkString(" ")
    val (a, b) = (chunksOf(text), chunksOf(edited))
    // Everything after the chunk containing the insertion is identical:
    // fixed-width chunking (n45) would shift every later chunk instead.
    assert(a.tail === b.tail.takeRight(a.tail.length))
    assert(b.head.contains("INSERTED"))
  }

  test("empty-string tokens chunk losslessly (the array-accumulator edge)") {
    // split("a  b", " ") yields an empty middle token; the chunker must
    // neither drop it nor fabricate a chunk for an exhausted tail.
    val t = "a  b"
    assert(chunksOf(t).mkString(" ") === t)
  }
}
