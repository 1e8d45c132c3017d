package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd Bloom membership probe against [[BloomFilterAgg]]'s
  * packed word array, mirroring its Kirsch–Mitzenmacher double hashing
  * bit for bit (key is masked to 31 bits inside, like the build side).
  *
  * Exists as a Catalyst expression (not a composed Column) for two
  * reasons. First, the hot path: the probe runs once per FACT row in a
  * join-pruning filter (n51), and a fused loop with an early exit beats
  * the 6-term `element_at`/`shiftright` expression tree it replaces.
  * Second, and decisive: the composed-Column form needs the bloom array
  * cross-joined in, and Catalyst's PushDownLeftSemiAntiJoin then
  * reorders the exact semi join BELOW that cross join — the probe ends
  * up above the join it was meant to prefilter. As a scalar function
  * the bloom arrives via a scalar subquery inside a plain Filter on the
  * scan (the same shape Spark's InjectRuntimeFilter emits, SPARK-32268),
  * which no rule can hoist above the join.
  *
  * False positives possible (callers re-verify with an exact join),
  * false negatives impossible. Nulls propagate.
  */
case class BloomMightContain(
    left: Expression,
    right: Expression,
    numBits: Int,
    numHashes: Int)
  extends BinaryExpression with Predicate with ExpectsInputTypes {
  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), LongType)
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(words: Any, key: Any): Any = {
    val arr = words.asInstanceOf[ArrayData]
    val h = key.asInstanceOf[Long] & 0x7fffffffL
    val h1 = (SketchAggregates.BloomA1 * h + SketchAggregates.BloomB1) %
      SketchAggregates.P
    val h2 = (SketchAggregates.BloomA2 * h + SketchAggregates.BloomB2) %
      SketchAggregates.P
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) % numBits).toInt
      if ((arr.getLong(bit >> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (words, key) => {
      val h = ctx.freshName("h")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      import SketchAggregates.{BloomA1, BloomA2, BloomB1, BloomB2, P}
      s"""
         |long $h = $key & 2147483647L;
         |long $h1 = (${BloomA1}L * $h + ${BloomB1}L) % ${P}L;
         |long $h2 = (${BloomA2}L * $h + ${BloomB2}L) % ${P}L;
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $bit = ($h1 + $i * $h2) % ${numBits}L;
         |  if (($words.getLong((int) ($bit >> 6)) & (1L << (int) ($bit & 63L))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
