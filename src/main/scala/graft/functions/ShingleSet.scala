package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused word-n-shingle set: array<string> tokens → array<string>
  * of DISTINCT space-joined n-grams in first-occurrence order.
  *
  * Bit-parity contract with the HOF spelling it replaces
  * (`array_distinct(transform(sequence(0, size-n),
  * i => concat_ws(' ', slice(ws, i+1, n))))` —
  * [[graft.operators.TextOps.shinglesFromTokensHof]], property-tested in
  * EngineLawsProps): same join separator, same skip-null concat_ws
  * semantics, same first-occurrence distinct order, empty array for
  * fewer than n tokens. The HOF chain is CodegenFallback — the whole
  * projection subtree runs interpreted, with a fresh sliced array and a
  * lambda dispatch per shingle per row, then a second distinct pass.
  * Profiled as the wall of the entire shingle family (every lexical
  * retrieval / near-dup / decontamination query pays it on each corpus
  * row). This expression is ONE loop per row — slice-free concat over a
  * token view, open-addressed distinct on the fly — and participates in
  * whole-stage codegen via doGenCode, so the scan→shingle→explode
  * pipeline stays fused.
  *
  * Null input array yields null (callers that need the legacy
  * null→empty fold wrap in coalesce — TextOps does).
  */
case class ShingleSetFromTokens(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "shingle width must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleSetFromTokens.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.ShingleSetFromTokens$$.MODULE$$.compute($arr, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleSetFromTokens =
    copy(child = newChild)
}

object ShingleSetFromTokens {

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** One fused pass: build each n-gram with a single concatWs (skip-null,
    * matching `concat_ws`), keep first occurrences only. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    if (t < n) return EMPTY
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[AnyRef]()
    val gram = new Array[UTF8String](n)
    i = 0
    while (i <= t - n) {
      System.arraycopy(toks, i, gram, 0, n)
      val s = UTF8String.concatWs(SPACE, gram: _*)
      if (seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray())
  }
}
