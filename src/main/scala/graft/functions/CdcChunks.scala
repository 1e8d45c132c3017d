package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused content-defined chunker: array<string> tokens →
  * array<string> of space-joined chunks, cut AFTER every token whose
  * portable 60-bit hash ≡ 0 (mod divisor) — the n151/s42/n169 CDC
  * primitive.
  *
  * Bit-parity contract with the aggregate-HOF spelling it replaces
  * ([[graft.operators.TextOps.cdcChunksHof]], property-tested in
  * EngineLawsProps): same cut rule (a NULL token never cuts — its null
  * hash fails the when()), same skip-null concat_ws join (an all-null
  * open chunk still emits as the empty string), same trailing-chunk
  * flush, empty array for empty input. The HOF fold is
  * CodegenFallback — a nested aggregate building a struct of two
  * growing arrays per token, all interpreted; profiled as the wall of
  * the chunk family. This expression is one loop per row with a
  * thread-local md5 and participates in whole-stage codegen.
  *
  * Null input array yields null (TextOps wraps in coalesce).
  */
case class CdcChunks(child: Expression, divisor: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(divisor >= 1, "divisor must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[ArrayData], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.CdcChunks$$.MODULE$$.compute($arr, $divisor);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val SPACE = UTF8String.fromString(" ")

  def compute(arr: ArrayData, divisor: Int): ArrayData = {
    val t = arr.numElements()
    val out = new java.util.ArrayList[AnyRef]()
    val cur = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < t) {
      val w = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      cur.add(w)
      val cut = w != null &&
        SimHashSignature.hash60(w.getBytes) % divisor == 0
      if (cut) {
        out.add(UTF8String.concatWs(SPACE, cur.toArray(Array.empty[UTF8String]): _*))
        cur.clear()
      }
      i += 1
    }
    if (!cur.isEmpty) {
      out.add(UTF8String.concatWs(SPACE, cur.toArray(Array.empty[UTF8String]): _*))
    }
    new GenericArrayData(out.toArray())
  }
}
