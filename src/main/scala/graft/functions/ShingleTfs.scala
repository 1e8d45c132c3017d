package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused word-n-shingle TERM-FREQUENCY set: array<string>
  * tokens → array<struct<sh: string, tf: bigint>> of distinct
  * space-joined n-grams in first-occurrence order with their
  * within-document occurrence counts — the tf-aware sibling of
  * [[ShingleSetFromTokens]] (identical gram construction and distinct
  * order; `transform(graft_shingle_tfs(ws,n), g -> g.sh)` ≡
  * `graft_shingles(ws,n)`, law-tested). One fused loop per row; the
  * index-build stage BM25-style scoring needs tf from, with no extra
  * aggregate: exploding this array yields one posting per distinct
  * (doc, gram) carrying its tf. */
case class ShingleTfs(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "shingle width must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sh", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_shingle_tfs"

  override def nullSafeEval(input: Any): Any =
    ShingleTfs.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.ShingleTfs$$.MODULE$$.compute($arr, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleTfs =
    copy(child = newChild)
}

object ShingleTfs {

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    if (t < n) return EMPTY
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    // insertion-ordered counting: index map + parallel count buffer
    val idx = new java.util.HashMap[UTF8String, Integer]()
    val order = new java.util.ArrayList[UTF8String]()
    val counts = new java.util.ArrayList[Long]()
    val gram = new Array[UTF8String](n)
    i = 0
    while (i <= t - n) {
      System.arraycopy(toks, i, gram, 0, n)
      val s = UTF8String.concatWs(SPACE, gram: _*)
      val at = idx.get(s)
      if (at == null) {
        idx.put(s, order.size())
        order.add(s)
        counts.add(1L)
      } else counts.set(at, counts.get(at) + 1L)
      i += 1
    }
    val out = new Array[Any](order.size())
    var j = 0
    while (j < out.length) {
      out(j) = new GenericInternalRow(Array[Any](order.get(j), counts.get(j)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
