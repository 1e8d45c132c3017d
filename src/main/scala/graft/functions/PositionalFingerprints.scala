package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Native fused positional n-gram fingerprints: array<string> tokens →
  * array<struct<p: bigint, fp: bigint>> with p the 1-based gram start
  * and fp the portable 60-bit md5 hash of the space-joined gram — the
  * map-side stage of the cross-document duplicated-span operators
  * (CrossDupSpans / Lee et al. 2021 ExactSubstr).
  *
  * Bit-parity contract with the SQL spelling it replaces
  * (`transform(sequence(1, T-n+1), p -> struct(p, conv(substring(md5(
  * array_join(slice(ws, p, n), ' ')), 1, 15), 16, 10)))` — parity
  * property in EngineLawsProps): same 1-based positions, same
  * space-joined gram text (null tokens skipped with their separator,
  * the array_join fold), same md5-prefix long ([[SimHashSignature.
  * hash60]]'s digest mapping), empty array under n tokens. The HOF
  * spelling is CodegenFallback AND builds three strings per gram
  * (sliced array, joined gram, 32-char hex) before parsing the hex
  * back to a long; this expression streams each token's bytes into a
  * thread-local MessageDigest — one token-bytes materialization per
  * ROW, zero per-gram string construction — and reads the long off
  * the digest bytes. Participates in whole-stage codegen.
  */
case class PositionalFingerprints(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 2, s"span length must be >= 2: $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("p", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pos_fps"

  override def nullSafeEval(input: Any): Any =
    PositionalFingerprints.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.PositionalFingerprints$$.MODULE$$.compute($arr, $n);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): PositionalFingerprints =
    copy(child = newChild)
}

object PositionalFingerprints {

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    if (t < n) return EMPTY
    // one byte materialization per token per ROW (the HOF form builds
    // gram strings per gram — O(n·T) string bytes per row)
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = digest.get()
    val out = new Array[Any](t - n + 1)
    var p = 0
    while (p <= t - n) {
      md.reset()
      var wrote = false
      var j = 0
      while (j < n) {
        val b = toks(p + j)
        if (b != null) { // array_join skips null tokens AND their separator
          if (wrote) md.update(' '.toByte)
          md.update(b)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      var acc = 0L
      var k = 0
      while (k < 8) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      out(p) = new GenericInternalRow(Array[Any]((p + 1).toLong, acc >>> 4))
      p += 1
    }
    new GenericArrayData(out)
  }
}
