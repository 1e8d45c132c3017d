package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native per-row 60-bit SimHash: array<string> words → simhash long.
  *
  * Bit-identical to the explode → distinct → hexHash60 → graft_simhash
  * aggregation pipeline (votes are commutative, so per-row distinct +
  * vote order is immaterial; parity law-tested in EngineLawsProps):
  *  - words are de-duplicated per row — the global (doc, word) distinct
  *    of the aggregate spelling, restricted to one doc, is exactly the
  *    row's word set;
  *  - each distinct word hashes via the same engine-portable 60-bit
  *    md5-prefix value as [[graft.operators.TextOps.hexHash60]] (first
  *    15 hex digits of md5 = big-endian first 8 digest bytes >>> 4),
  *    so the DuckDB oracle's mirrored bit votes still agree;
  *  - null words are skipped (md5(null) is null and the aggregate
  *    skips null inputs); vote threshold is votes > 0 per bit, as in
  *    [[SimHashAgg.eval]].
  *
  * Replacing the aggregate spelling makes the SimHash sketch stage
  * MAP-ONLY: the former path shuffled one row per (doc, word) twice
  * (explode-distinct, then the per-doc vote aggregation) before the
  * band join ever ran.
  */
case class SimHashSignature(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_of"

  override def nullSafeEval(input: Any): Any =
    SimHashSignature.simhashOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // the fused loop lives in the JVM helper (like XXH64 for the
      // minhash fold) — the generated code stays a single call, and
      // the expression still participates in whole-stage codegen
      s"${ev.value} = graft.functions.SimHashSignature$$.MODULE$$.simhashOf($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SimHashSignature {
  private val bits = 60  // = graft.operators.SimHash.bits (full hash60 width)

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes) as a long — TextOps.hexHash60. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  def simhashOf(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        if (seen.add(w)) {
          val h = hash60(w.getBytes)
          var j = 0
          while (j < bits) {
            if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
