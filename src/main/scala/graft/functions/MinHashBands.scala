package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd LSH band mix: array<long> minhash signature →
  * array<long> of `bands` FNV-1a hashes, one per row-group of
  * `sig.length / bands` consecutive minima.
  *
  * Bit-identical to the band output of [[MinHashBandSketch.eval]] (same
  * FNV offset basis / prime, same band-major slice order — parity
  * law-tested in EngineLawsProps), so `graft_minhash_sig(sh, k)` piped
  * through this expression reproduces the aggregate's `(sig, bands)`
  * pair as a MAP-ONLY stage: the batch near-dup path needs no
  * shingle explode and no per-doc aggregation shuffle for its
  * sketches. The FNV multiply intentionally wraps around Long — that
  * is why this is a native expression and not a HOF `aggregate(...)`
  * spelling, which would throw under ANSI overflow checking.
  */
case class MinHashBands(child: Expression, bands: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(bands > 0, "bands must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_band_mix"

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val n = sig.numElements()
    require(n % bands == 0, s"bands ($bands) must divide signature length ($n)")
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L // FNV offset basis
      var r = 0
      while (r < rows) {
        val idx = b * rows + r
        // graft_minhash_sig never emits null slots, but direct SQL use
        // of graft_minhash_band_mix can feed one — getLong on a null
        // slot would silently read 0 and hash a wrong band
        if (sig.isNullAt(idx)) throw new IllegalArgumentException(
          s"graft_minhash_band_mix: null signature element at $idx")
        acc = (acc ^ sig.getLong(idx)) * 0x100000001b3L
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val out = ctx.freshName("bandsOut")
      val n = ctx.freshName("n")
      val rows = ctx.freshName("rows")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $sig.numElements();
         |if ($n % $bands != 0) {
         |  throw new IllegalArgumentException(
         |    "bands ($bands) must divide signature length (" + $n + ")");
         |}
         |int $rows = $n / $bands;
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 0xcbf29ce484222325L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    if ($sig.isNullAt($b * $rows + $r)) {
         |      throw new IllegalArgumentException(
         |        "graft_minhash_band_mix: null signature element at "
         |          + ($b * $rows + $r));
         |    }
         |    $acc = ($acc ^ $sig.getLong($b * $rows + $r)) * 0x100000001b3L;
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
