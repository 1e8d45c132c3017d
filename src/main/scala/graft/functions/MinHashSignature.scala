package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd banded-minhash signature: array<string> shingles →
  * array<long> of `numHashes` minima.
  *
  * The higher-order-function spelling (`aggregate(transform(sh,
  * xxhash64), array_repeat(MaxValue), zip_with(least))`) allocates a
  * fresh 64-slot array per shingle per row and dispatches the fold
  * lambda through interpreted HOF machinery — the profiled cost center
  * of the streaming sketch path (n68, the heaviest registered query in
  * r06). This expression is one fused loop — hash each shingle once,
  * update all k minima in place, no per-shingle allocation — and
  * participates in whole-stage codegen via doGenCode.
  *
  * Bit-parity contract (proven in StreamingNearDupSpec/EngineLawsProps):
  *  - input hash `xxhash64(s) & 0x7fffffff` — XXH64.hashUTF8String with
  *    the SQL function's seed 42, identical to the HOF form and to the
  *    batch aggregate's pre-hashed input ([[MinHashBandSketch.update]]);
  *  - same coefficients ([[SketchAggregates.coefA]]/[[coefB]]), same
  *    `(a*h+b) % P` fold (< 2^62 + 2^31, ANSI-overflow-safe), same
  *    Long.MaxValue minima for an empty array;
  *  - a null shingle hashes to the seed (42), matching `xxhash64(null)`
  *    inside the HOF's transform; a null ARRAY yields null.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0, "numHashes must be positive")

  @transient private lazy val coefA = SketchAggregates.coefA(numHashes)
  @transient private lazy val coefB = SketchAggregates.coefB(numHashes)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        (if (arr.isNullAt(i)) 42L
         else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)) & 0x7fffffffL
      var j = 0
      while (j < numHashes) {
        val x = (coefA(j) * h + coefB(j)) % SketchAggregates.P
        if (x < m(j)) m(j) = x
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ca = ctx.addReferenceObj("coefA", coefA, "long[]")
      val cb = ctx.addReferenceObj("coefB", coefB, "long[]")
      val m = ctx.freshName("minima")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $m = new long[$numHashes];
         |java.util.Arrays.fill($m, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = ($arr.isNullAt($i)
         |    ? 42L
         |    : $xxh.hashUTF8String($arr.getUTF8String($i), 42L)) & 0x7fffffffL;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $x = ($ca[$j] * $h + $cb[$j]) % ${SketchAggregates.P}L;
         |    if ($x < $m[$j]) $m[$j] = $x;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($m);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
