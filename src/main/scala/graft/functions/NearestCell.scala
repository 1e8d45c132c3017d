package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd coarse-quantizer assignment: index of the nearest
  * centroid (squared-L2) for an array<double> vector, with the centroid
  * matrix a foldable literal.
  *
  * The higher-order spelling (`Similarity.nearestCell`: one
  * zip_with+aggregate fold per centroid, argmin via array_sort of
  * (dist, idx) structs) allocates an intermediate array per centroid
  * per row and k structs per row — at nlist=40 that is the dominant
  * cost of a sized IVF build, paid again by every consumer of the cell
  * column. This expression is one fused k×d loop over a pre-extracted
  * double[][], no allocation.
  *
  * Arithmetic parity (the DuckDB oracle depends on it): per centroid
  * the distance is the identical left-to-right fold
  * `((0 + (x0-c0)²) + (x1-c1)²) + …`, and the argmin keeps the FIRST
  * centroid on ties (strict `<` update) — exactly the
  * `array_sort((d, i))[1].i` tie-break, since struct ordering compares
  * d then i. Bit-identical cells; law-tested against the HOF spelling.
  *
  * Nulls propagate. Mismatched dims fold over the shorter prefix (all
  * call sites quantize fixed-dim embeddings).
  */
case class NearestCell(vec: Expression, cents: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = vec
  override def right: Expression = cents

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!cents.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_nearest_cell centroids must be a literal array of arrays")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Double]] = {
    val ad = cents.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { j =>
      val row = ad.getArray(j)
      Array.tabulate(row.numElements())(row.getDouble)
    }
  }

  override def nullSafeEval(v: Any, m: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      val n = math.min(x.numElements(), c.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val t = x.getDouble(i) - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, (x, _) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $c = $m[$j];
         |  int $n = java.lang.Math.min($x.numElements(), $c.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = $x.getDouble($i) - $c[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(vec = newLeft, cents = newRight)
}
