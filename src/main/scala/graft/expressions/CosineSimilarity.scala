package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` /
  * `array<double>` columns (each side independently either type).
  *
  * Why a custom Expression (SURVEY §7.4 preference order (b)): the
  * DataFrame-composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and runs interpreted lambda calls per
  * element, which is the inner loop of every similarity-search operator. This
  * kernel generates a single fused Java loop (no allocation, no virtual
  * calls) inside whole-stage codegen, with an interpreted `nullSafeEval`
  * fallback kept semantically identical. Double support exists for the
  * centroid side of cell assignment (k-means means are `array<double>`):
  * a float element is widened to double BEFORE any arithmetic, exactly as
  * the fold form's `cast("double")`, so results stay bit-identical.
  *
  * Semantics: dot(a,b) / (||a||·||b||) accumulated in double, sequential
  * array order (deterministic IEEE — matches the fold form bit-for-bit);
  * null if either side is null, mismatched lengths, or a zero norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xd = isDoubleArr(left)
    val yd = isDoubleArr(right)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT nulls the whole result (matching the zip_with /
      // aggregate fold form — ArrayData.getFloat would read it as 0.0f
      // and silently rank corrupt vectors)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX =
        if (isDoubleArr(left)) s"$x.getDouble($i)"
        else s"(double) $x.getFloat($i)"
      val getY =
        if (isDoubleArr(right)) s"$y.getDouble($i)"
        else s"(double) $y.getFloat($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      final double $xi = $getX;
         |      final double $yi = $getY;
         |      $dot += $xi * $yi;
         |      $nx += $xi * $xi;
         |      $ny += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull} && ($nx == 0.0 || $ny == 0.0)) {
         |    ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point: `cosine_sim(a, b)`. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      CosineSimilarity(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))
}
