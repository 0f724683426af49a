package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd sign-bit LSH signature: all `bits` hyperplane dots of
  * one table in a single fused loop — bit b = sign of Σ_d vec(d)·plane(b)(d),
  * double accumulation in array order (bit-identical to the HOF
  * `aggregate(zip_with(...))` fold it replaces, which paid one array
  * allocation + fold per plane: 32 HOF evals and allocations per row at
  * bits=8 × tables=4 versus zero allocations here).
  *
  * The plane matrix rides along as a codegen reference object, not an
  * expression input — it is dimension-sized (bits × dims) and identical for
  * every row.
  *
  * A vector whose length ≠ planes(0).length fails the job loudly (matching
  * the assert in the HOF path): zip-style null-padding would silently
  * degenerate every signature to bucket 0 and turn the bucket join into an
  * all-pairs product.
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private val dims = planes.headOption.map(_.length).getOrElse(0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"hyperplane_signature: embedding length ${v.numElements()} != dims=$dims")
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var d = 0
      while (d < dims) { dot += v.getFloat(d).toDouble * p(d); d += 1 }
      if (dot >= 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_signature: embedding length " + $v.numElements() +
         |    " != dims=" + $dims);
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $ref.length; $b++) {
         |  final double[] $p = $ref[$b];
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $dims; $d++) {
         |    $dot += ((double) $v.getFloat($d)) * $p[$d];
         |  }
         |  if ($dot >= 0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.bridge.column(
      HyperplaneSignature(
        org.apache.spark.sql.graft.bridge.expression(vec), planes))
}
