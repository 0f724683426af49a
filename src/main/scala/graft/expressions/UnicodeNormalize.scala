package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode normalization (NFC/NFD/NFKC/NFKD) — the
  * canonicalization step a dedup pipeline needs BEFORE hashing text: the
  * same visible string can arrive precomposed ("é" U+00E9) or decomposed
  * ("e" + U+0301) and would otherwise hash to different exact-dup /
  * shingle keys. Spark ships no normalization function (SPARK-44570
  * landed a `to_char` family but not NFC), so this wraps the JDK's
  * `java.text.Normalizer` (Unicode-standard UAX #15 implementation — no
  * external library) as a single fused expression with an `isNormalized`
  * fast path: for the overwhelmingly-common already-NFC string the kernel
  * is one scan and no allocation.
  *
  * `form` must be one of NFC/NFD/NFKC/NFKD (validated at construction —
  * plan time, not task time). Accent folding composes from built-ins on
  * top of this: `regexp_replace(unicode_norm(s, "NFD"), "\\p{Mn}", "")`.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // construction-time validation: an invalid form fails planning, not tasks
  @transient private lazy val javaForm = java.text.Normalizer.Form.valueOf(form)
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_norm form must be NFC/NFD/NFKC/NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_norm expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, javaForm)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Column-level entry point: `unicode_norm(s, "NFC")`. */
  def apply(s: Column, form: String): Column =
    org.apache.spark.sql.graft.bridge.column(
      UnicodeNormalize(org.apache.spark.sql.graft.bridge.expression(s), form))
}
