package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native engine-portable md5 token hashing — the fused form of
  *
  * {{{
  *   conv(concat(substring(md5(t.cast("binary")), 7, 2), substring(..., 5, 2),
  *     substring(..., 3, 2), substring(..., 1, 2)), 16, 10).cast("long")
  * }}}
  *
  * i.e. the little-endian unsigned int of the first 4 md5 bytes (what
  * DuckDB's `md5_number_upper(x) % 2^32` computes) — bit-identical to the
  * builtin composition (PortableHashSpec), but straight from the digest
  * bytes: the builtin form allocates a 32-char hex string plus four
  * substrings plus a concat plus a base-16 parse PER TOKEN, which dominated
  * the simhash/fingerprint map stages. Same custom-Expression rationale as
  * [[ShingleHashes]]: hot-path per-row work with a pinned hash identity
  * (stored fingerprints must never drift).
  */
case class PortableTokenHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_token_hash expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PortableHash.tokenHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.expressions.PortableHash$$.MODULE$$.tokenHash($x)")

  override protected def withNewChildInternal(newChild: Expression): PortableTokenHash =
    copy(child = newChild)
}

object PortableTokenHash {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      PortableTokenHash(org.apache.spark.sql.graft.bridge.expression(c)))
}

/** Native rolling polynomial fingerprint over a token array — the fused
  * form of
  *
  * {{{
  *   aggregate(toks, lit(0L), (acc, t) => pmod(acc * 31L + portableTokenHash(t), lit(1000000007L)))
  * }}}
  *
  * bit-identical (PortableHashSpec) but one digest pass per token instead
  * of an interpreted lambda dispatch + hex-string round trip per token —
  * the [[CosineSimilarity]]-vs-HOF-fold lesson applied to the document
  * fingerprint. A null token poisons the fold to null, exactly like the
  * builtin `aggregate` (null propagates through every later step).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PortableHash.rolling(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("rolled")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |Object $v = graft.expressions.PortableHash$$.MODULE$$.rolling($x);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $v).longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      RollingFingerprint(org.apache.spark.sql.graft.bridge.expression(c)))
}

object PortableHash {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Little-endian unsigned int32 of the first 4 md5 bytes of the UTF-8
    * encoding — the [[graft.text.TextFunctions.portableTokenHash]] value.
    */
  def tokenHash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(3) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(1) & 0xffL) << 8) | (d(0) & 0xffL)
  }

  private val Mod = 1000000007L

  /** Rolling fold; null on a null element (HOF `aggregate` parity). */
  def rolling(arr: ArrayData): Any = {
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc = (acc * 31L + tokenHash(arr.getUTF8String(i))) % Mod
      if (acc < 0) acc += Mod // pmod parity (operands are non-negative, but keep exact)
      i += 1
    }
    acc
  }
}
