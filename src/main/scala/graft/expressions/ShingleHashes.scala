package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native distinct k-gram hashing over a token array: the fused form of
  *
  * {{{
  *   array_distinct(
  *     when(size(toks) >= k,
  *       transform(sequence(0, size(toks) - k), i => xxhash64(slice(toks, i+1, k))))
  *       .otherwise(array(xxhash64(toks))))
  * }}}
  *
  * bit-identical to it (same XXH64 fold, seed 42, null elements skipped —
  * asserted in ShingleHashesSpec), but one pass over the token array with
  * zero per-shingle slice allocation: the builtin form materializes a k-slot
  * array copy per position plus an index sequence per row, which dominated
  * the profile of the shingling stage. This is the engine's hottest map
  * (every near-dup path starts here), hence a custom Expression rather than
  * operator composition — preference (b) of the custom-op ladder.
  *
  * Hash identity with `xxhash64(slice(...))` matters because signatures and
  * shingle relations persist in the lake: a library upgrade that silently
  * changed hash values would orphan every stored MinHash signature.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.expressions.ShingleHashes$$.MODULE$$.compute($x, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** One shingle hash: XXH64 fold over tokens[from, from+len), seed 42 —
    * exactly Spark's `xxhash64(array<string>)` element fold (nulls leave the
    * accumulator unchanged, as XxHash64 does).
    */
  private def hashRange(toks: ArrayData, from: Int, len: Int): Long = {
    var h = 42L
    var j = from
    val end = from + len
    while (j < end) {
      if (!toks.isNullAt(j)) {
        val s = toks.getUTF8String(j)
        h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h)
      }
      j += 1
    }
    h
  }

  /** Distinct k-gram hashes in first-occurrence order (array_distinct
    * parity); whole-array hash when fewer than k tokens.
    */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array(hashRange(toks, 0, n)))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - k) {
      seen.add(hashRange(toks, i, k))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = it.next(); w += 1 }
    new GenericArrayData(out)
  }

  def apply(tokens: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      ShingleHashes(org.apache.spark.sql.graft.bridge.expression(tokens), k))
}
