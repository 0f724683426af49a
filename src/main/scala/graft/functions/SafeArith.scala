package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null-safe arithmetic with the reference's exact semantics
  * (reference derived/metrics.py:93-106): any null operand → null;
  * division by zero → null (never an ANSI error).
  *
  * Pure `Column` expressions — codegen'd, no UDFs.
  */
object SafeArith {

  /** null if denominator is null or 0, else a/b (a null → null follows). */
  def safeDivide(a: Column, b: Column): Column =
    when(b.isNotNull && b =!= 0, a / b)

  def safeSubtract(a: Column, b: Column): Column =
    when(a.isNotNull && b.isNotNull, a - b)

  def safeAdd(a: Column, b: Column): Column =
    when(a.isNotNull && b.isNotNull, a + b)

  def safeMultiply(a: Column, b: Column): Column =
    when(a.isNotNull && b.isNotNull, a * b)
}
