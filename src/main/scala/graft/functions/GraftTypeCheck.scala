package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Shared input-type validation for the custom expressions: a wrong-typed
  * argument fails at ANALYSIS time with a named error instead of a
  * runtime ClassCastException inside a task. (ExpectsInputTypes is
  * private[sql]-typed in Spark 4, so this goes through the public
  * checkInputDataTypes hook.) */
object GraftTypeCheck {
  def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  def expect(fn: String, ok: Boolean, expected: String, got: DataType): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires $expected input, got ${got.sql}")
}
