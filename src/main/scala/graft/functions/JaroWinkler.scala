package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Jaro–Winkler similarity — the transposition-tolerant fuzzy-match
  * kernel next to the edit-distance path (q72). Standard definition:
  * Jaro = (m/|a| + m/|b| + (m−t)/m)/3 with match window
  * ⌊max(|a|,|b|)/2⌋−1 and half-counted transpositions; Winkler boost
  * `j + 0.1·ℓ·(1−j)` for the common prefix ℓ ≤ 4, applied only when
  * j > 0.7. The float op order matches DuckDB's
  * `jaro_winkler_similarity` exactly (verified bit-for-bit on fixture
  * name pairs), which is what lets q123 hash-match its oracle at full
  * double precision. Operates on UTF-16 code units — identical to
  * per-code-point for the ASCII fixtures and for any BMP text.
  */
object JaroWinklerKernel {

  def jaro(a: String, b: String): Double = {
    // empties first: DuckDB defines jaro('','') = 0, so the equality
    // shortcut must not see the empty-empty pair
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(i + md + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    var j = jaro(a, b)
    if (j > 0.7) {
      var l = 0
      val max = math.min(4, math.min(a.length, b.length))
      while (l < max && a.charAt(l) == b.charAt(l)) l += 1
      j += 0.1 * l * (1.0 - j)
    }
    j
  }
}

/** (string, string) → double Jaro–Winkler similarity
  * (see [[JaroWinklerKernel]]). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName,
    left.dataType == StringType && right.dataType == StringType,
    "STRING, STRING", left.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerKernel.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerKernel.similarity($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      JaroWinklerExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
