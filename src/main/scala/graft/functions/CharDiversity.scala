package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** One-pass per-document character-distribution statistics: total code
  * points, distinct code points, Σ count², and the max single-character
  * count. Downstream queries derive rational-arithmetic diversity
  * measures from these — Gini impurity `1 − Σ(cᵢ/n)²` and top-character
  * share — which, unlike Shannon entropy, need no `log`/`pow` (IEEE
  * guarantees correctly rounded `+ − * / sqrt` only, so log-based
  * metrics can differ in the last ulp between engines). The naive
  * formulation explodes one row per character — a 100× row blow-up
  * through a shuffle; this kernel keeps the histogram in a per-row
  * open-addressing pass, codegen-spliced like [[TextStatsKernel]].
  */
object CharDiversityKernel {

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = counts.get(cp)
      counts.put(cp, if (c == null) 1 else c + 1)
      n += 1
      i += Character.charCount(cp)
    }
    var sumSq = 0L
    var maxC = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c: Int = it.next()
      sumSq += c.toLong * c.toLong
      if (c > maxC) maxC = c
    }
    InternalRow(n, counts.size(), sumSq, maxC)
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("max_count", IntegerType, nullable = false)))
}

/** string → struct of character-distribution statistics
  * (see [[CharDiversityKernel]]). */
case class CharDiversityExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName, child.dataType == StringType, "STRING", child.dataType)
  override def dataType: DataType = CharDiversityKernel.schema
  override def prettyName: String = "char_diversity"
  override protected def nullSafeEval(input: Any): Any =
    CharDiversityKernel.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharDiversityKernel.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharDiversity {
  def apply(c: Column): Column =
    GraftBridge.column(CharDiversityExpr(GraftBridge.expression(c)))
}
