package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** One-pass per-document text statistics.
  *
  * The column-level formulation of lang-ID/quality/token-count re-runs
  * tokenization + a regex per measure (~15 passes/doc, several
  * interpreted); this kernel computes every scalar the text-analysis
  * operators need in one scan of the string. Semantics match the
  * oracle-checked column versions exactly:
  *  - tokens = `\s+`-split of lower(trim(text)); empty text counts 1
  *    (split-of-empty-string semantics, as in Spark/DuckDB);
  *  - punct = occurrences of [.,!?;:] in the ORIGINAL text;
  *  - bpe = `\w+|[^\w\s]` match count (ASCII \w, per Java regex & RE2);
  *  - stop_* = tokens contained in TextOps' stopword sets;
  *  - has_han = any code point in U+4E00..U+9FFF.
  */
object TextStatsKernel {
  import graft.llm.TextOps
  private val StopEn = new java.util.HashSet[String](java.util.Arrays.asList(TextOps.StopEn: _*))
  private val StopDe = new java.util.HashSet[String](java.util.Arrays.asList(TextOps.StopDe: _*))
  private val StopFr = new java.util.HashSet[String](java.util.Arrays.asList(TextOps.StopFr: _*))
  private val StopEs = new java.util.HashSet[String](java.util.Arrays.asList(TextOps.StopEs: _*))

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'
  private def isWord(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9') || cp == '_'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var punct = 0; var bpe = 0; var hasHan = false
    var inWord = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' || cp == ':') punct += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) hasHan = true
      if (isWord(cp)) { if (!inWord) { bpe += 1; inWord = true } }
      else { inWord = false; if (!isWs(cp)) bpe += 1 }
      i += Character.charCount(cp)
    }
    var nTok = 0; var en = 0; var de = 0; var fr = 0; var es = 0
    val toks = Norm.tokens(s)
    nTok = toks.length
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (StopEn.contains(tok)) en += 1
      if (StopDe.contains(tok)) de += 1
      if (StopFr.contains(tok)) fr += 1
      if (StopEs.contains(tok)) es += 1
      t += 1
    }
    InternalRow(nTok, punct, en, de, fr, es, bpe, hasHan)
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("stop_de", IntegerType, nullable = false),
    StructField("stop_fr", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false),
    StructField("bpe", IntegerType, nullable = false),
    StructField("has_han", BooleanType, nullable = false)))
}

/** string → struct of per-document text statistics (see [[TextStatsKernel]]). */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName, child.dataType == StringType, "STRING", child.dataType)
  override def dataType: DataType = TextStatsKernel.schema
  override def prettyName: String = "text_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  def apply(c: Column): Column = GraftBridge.column(TextStatsExpr(GraftBridge.expression(c)))
}
