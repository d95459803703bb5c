package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer over a published merges table
  * (Sennrich et al., ACL '16 — the learn/apply split: the table below is
  * the "learned" artifact; this kernel is the deterministic APPLY step).
  *
  * Semantics (fixed, oracle-replayable): the document is whitespace-
  * normalized and lowercased ([[Norm.tokens]]), each token is stripped to
  * its `[a-z]` characters (the fixture corpus' letter alphabet; empty
  * results drop out), split into single characters, and then each merge
  * rule is applied IN TABLE ORDER as one greedy left-to-right pass — a
  * fold that replaces the accumulated tail token `l` followed by the next
  * token `r` with `lr`, so a rule can consume tokens produced by earlier
  * rules but never re-trigger an earlier rule. This is exactly the fold
  * the DuckDB oracle replays with nested `list_reduce` passes (one per
  * merge), which is what makes the subword COUNT — the budget currency of
  * a training pipeline — hash-comparable across engines.
  *
  * No reference analog (the reference's string surface is byte-slice
  * parsing, hive-io-exp-core input/parser/array/BytesParser.java:152-298);
  * this is a north-star training-pipeline operator. Single pass per
  * document, O(merges × word-length) ALU work, participates in
  * whole-stage codegen via a static call like the other kernels here.
  */
object BpeKernel {

  /** Rank-ordered merge tables. `en16`: 16 high-frequency English letter
    * pairs — a deterministic stand-in for a learned merges file with the
    * same shape (rank-ordered (left, right) rules over a char alphabet).
    * The table is the SINGLE definition both engines derive from: the
    * kernel reads it here and the oracle SQL is textually unrolled from
    * it ([[graft.queries.LlmQueries]]), so they cannot drift. */
  val MergeTables: Map[String, Vector[(String, String)]] = Map(
    "en16" -> Vector(
      ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
      ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"), ("a", "t"),
      ("e", "n"), ("o", "u"), ("an", "d"), ("in", "g"), ("t", "o"),
      ("e", "d")))

  def merges(key: String): Vector[(String, String)] =
    MergeTables.getOrElse(key, throw new IllegalArgumentException(
      s"unknown BPE merges table '$key' — known: ${MergeTables.keys.mkString(", ")}"))

  /** All subword tokens of the document, word by word, in order. */
  def compute(text: UTF8String, mergesKey: String): ArrayData = {
    val ms = merges(mergesKey)
    val words = Norm.tokens(text.toString)
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val raw = words(wi)
      // strip to the [a-z] alphabet; tokens with nothing left drop out
      val sb = new java.lang.StringBuilder(raw.length)
      var ci = 0
      while (ci < raw.length) {
        val c = raw.charAt(ci)
        if (c >= 'a' && c <= 'z') sb.append(c)
        ci += 1
      }
      if (sb.length > 0) {
        val seq = new Array[String](sb.length)
        var len = sb.length
        ci = 0
        while (ci < len) { seq(ci) = String.valueOf(sb.charAt(ci)); ci += 1 }
        var mi = 0
        while (mi < ms.length) {
          val l = ms(mi)._1
          val r = ms(mi)._2
          // in-place greedy pass: the write cursor never passes the read
          // cursor, so seq(w-1) is always the already-merged tail
          var w = 0
          var k = 0
          while (k < len) {
            val x = seq(k)
            if (w > 0 && seq(w - 1) == l && x == r) seq(w - 1) = l + r
            else { seq(w) = x; w += 1 }
            k += 1
          }
          len = w
          mi += 1
        }
        var k = 0
        while (k < len) { out.add(UTF8String.fromString(seq(k))); k += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** string → array<string> BPE subword tokens (see [[BpeKernel]]). */
case class BpeTokensExpr(child: Expression, mergesKey: String)
    extends UnaryExpression {
  // fail at plan time, not per-row, on an unknown table name
  BpeKernel.merges(mergesKey)
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName, child.dataType == StringType, "STRING", child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.compute(input.asInstanceOf[UTF8String], mergesKey)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.BpeKernel.compute($c, "$mergesKey")""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bpe {
  def bpeTokens(c: Column, mergesKey: String = "en16"): Column =
    GraftBridge.column(BpeTokensExpr(GraftBridge.expression(c), mergesKey))
}
