package graft

import java.security.MessageDigest

/** The ONE definition of the arithmetic the planted-fixture specs
  * re-derive ground truth with (md5 hex, hash buckets, Spark-Round
  * rounding, tokenization). Shared so two specs can never silently
  * disagree about the same kernel after a normalization tweak. */
object PlantedArith {

  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** [[graft.queries.Fragments.hashBucket]] in plain Scala: first 8 hex
    * chars of md5, base-16, mod width. */
  def bucket(key: String, width: Int): Int =
    (java.lang.Long.parseLong(md5hex(key).take(8), 16) % width).toInt

  /** Spark `round()` semantics: decimal-string BigDecimal, HALF_UP. */
  def rnd(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** [[graft.llm.TextOps.tokens]] in plain Scala: lowercase, trim,
    * whitespace split. */
  def toks(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+").toSeq
}
