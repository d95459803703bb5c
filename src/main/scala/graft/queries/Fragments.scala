package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared query fragments whose Spark and DuckDB forms MUST stay in
  * lockstep across modules: the md5 split bucket (q71's assignment is
  * also q87/q100's decontamination gate and the specs' ground truth)
  * and the text-normalization / quality-formula oracle SQL (q39's
  * formula is recomputed verbatim inside q100's capstone oracle). One
  * definition each — duplication here previously left the agreement
  * enforced only by copy-paste discipline.
  */
private[graft] object Fragments {

  /** Deterministic hash bucket 0..width-1: first 8 hex chars of
    * md5(key) mod width — a pure function of the key string, identical
    * in any engine and at any scale. The generic form behind
    * [[splitBucket]] and q141's count-min cells. */
  def hashBucket(key: Column, width: Int): Column =
    (conv(substring(md5(key), 1, 8), 16, 10)
      .cast("long") % width).cast("int")

  /** DuckDB twin of [[hashBucket]] over an arbitrary VARCHAR SQL
    * expression — MUST stay in bit-lockstep with it. */
  def hashBucketSql(expr: String, width: Int): String =
    s"(('0x' || substr(md5($expr), 1, 8))::BIGINT % $width)::INTEGER"

  /** Deterministic 60-bit sample hash: first 15 hex chars of md5(key)
    * as a non-negative BIGINT — the bottom-k sampling key of the
    * quantile sketch (q257). 60 bits so the value always fits a signed
    * long; identical in any engine and at any scale. */
  def sampleHash(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[sampleHash]] — MUST stay in bit-lockstep. */
  def sampleHashSql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Deterministic split bucket 0..99 over the `doc_id` column. */
  def splitBucket(docId: Column): Column =
    hashBucket(docId.cast("string"), 100)

  /** DuckDB twin of [[splitBucket]] over the `doc_id` column. */
  val BucketSql: String = hashBucketSql("doc_id::VARCHAR", 100)

  /** DuckDB twin of [[graft.llm.TextOps.normalized]] over `text`. */
  val NormSql: String = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** DuckDB twin of [[graft.llm.TextOps.tokens]] over `text`. */
  val ToksSql: String = s"string_split($NormSql, ' ')"

  /** DuckDB twin of [[graft.llm.TextOps.bagFingerprint]] over `text`
    * (q110 + q171 — one definition so the two queries and their oracles
    * can never drift apart). */
  val BagFpSql: String =
    s"md5(array_to_string(list_sort(list_distinct($ToksSql)), ' '))"

  /** Separator for the BPE oracle's char-joined word encoding — a
    * control char that cannot appear in the a-z-stripped words. */
  val BpeSep: String = "\u001f"

  /** DuckDB list of a-z-stripped non-empty words of `text` — the word
    * alphabet [[graft.functions.BpeKernel.compute]] tokenizes. */
  val BpeWordsSql: String =
    s"[x for x in [regexp_replace(tk, '[^a-z]', '', 'g') for tk in $ToksSql] if x <> '']"

  /** DuckDB twin of [[graft.functions.BpeKernel]] applied to ONE word
    * (lambda variable `w` by default): the merge loop textually unrolled
    * from the SAME Scala merges table the kernel reads — one nested
    * `list_reduce` greedy left-to-right pass per rule over a
    * control-char-separated char string. Evaluates to the separator-
    * joined subword string; `len(string_split(…, BpeSep))` is the
    * subword count. Because both engines derive from one table, the
    * kernel and its oracle cannot drift. */
  def bpeWordSql(mergesKey: String = "en16", wordVar: String = "w"): String = {
    val init =
      s"array_to_string([$wordVar[i] for i in range(1, len($wordVar)+1)], '$BpeSep')"
    graft.functions.BpeKernel.merges(mergesKey).foldLeft(init) { case (e, (l, r)) =>
      s"list_reduce(string_split($e, '$BpeSep'), (acc, x) -> " +
        s"CASE WHEN x = '$r' AND (acc = '$l' OR ends_with(acc, '$BpeSep$l')) " +
        s"THEN CASE WHEN acc = '$l' THEN '$l$r' " +
        s"ELSE acc[1:len(acc)-${l.length}] || '$l$r' END " +
        s"ELSE acc || '$BpeSep' || x END)"
    }
  }

  /** DuckDB rendering of [[graft.llm.TextOps.qualityScore]] term by
    * term (q39's oracle; also composed inside q100's capstone). */
  def qualitySql: String = {
    val nTok = s"len($ToksSql)"
    val punct = "len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE / greatest(length(text), 1)"
    val stopHits =
      s"len(list_filter($ToksSql, t -> list_contains(${graft.llm.TextOps.StopEn.mkString("['", "', '", "']")}, t)))"
    val stopR = s"$stopHits::DOUBLE / greatest($nTok, 1)"
    s"""round(least($nTok::DOUBLE / 50.0, 1.0) *
       |        (0.5 + 0.25 * (1.0 - least($punct * 5.0, 1.0))
       |             + 0.25 * least($stopR * 4.0, 1.0)), 4)""".stripMargin
  }
}
