package graft.queries

import graft.{Q, Tables}
import graft.llm.TextOps
import graft.operators.Merge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Training-data pipeline utilities beyond the dedup/similarity core
  * (no reference analog — the reference stops at I/O,
  * hive-io-exp-core/src/main/java/com/facebook/hiveio/input/HiveApiInputFormat.java):
  * PII redaction, deterministic dataset splits, fuzzy (edit-distance)
  * near-dup, TF-IDF terms, repetition-based quality filters, keyed
  * upsert, stratified sampling, and embedding quantization. Every query
  * is oracle-gated; float arithmetic is arranged so both engines compute
  * identical doubles (exact IEEE ops on parquet-loaded values, integer
  * ratios, floor instead of decimal rounding where a boundary could
  * flip).
  */
object Pipeline {

  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val ToksSql = s"string_split($NormSql, ' ')"

  // -------------------------------------------------------------- q70

  /** PII redaction over a contact string derived from `customer` rows
    * (the fixtures carry no raw PII, so both engines construct the same
    * contact line, then the operator under test — the regex redaction
    * chain — runs on it). Emails are redacted before phone-shaped digit
    * runs so an address's digits are not double-counted. */
  val piiRedact: Q = (s, dir) => {
    val contact = concat(
      lit("segment "), lower(col("c_mktsegment")), lit(" reach "),
      lower(col("c_name")), lit(" at "), lower(col("c_name")),
      lit("@example.com or +1-555-"),
      lpad(col("c_custkey").cast("string"), 4, "0"))
    Tables.t(s, dir, "customer")
      .select(col("c_custkey"), contact.as("contact"))
      .select(col("c_custkey"),
        TextOps.redactPii(col("contact")).as("redacted"),
        TextOps.emailCount(col("contact")).as("n_emails"),
        TextOps.phoneCount(col("contact")).as("n_phones"))
      .transform(graft.Presentation.sort(_, "c_custkey"))
  }

  val piiRedactSql: String = {
    // DuckDB single-quoted strings pass backslashes through verbatim, so
    // the Java-regex pattern strings embed unchanged (both are RE2-safe).
    val email = TextOps.EmailRe
    val phone = TextOps.PhoneRe
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    'segment ' || lower(c_mktsegment) || ' reach ' || lower(c_name) ||
       |    ' at ' || lower(c_name) || '@example.com or +1-555-' ||
       |    lpad(c_custkey::VARCHAR, 4, '0') AS contact
       |  FROM customer)
       |SELECT c_custkey,
       |  regexp_replace(regexp_replace(contact, '$email', '<EMAIL>', 'g'),
       |                 '$phone', '<PHONE>', 'g') AS redacted,
       |  len(regexp_extract_all(contact, '$email'))::INTEGER AS n_emails,
       |  len(regexp_extract_all(regexp_replace(contact, '$email', '<EMAIL>', 'g'),
       |                         '$phone'))::INTEGER AS n_phones
       |FROM c ORDER BY c_custkey""".stripMargin
  }

  // -------------------------------------------------------------- q71

  /** Deterministic train/val/test split (80/10/10) by md5 of the doc id —
    * the reproducible, engine-independent way to partition a corpus: the
    * assignment is a pure function of the key, so any engine (and any
    * rerun at any scale) derives the identical split. */
  val splitAssign: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), Fragments.splitBucket(col("doc_id")).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .transform(graft.Presentation.sort(_, "doc_id"))

  val splitAssignSql: String =
    s"""SELECT doc_id,
       |  ${Fragments.BucketSql} AS bucket,
       |  CASE WHEN ${Fragments.BucketSql} < 80 THEN 'train'
       |       WHEN ${Fragments.BucketSql} < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q72

  /** Session conf key for q72's per-block size cap — the
    * [[graft.llm.Lsh.MaxBucketConf]] discipline applied to the fuzzy
    * join. Three modes:
    *
    *  - **unset (the DEFAULT): AUTO** — the cap is derived from the
    *    corpus's own block-size distribution via [[autoMaxBlock]], the
    *    largest per-block population whose kept-block pair work fits
    *    [[FuzzyPairBudgetConf]]. A corpus whose total pair space
    *    already fits runs EXACT (no block dropped — the fixture case);
    *    one whose blocks have exploded (the block key's cardinality is
    *    corpus-independent, so block populations grow linearly with the
    *    corpus and the pair space quadratically) sheds only its largest
    *    blocks until the work is bounded. The autoNlist precedent
    *    (`llm/Similarity.scala`): a naive call at 100× the corpus must
    *    not reproduce a measured explosion by default.
    *  - **a positive count**: fixed cap — blocks holding more documents
    *    are dropped from the pair join entirely.
    *  - **zero or negative: EXACT** — uncapped all-pairs semantics,
    *    what the q72 oracle replays (the registry entry pins this
    *    explicitly, the q181 nlist=16 discipline).
    *
    * Every dropped block is counted in [[fuzzyDroppedBlocks]]; the
    * capped output stays a strict subset of the exact semantics. */
  val FuzzyMaxBlockConf = "spark.graft.fuzzy.maxBlock"

  /** Session conf key for the AUTO mode's total pair budget (default
    * [[DefaultFuzzyPairBudget]]): the kept blocks' Σ n·(n−1)/2 is held
    * at or under this, bounding the Levenshtein DP work absolutely —
    * each pair's DP is a fixed 64×64, so budget × O(1) is the whole
    * join cost regardless of corpus size. */
  val FuzzyPairBudgetConf = "spark.graft.fuzzy.pairBudget"

  /** ~2·10⁷ capped 64×64 DPs — a few seconds of distributed compute,
    * comfortably above every measured fixture's total pair space
    * (sf0.1: 1.96·10⁴ pairs) so real corpora at test scale run exact,
    * and ~100× under the pair space that measured 153 s on the 10×
    * synthetic corpus (SCALE.md q72 row). */
  val DefaultFuzzyPairBudget = 20000000L

  /** The largest per-block population cap such that the pair work of
    * the KEPT blocks (every block at or under the cap; larger blocks
    * drop entirely) fits `budget`. Returns Int.MaxValue when the whole
    * distribution fits — the exact case. Monotone water-filling: blocks
    * are admitted smallest-first, so the cap sheds as few blocks as
    * possible, always the largest ones. */
  private[graft] def autoMaxBlock(sizes: Array[Long], budget: Long): Int = {
    def pairs(n: Long) = n * (n - 1) / 2
    if (sizes.map(pairs).sum <= budget) return Int.MaxValue
    // group by population: a cap of c keeps EVERY block sized c, so
    // feasibility is judged per size class, cumulatively smallest-first
    val classes = sizes.groupBy(identity).toSeq
      .map { case (n, g) => (n, pairs(n) * g.length) }.sortBy(_._1)
    var work = 0L
    var best = 1L
    classes.foreach { case (n, w) =>
      work += w
      if (work <= budget) best = n
    }
    math.min(best, Int.MaxValue.toLong).toInt
  }

  /** One dropped-block accumulator per session ("graft.fuzzy.
    * droppedBlocks" in the Spark UI) — an accumulator, not `observe`,
    * for the same AQE empty-relation reason as Lsh's. Diagnostic, not
    * data (task retries may over-count). */
  private val fuzzyAccs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      org.apache.spark.util.LongAccumulator]())

  private def fuzzyAccFor(s: org.apache.spark.sql.SparkSession) =
    fuzzyAccs.synchronized {
      var acc = fuzzyAccs.get(s)
      if (acc == null) {
        acc = s.sparkContext.longAccumulator("graft.fuzzy.droppedBlocks")
        fuzzyAccs.put(s, acc)
      }
      acc
    }

  /** Total fuzzy-join blocks dropped by the size cap this session. */
  def fuzzyDroppedBlocks(s: org.apache.spark.sql.SparkSession): Long =
    fuzzyAccFor(s).value

  /** Fuzzy near-dup pairs by edit distance on the 64-char normalized
    * prefix, blocked on (lang, source, length band) so the pair space is
    * per-block quadratic, never corpus-quadratic; the 64-char cap bounds
    * each DP to 64×64, so cost per pair is O(1) at any corpus size.
    *
    * SCALE CAVEAT (measured, SCALE.md scaling table): the block key's
    * cardinality is corpus-INDEPENDENT (langs × sources × ~100 bands),
    * so blocks grow linearly with the corpus and the intra-block pair
    * space quadratically — the 10× ScaleProbe run measured 250× on a
    * shared-vocab synthetic corpus. This is the audit/EDA shape for
    * corpora whose block sizes are operationally bounded; the DEFAULT
    * [[FuzzyMaxBlockConf]] AUTO cap bounds it for everyone else
    * (dropped blocks surfaced via the accumulator). For lossless
    * open-scale near-dup use the candidate-bounded paths — MinHash-LSH
    * (q32, `llm/Dedup.minhashLsh`) or the prefix-filtered
    * set-similarity join (q136, `llm/SetSimilarity`) — whose bucket
    * sizes track content, not corpus size, and verify survivors
    * exactly. (No lossless candidate filter exists for THIS predicate:
    * at sim ≥ 0.35 the q-gram count bound `shared ≥ len − q + 1 − k·q`
    * is vacuous for k = 0.65·64 ≈ 41 edits, so any prefix-filter
    * routing of oversized blocks would silently change semantics —
    * bounded-subset-with-accounting is the honest contract.) */
  val fuzzyPairs: Q = (s, dir) =>
    fuzzyPairsWith(s, dir, s.conf.getOption(FuzzyMaxBlockConf))

  /** The shared implementation, cap mode THREADED AS A PARAMETER (the
    * conf's value semantics, verbatim): [[fuzzyPairsExact]] used to pin
    * exactness by set-conf/run/unset-conf, which a concurrent
    * [[fuzzyPairs]] caller on the same session could observe mid-window
    * (and whose finally-unset could clobber an interleaved set). Only
    * [[fuzzyPairs]] reads the session conf now, once, at entry. */
  private def fuzzyPairsWith(s: org.apache.spark.sql.SparkSession, dir: String,
                             capMode: Option[String]): org.apache.spark.sql.DataFrame = {
    val dAll = Tables.t(s, dir, "documents").select(
      col("doc_id"), col("lang"), col("source"),
      floor(col("n_chars") / 64).as("band"),
      substring(TextOps.normalized(col("text")), 1, 64).as("p"))
    val cap = capMode match {
      case Some(v) if v != "auto" && v.toInt > 0 => v.toInt // explicit fixed cap
      case Some(v) if v != "auto" => Int.MaxValue // explicit 0/negative: exact
      case _ => // DEFAULT (unset or literal "auto"): derive from the distribution
        // one extra bounded aggregation pass (block-key cardinality is
        // corpus-independent, so the collect is a few-thousand longs)
        val sizes = dAll.groupBy("lang", "source", "band")
          .agg(count(lit(1)).as("block_n"))
          .select("block_n").collect().map(_.getLong(0))
        autoMaxBlock(sizes, s.conf.getOption(FuzzyPairBudgetConf)
          .map(_.toLong).getOrElse(DefaultFuzzyPairBudget))
    }
    val d = if (cap == Int.MaxValue) dAll else {
      val acc = fuzzyAccFor(s)
      val keep = udf { (n: Long) =>
        val ok = n <= cap
        if (!ok) acc.add(1L)
        ok
      }
      // block-key cardinality is corpus-independent, so the kept-key
      // list broadcasts at any corpus size
      val keptKeys = dAll.groupBy("lang", "source", "band")
        .agg(count(lit(1)).as("block_n"))
        .filter(keep(col("block_n")))
        .select("lang", "source", "band")
      dAll.join(broadcast(keptKeys), Seq("lang", "source", "band"))
    }
    val a = d.select(col("doc_id").as("doc_a"), col("lang"), col("source"),
      col("band"), col("p").as("p_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("lang"), col("source"),
      col("band"), col("p").as("p_b"))
    val lev = levenshtein(col("p_a"), col("p_b"))
    val sim = round(lit(1.0) -
      lev.cast("double") / greatest(length(col("p_a")), length(col("p_b"))), 4)
    a.join(b, Seq("lang", "source", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lev.as("lev"), sim.as("sim"))
      .filter(col("sim") >= 0.35)
      .orderBy("doc_a", "doc_b")
  }

  /** The q72 REGISTRY entry: pins the exact uncapped semantics the
    * DuckDB oracle replays when the caller hasn't set
    * [[FuzzyMaxBlockConf]] (the q181 nlist=16 discipline — the OPERATOR
    * default is the auto cap; the ORACLE ROW is exact all-pairs). An
    * explicitly set conf passes through untouched, so ScaleProbe's
    * `@cap`/`@auto` suffixes still steer the registry query. */
  val fuzzyPairsExact: Q = (s, dir) =>
    // exactness pinned by PARAMETER, not by mutating the shared session
    // conf (see fuzzyPairsWith): unset conf ⇒ exact ("0"); an explicitly
    // set conf passes through untouched
    fuzzyPairsWith(s, dir,
      Some(s.conf.getOption(FuzzyMaxBlockConf).getOrElse("0")))

  val fuzzyPairsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, source, n_chars // 64 AS band,
       |         substr($NormSql, 1, 64) AS p
       |  FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  levenshtein(a.p, b.p)::INTEGER AS lev,
       |  round(1.0 - levenshtein(a.p, b.p)::DOUBLE /
       |        greatest(length(a.p), length(b.p)), 4) AS sim
       |FROM d a JOIN d b
       |  ON a.lang = b.lang AND a.source = b.source AND a.band = b.band
       |  AND a.doc_id < b.doc_id
       |WHERE round(1.0 - levenshtein(a.p, b.p)::DOUBLE /
       |        greatest(length(a.p), length(b.p)), 4) >= 0.35
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------- q73

  /** Top-3 TF-IDF terms per document. idf is the raw inverse document
    * frequency ratio N/df (log-free on purpose: tf·N/df is a ratio of
    * exact integers, so the double score is bit-identical across
    * engines, while log(N/df) is one libm ulp away from portable).
    * Ranking ties break on term ascending. */
  val tfidfTopTerms: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val tf = d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n"))
    val score = round((col("tf") * col("n")).cast("double") / col("df"), 4)
    tf.join(df, "term").crossJoin(broadcast(n)) // single-row corpus count
      .select(col("doc_id"), col("term"), score.as("tfidf"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("term").asc)).cast("int"))
      .filter(col("rk") <= 3)
      .orderBy("doc_id", "rk")
  }

  val tfidfTopTermsSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    round((tf.tf * n.n)::DOUBLE / df.df, 4) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tfidf,
       |    (row_number() OVER (PARTITION BY doc_id
       |       ORDER BY tfidf DESC, term ASC))::INTEGER AS rk
       |  FROM scored)
       |SELECT doc_id, term, tfidf, rk FROM ranked
       |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // -------------------------------------------------------------- q74

  /** Repetition-based quality signals (the Gopher-style filters): the
    * most-frequent-token fraction and the duplicate-2-gram fraction,
    * plus the resulting keep/drop flag. Every ratio is a quotient of
    * exact integers — bit-identical across engines. */
  val repetitionQuality: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val base = d.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("n_tok"),
      size(TextOps.wordShingles(col("text"), 2)).as("d2"))
    val maxTf = d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id").agg(max(col("tf")).as("max_tf"))
    val topFrac = round(col("max_tf").cast("double") / col("n_tok"), 4)
    val dup2 = when(col("n_tok") >= 2,
      round(lit(1.0) - col("d2").cast("double") / (col("n_tok") - 1), 4))
      .otherwise(0.0)
    base.join(maxTf, "doc_id")
      .select(col("doc_id"), col("n_tok"),
        topFrac.as("top_tok_frac"), dup2.as("dup_2gram_frac"))
      .withColumn("flagged",
        col("top_tok_frac") > 0.2 || col("dup_2gram_frac") > 0.5)
      .orderBy("doc_id")
  }

  val repetitionQualitySql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |base AS (
       |  SELECT doc_id, len(toks)::INTEGER AS n_tok,
       |    len(list_distinct([array_to_string(toks[i:i+1], ' ')
       |      for i in range(1, len(toks))]))::INTEGER AS d2
       |  FROM t),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
       |mx AS (SELECT doc_id, max(tf) AS max_tf FROM tf GROUP BY 1)
       |SELECT base.doc_id, base.n_tok,
       |  round(mx.max_tf::DOUBLE / base.n_tok, 4) AS top_tok_frac,
       |  CASE WHEN base.n_tok >= 2
       |       THEN round(1.0 - base.d2::DOUBLE / (base.n_tok - 1), 4)
       |       ELSE 0.0 END AS dup_2gram_frac,
       |  (round(mx.max_tf::DOUBLE / base.n_tok, 4) > 0.2 OR
       |   CASE WHEN base.n_tok >= 2
       |        THEN round(1.0 - base.d2::DOUBLE / (base.n_tok - 1), 4)
       |        ELSE 0.0 END > 0.5) AS flagged
       |FROM base JOIN mx USING (doc_id) ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q75

  /** Keyed upsert (CDC apply): an update batch (even keys, price bumped,
    * status 'U') applied over a base snapshot (keys not divisible by 3).
    * Matched keys take the whole update row; unmatched updates insert.
    * The price delta is an exact IEEE add (no decimal rounding), so the
    * merged doubles are bit-identical across engines. */
  val mergeUpsert: Q = (s, dir) => {
    val orders = Tables.t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 3 =!= 0)
    val updates = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 10.0).as("o_totalprice"))
    Merge.upsert(base, updates, Seq("o_orderkey"))
      .transform(graft.Presentation.sort(_, "o_orderkey"))
  }

  val mergeUpsertSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |upd AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus,
      |         o_totalprice + 10.0::DOUBLE AS o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
      |       ELSE b.o_orderstatus END AS o_orderstatus,
      |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
      |       ELSE b.o_totalprice END AS o_totalprice
      |FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- q76

  /** Stratified fixed-size sample: exactly 10 documents per source,
    * chosen by md5-of-id order — a deterministic stand-in for per-stratum
    * uniform sampling (the md5 order is uncorrelated with content), so
    * the "random" subset is reproducible on any engine. One window per
    * stratum; no global shuffle beyond the partitionBy. */
  val stratifiedSample: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        row_number().over(Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .cast("int").as("rk"))
      .filter(col("rk") <= 10)
      .orderBy("source", "rk")

  val stratifiedSampleSql: String =
    """SELECT source, doc_id, rk FROM (
      |  SELECT source, doc_id,
      |    (row_number() OVER (PARTITION BY source
      |       ORDER BY md5(doc_id::VARCHAR), doc_id))::INTEGER AS rk
      |  FROM documents)
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  // -------------------------------------------------------------- q77

  /** Int8 scalar quantization of embedding dims 0–3: per-dim global
    * min/max (a 4-row broadcast), then q = floor(norm·255) − 128 ∈
    * [−128, 127]. floor of a shared IEEE double is bit-deterministic
    * (unlike decimal rounding), so the quantized codes hash-match across
    * engines. The same plan quantizes all 64 dims at 100 TB: one
    * map-combinable per-dim agg + a broadcast join — no corpus shuffle.
    * QuantizeSpec bounds the reconstruction error. */
  val quantizeInt8: Q = (s, dir) => {
    val e = Tables.t(s, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(slice(col("embedding").cast("array<double>"), 1, 4))
          .as(Seq("pos", "v")))
    val stats = e.groupBy("pos").agg(min("v").as("mn"), max("v").as("mx"))
    e.join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos"),
        (floor((col("v") - col("mn")) / (col("mx") - col("mn")) * 255) - 128)
          .cast("int").as("q"))
      .transform(graft.Presentation.sort(_, "vec_id", "pos"))
  }

  val quantizeInt8Sql: String =
    """WITH e AS (
      |  SELECT vec_id, k.k::INTEGER AS pos, embedding[k.k + 1]::DOUBLE AS v
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(4)) AS k) k),
      |st AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM e GROUP BY pos)
      |SELECT e.vec_id, e.pos,
      |  (floor((e.v - st.mn) / (st.mx - st.mn) * 255)::BIGINT - 128)::INTEGER AS q
      |FROM e JOIN st USING (pos) ORDER BY vec_id, pos""".stripMargin

  // -------------------------------------------------------------- q80

  /** Event-funnel analysis: how many users progressed view → click →
    * purchase, each step strictly after the previous step's first
    * occurrence and the purchase within 7 days of the first view. Three
    * keyed aggregations + two keyed joins on user_id — all
    * map-combinable, no step is corpus-quadratic; the sequence
    * constraint lives in per-user timestamp predicates, not in ordering
    * whole partitions. */
  val funnelSteps: Q = (s, dir) => {
    val ev = Tables.t(s, dir, "events").select("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def cnt(df: org.apache.spark.sql.DataFrame, step: String) =
      df.agg(count(lit(1)).as("users")).withColumn("step", lit(step))
    cnt(s1, "1_view").unionByName(cnt(s2, "2_click")).unionByName(cnt(s3, "3_purchase"))
      .select("step", "users").orderBy("step")
  }

  val funnelStepsSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
      |    AND e.ts <= s2.t1 + INTERVAL 7 DAY
      |  GROUP BY 1)
      |SELECT step, users FROM (
      |  SELECT '1_view' AS step, count(*) AS users FROM s1
      |  UNION ALL SELECT '2_click', count(*) FROM s2
      |  UNION ALL SELECT '3_purchase', count(*) FROM s3)
      |ORDER BY step""".stripMargin

  // -------------------------------------------------------------- q81

  /** Latest-record-per-key compaction (the read side of CDC): keep each
    * (user, event_type)'s most recent event, ties by highest event_id.
    * The rank-1 window compiles to WindowGroupLimit, so each map task
    * pre-prunes to one row per key before the exchange — at 100 TB the
    * shuffle approaches one row per distinct key, which is the floor. */
  val latestPerKey: Q = (s, dir) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy("user_id", "event_type")
  }

  val latestPerKeySql: String =
    """SELECT user_id, event_type, event_id, round(value, 2) AS value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // -------------------------------------------------------------- q82

  /** Unigram-LM quality signals (the CCNet/RefinedWeb-style frequency
    * filter, log-free): per document, the fraction of tokens inside the
    * top-10 corpus vocabulary and the mean corpus count of its tokens.
    * Both are integer sums divided once at the end, so the doubles are
    * order-independent and bit-identical across engines (a true
    * per-token log-prob mean would be a float sum whose shuffle order
    * is not reproducible). Vocabulary selection is top-k over the
    * aggregated term counts — TakeOrderedAndProject, no global sort. */
  val lmScore: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val toks = d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val cnt = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val vocab = cnt.orderBy(col("cnt").desc, col("term").asc).limit(10)
      .select(col("term"), lit(1).as("in_vocab"))
    toks.join(cnt, "term").join(vocab, Seq("term"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).cast("int").as("n_tok"),
        round(sum(coalesce(col("in_vocab"), lit(0))).cast("double") /
          count(lit(1)), 4).as("common_frac"),
        round(sum(col("cnt")).cast("double") / count(lit(1)), 4).as("mean_tok_count"))
      .orderBy("doc_id")
  }

  val lmScoreSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
       |cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
       |vocab AS (
       |  SELECT term, 1 AS in_vocab FROM cnt
       |  ORDER BY cnt DESC, term ASC LIMIT 10)
       |SELECT t.doc_id, count(*)::INTEGER AS n_tok,
       |  round(sum(coalesce(v.in_vocab, 0))::DOUBLE / count(*), 4) AS common_frac,
       |  round(sum(c.cnt)::DOUBLE / count(*), 4) AS mean_tok_count
       |FROM tok t JOIN cnt c USING (term) LEFT JOIN vocab v USING (term)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q188

  /** CCNet-style per-language quality terciles: every document gets a
    * unigram-LM commonness score (q82's mean corpus token count — the
    * log-free perplexity proxy, one exact-integer division per doc),
    * then each LANGUAGE is cut into head / middle / tail thirds by
    * exact order statistics — the bucketing CCNet uses to stratify
    * Common Crawl before sampling. Tercile assignment is integer
    * arithmetic (3·rank ≤ n, 3·rank ≤ 2n), never a float quantile, so
    * the cut is bit-identical in both engines; the per-bucket mean is
    * one division of integer sums at the end.
    *
    * Scale shape: token explode + one term-keyed count join (the q82
    * plan) feed a per-doc aggregate; the tercile window shuffles once
    * on lang — each task sorts ONE language's docs, and at extreme
    * per-language cardinality the documented alternative is sketch cut
    * points broadcast map-side (the q90→`Quantiles.bucketByQuantiles`
    * path, same contract minus exactness at the boundary). */
  val ccnetBuckets: Q = (s, dir) => {
    val toks = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("term"))
    val cnt = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val ds = toks.join(cnt, "term")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tok"), sum("cnt").as("sum_cnt"))
      .withColumn("doc_mean",
        round(col("sum_cnt").cast("double") / col("n_tok"), 6))
    val w = Window.partitionBy("lang")
    val b = ds
      .withColumn("rn", row_number().over(
        w.orderBy(col("doc_mean").desc, col("doc_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
    b.groupBy("lang", "bucket")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        round(sum("sum_cnt").cast("double") / sum("n_tok"), 4)
          .as("mean_tok_count"),
        min("doc_mean").as("min_doc_mean"),
        max("doc_mean").as("max_doc_mean"))
      .orderBy("lang", "bucket")
  }

  val ccnetBucketsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest($ToksSql) AS term FROM documents),
       |cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
       |ds AS (
       |  SELECT t.doc_id, t.lang, count(*)::BIGINT AS n_tok,
       |    sum(c.cnt)::BIGINT AS sum_cnt,
       |    round(sum(c.cnt)::DOUBLE / count(*), 6) AS doc_mean
       |  FROM tok t JOIN cnt c USING (term) GROUP BY 1, 2),
       |b AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY doc_mean DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM ds)
       |SELECT lang,
       |  CASE WHEN rn * 3 <= n THEN 'head'
       |       WHEN rn * 3 <= n * 2 THEN 'middle'
       |       ELSE 'tail' END AS bucket,
       |  count(*)::INT AS n_docs,
       |  round(sum(sum_cnt)::DOUBLE / sum(n_tok), 4) AS mean_tok_count,
       |  min(doc_mean) AS min_doc_mean, max(doc_mean) AS max_doc_mean
       |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- q84

  /** Equal-width histogram of order totals (data profiling / optimizer
    * stats shape): 10 buckets over the global min/max — one min/max agg
    * broadcast back, bucket index by floor of an identical IEEE double
    * (the cross-engine-safe discretizer; decimal round is not), one
    * map-combinable count per bucket. */
  val histogram: Q = (s, dir) => {
    val o = Tables.t(s, dir, "orders")
    val mm = o.agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
    o.crossJoin(broadcast(mm))
      .select(least(lit(9), floor((col("o_totalprice") - col("mn")) /
        (col("mx") - col("mn")) * 10)).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val histogramSql: String =
    """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
      |SELECT least(9, floor((o_totalprice - mn) / (mx - mn) * 10))::INTEGER AS bucket,
      |       count(*) AS n
      |FROM orders CROSS JOIN mm
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q85

  /** Pearson correlation + stddevs of (quantity, price) per return flag —
    * the stats-function surface. The five moment sums are exact,
    * order-independent BIGINTs (quantity in hundredths — 2-decimal data;
    * price in whole dollars so Σy² stays in 63 bits through ~sf10;
    * DECIMAL is the escape hatch beyond), then the closed-form formula
    * runs once in double over those identical integers with identical
    * op order — deterministic across engines. The built-in
    * corr()/stddev() are streaming float accumulators whose result is
    * merge-order-dependent: fine in one engine, unreproducible in two. */
  val corrStats: Q = (s, dir) => {
    val x = round(col("l_quantity") * 100).cast("long")
    val y = round(col("l_extendedprice")).cast("long")
    val d = (c: String) => col(c).cast("double")
    Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt(d("n") * d("sxx") - d("sx") * d("sx")) /
          sqrt(d("n") * d("syy") - d("sy") * d("sy")), 6).as("corr_qty_price"),
        round(sqrt(d("n") * d("sxx") - d("sx") * d("sx")) / d("n") / 100, 4)
          .as("sd_qty"),
        round(sqrt(d("n") * d("syy") - d("sy") * d("sy")) / d("n"), 4)
          .as("sd_price_usd"))
      .orderBy("l_returnflag")
  }

  val corrStatsSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
      |    sum(y * y)::BIGINT AS syy
      |  FROM (SELECT l_returnflag,
      |          round(l_quantity * 100)::BIGINT AS x,
      |          round(l_extendedprice)::BIGINT AS y
      |        FROM lineitem)
      |  GROUP BY 1)
      |SELECT l_returnflag, n,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |        sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) /
      |        sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE), 6)
      |    AS corr_qty_price,
      |  round(sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |        / n::DOUBLE / 100, 4) AS sd_qty,
      |  round(sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
      |        / n::DOUBLE, 4) AS sd_price_usd
      |FROM m ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------- q195

  /** Weighted median (the robust location statistic q115's unweighted
    * mode/median battery lacks): per return flag, the smallest
    * extended price whose CUMULATIVE quantity weight reaches half the
    * flag's total — quantity-weighted, so a single high-volume line
    * moves the median the way a thousand rows would. The qualifying
    * test is the integer-exact cross-multiplication 2·cum ≥ tot over
    * integral-valued doubles (quantities are whole numbers far below
    * 2^53, so every cumulative sum is EXACT and the boundary cannot
    * flip between engines); the cumulative order is fully keyed
    * (price, orderkey, linenumber) so no tie is engine-arbitrary.
    *
    * Scale shape: one window exchange keyed on the flag (each task
    * scans one flag's stream in order) + the same-keyed total; the
    * qualifying-suffix min collapses in a map-combinable agg. At
    * extreme per-flag cardinality the documented alternative is the
    * q90 sketch path (broadcast approximate cut, exactness at the
    * boundary traded away). */
  val weightedMedian: Q = (s, dir) => {
    // BOUNDED-SPINE shape (the q227 discipline): the running window
    // partitions on l_returnflag — 3 keys — so a row-level cumulative
    // sum serializes the whole corpus onto 3 tasks (measured 15.7× on
    // the 10×→100× ScaleProbe decade before this rewrite). Instead,
    // pre-aggregate weight onto the (flag, price) VALUE SPINE — a
    // map-side-combinable keyed aggregate whose size is bounded by the
    // price domain, not the corpus — and run the window over the spine.
    // Selection is provably identical: the smallest price whose
    // full-group cumulative reaches half the total is exactly the price
    // of the first crossing row in the row-level order (rows below that
    // price group all sit strictly under half by construction).
    val spine = Tables.t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(sum("l_quantity").as("w"))
    val cumW = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy("l_returnflag")
    spine
      .withColumn("cum", sum("w").over(cumW))
      .withColumn("tot", sum("w").over(totW))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("w_median_price"),
        max("tot").cast("long").as("total_weight"))
      .orderBy("l_returnflag")
  }

  val weightedMedianSql: String =
    """WITH spine AS (
      |  SELECT l_returnflag, l_extendedprice, sum(l_quantity) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |x AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    sum(w) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM spine)
      |SELECT l_returnflag, min(l_extendedprice) AS w_median_price,
      |  max(tot)::BIGINT AS total_weight
      |FROM x WHERE cum * 2 >= tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q202

  /** Half-life-decayed engagement score — recency weighting with NO
    * libm transcendental: weight = 2^(−age_days) with integer day
    * ages, and every power of two is EXACTLY representable (IEEE pow
    * on (2, −n) is exact for n ≤ 1074), so the decay curve is
    * bit-identical in both engines where an e^(−λt) form would be one
    * libm ulp apart. Deliberately expressed through `spark.sql` over a
    * temp view — the SQL entry path of the engine exercised through
    * the same oracle gate as the DataFrame API (SURVEY §2's
    * `spark.sql(...)` surface).
    *
    * Scale shape: one single-row max broadcast, a map-side age/weight
    * projection, one keyed aggregate, TakeOrdered top-20. */
  val halflifeDecay: Q = (s, dir) => {
    // unique per-invocation view name, dropped right after analysis
    // (spark.sql resolves the view into the plan eagerly), so the
    // query stays reentrant on a shared session and leaks no catalog
    // entry — every other registry entry is a pure (session, dir)
    // function and this one must behave the same
    val view = "graft_events_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    Tables.t(s, dir, "events").createOrReplaceTempView(view)
    try s.sql(s"""
      |WITH mx AS (SELECT max(ts) AS mx FROM $view),
      |d AS (
      |  SELECT user_id, value,
      |    datediff(CAST(mx.mx AS DATE), CAST(ts AS DATE)) AS age
      |  FROM $view CROSS JOIN mx
      |  WHERE event_type = 'purchase')
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(value * power(2.0, -age)), 4) AS decayed_value
      |FROM d GROUP BY user_id
      |ORDER BY decayed_value DESC, user_id LIMIT 20""".stripMargin)
    finally { s.catalog.dropTempView(view); () }
  }

  val halflifeDecaySql: String =
    """WITH mx AS (SELECT max(ts) AS mx FROM events),
      |d AS (
      |  SELECT user_id, value,
      |    date_diff('day', CAST(ts AS DATE), CAST(mx AS DATE)) AS age
      |  FROM events CROSS JOIN mx
      |  WHERE event_type = 'purchase')
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(value * pow(2.0, -age)), 4) AS decayed_value
      |FROM d GROUP BY user_id
      |ORDER BY decayed_value DESC, user_id LIMIT 20""".stripMargin

  // -------------------------------------------------------------- q200

  /** One-query corpus health report — the dashboard row a curation run
    * opens with, every number derived in a single corpus pass: doc and
    * token volume, exact-duplicate fraction (q30's fingerprint),
    * language/source cardinalities, and the q39 quality profile (mean
    * score + low-quality fraction at the 0.5 gate). Emitted as
    * (metric, value) rows so downstream tooling diffs two reports with
    * a join. Every value is a count, an exact-integer ratio, or an
    * average of already-4dp-rounded scores — rounded once, identically
    * in both engines.
    *
    * Scale shape: ONE aggregate over the corpus (count-distincts are
    * the only expand), then a 9-row literal explode. No joins, no
    * windows; the corpus is touched once map-side. */
  val corpusReport: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("lang"), col("source"),
        TextOps.fingerprint(col("text")).as("fp"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
        TextOps.qualityScore(col("text")).as("q"))
    val a = d.agg(
      count(lit(1)).as("nd"), sum("n_tok").as("st"),
      countDistinct("fp").as("dfp"), countDistinct("lang").as("nl"),
      countDistinct("source").as("ns"),
      sum(when(col("q") < 0.5, 1L).otherwise(0L)).as("lowq"),
      // quality scores are exact 4-dp values, so sum them as integer
      // ten-thousandths: the mean is then one exact-integer division
      // rounded once, immune to Spark-vs-DuckDB float summation order
      // (the q192/q198 boundary exposure, closed here instead of bounded)
      sum(round(col("q") * 10000).cast("long")).as("sqi"))
    def m(name: String, value: org.apache.spark.sql.Column) =
      struct(lit(name).as("metric"), value.cast("double").as("value"))
    a.select(explode(array(
      m("exact_dup_frac",
        round(lit(1.0) - col("dfp").cast("double") / col("nd").cast("double"), 6)),
      m("low_quality_frac",
        round(col("lowq").cast("double") / col("nd").cast("double"), 6)),
      m("mean_doc_tokens",
        round(col("st").cast("double") / col("nd").cast("double"), 4)),
      m("mean_quality",
        round(col("sqi").cast("double") / (col("nd").cast("double") * 10000.0), 6)),
      m("n_distinct_fingerprints", col("dfp")),
      m("n_docs", col("nd")),
      m("n_langs", col("nl")),
      m("n_sources", col("ns")),
      m("n_tokens", col("st")))).as("r"))
      .select(col("r.metric"), col("r.value"))
      .orderBy("metric")
  }

  val corpusReportSql: String = {
    val q = Fragments.qualitySql
    s"""WITH a AS (
       |  SELECT count(*) AS nd, sum(len($ToksSql))::BIGINT AS st,
       |    count(DISTINCT md5(${Fragments.NormSql})) AS dfp,
       |    count(DISTINCT lang) AS nl, count(DISTINCT source) AS ns,
       |    sum(CASE WHEN $q < 0.5 THEN 1 ELSE 0 END)::BIGINT AS lowq,
       |    sum(round($q * 10000)::BIGINT)::BIGINT AS sqi
       |  FROM documents)
       |SELECT metric, value FROM (
       |  SELECT 'exact_dup_frac' AS metric,
       |    round(1.0 - dfp::DOUBLE / nd::DOUBLE, 6) AS value FROM a
       |  UNION ALL SELECT 'low_quality_frac',
       |    round(lowq::DOUBLE / nd::DOUBLE, 6) FROM a
       |  UNION ALL SELECT 'mean_doc_tokens',
       |    round(st::DOUBLE / nd::DOUBLE, 4) FROM a
       |  UNION ALL SELECT 'mean_quality',
       |    round(sqi::DOUBLE / (nd::DOUBLE * 10000.0), 6) FROM a
       |  UNION ALL SELECT 'n_distinct_fingerprints', dfp::DOUBLE FROM a
       |  UNION ALL SELECT 'n_docs', nd::DOUBLE FROM a
       |  UNION ALL SELECT 'n_langs', nl::DOUBLE FROM a
       |  UNION ALL SELECT 'n_sources', ns::DOUBLE FROM a
       |  UNION ALL SELECT 'n_tokens', st::DOUBLE FROM a)
       |ORDER BY metric""".stripMargin
  }

  // -------------------------------------------------------------- q300

  /** Model-gate governance report (q300): q200 opened the curation run
    * with volume/dup/quality numbers; this closes it with the ROUND-7
    * gate metrics, all from ONE corpus pass — learned-classifier keep
    * rate (q258's gate), rule↔learned agreement (q273's observed
    * agreement as a dashboard number), the readability mix (share at
    * 'standard' or easier, q288's integer score), mean readability,
    * and language-ID accuracy (q297's diagonal). Every value is an
    * exact half-away integer quotient of exact counts — the report two
    * runs diff with a join, with zero float-rounding exposure. */
  val modelGateReport: Q = (s, dir) => {
    val w = graft.functions.QualityModel.fixture()
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"),
        TextOps.linearQualityScore(col("text"), w).getField("w_sum")
          .as("w_sum"),
        (TextOps.qualityScore(col("text")) >= 0.3).as("rule_keep"),
        (TextOps.langId(col("text")) === col("lang")).as("lang_hit"),
        TextOps.tokens(col("text")).as("toks"))
      .withColumn("wds",
        greatest(expr("size(filter(toks, x -> x != ''))"), lit(1))
          .cast("long"))
      .withColumn("sn",
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long"))
      .withColumn("ch", length(col("text")).cast("long"))
      .withColumn("mm",
        lit(206835L) * col("sn") * col("wds") -
          lit(1015L) * col("wds") * col("wds") -
          lit(8460L) * col("ch") * col("sn"))
      .withColumn("den", lit(10L) * col("sn") * col("wds"))
      .withColumn("s2", expr(
        "CASE WHEN mm >= 0 THEN (mm * 2 + den) DIV (2 * den) " +
        "ELSE -((-mm * 2 + den) DIV (2 * den)) END"))
    val a = d.agg(count(lit(1)).as("nd"),
      sum(when(col("w_sum") > 0, 1L).otherwise(0L)).as("keepn"),
      sum(when(col("rule_keep") === (col("w_sum") > 0), 1L).otherwise(0L))
        .as("agreen"),
      sum(when(col("s2") >= 5000, 1L).otherwise(0L)).as("stdn"),
      sum("s2").as("ss2"),
      sum(when(col("lang_hit"), 1L).otherwise(0L)).as("langn"))
    def frac6(x: String) =
      expr(s"($x * 2000000 + nd) DIV (2 * nd)").cast("double") / 1e6
    def m(name: String, value: org.apache.spark.sql.Column) =
      struct(lit(name).as("metric"), value.cast("double").as("value"))
    a.select(explode(array(
      m("gate_agreement_frac", frac6("agreen")),
      m("langid_accuracy", frac6("langn")),
      m("learned_keep_frac", frac6("keepn")),
      m("mean_readability2", expr(
        "CASE WHEN ss2 >= 0 THEN (ss2 * 2 + nd) DIV (2 * nd) " +
        "ELSE -((-ss2 * 2 + nd) DIV (2 * nd)) END").cast("double") / 100.0),
      m("n_docs", col("nd")),
      m("readability_std_plus_frac", frac6("stdn")))).as("r"))
      .select(col("r.metric"), col("r.value"))
      .orderBy("metric")
  }

  val modelGateReportSql: String = {
    val wsum = s"(${Curation.learnedWsumSql("toks")})::BIGINT"
    def hits(lst: Seq[String]) =
      s"len(list_filter(toks, t -> list_contains(${lst.mkString("['", "', '", "']")}, t)))"
    val en = hits(TextOps.StopEn); val de = hits(TextOps.StopDe)
    val fr = hits(TextOps.StopFr); val es = hits(TextOps.StopEs)
    s"""WITH t AS (SELECT doc_id, text, lang, $ToksSql AS toks FROM documents),
       |d AS (
       |  SELECT doc_id,
       |    $wsum > 0 AS keep,
       |    (${Fragments.qualitySql}) >= 0.3 AS rule_keep,
       |    (CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |          WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       |          WHEN $de >= $fr AND $de >= $es THEN 'de'
       |          WHEN $fr >= $es THEN 'fr'
       |          ELSE 'es' END) = lang AS lang_hit,
       |    greatest(len(list_filter(toks, x -> x <> '')), 1)::BIGINT AS wds,
       |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS sn,
       |    length(text)::BIGINT AS ch
       |  FROM t),
       |r AS (
       |  SELECT *,
       |    206835 * sn * wds - 1015 * wds * wds - 8460 * ch * sn AS mm,
       |    10 * sn * wds AS den
       |  FROM d),
       |s AS (
       |  SELECT keep, rule_keep, lang_hit,
       |    (CASE WHEN mm >= 0 THEN (mm * 2 + den) // (2 * den)
       |          ELSE -((-mm * 2 + den) // (2 * den)) END)::BIGINT AS s2
       |  FROM r),
       |a AS (
       |  SELECT count(*)::BIGINT AS nd,
       |    sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS keepn,
       |    sum(CASE WHEN rule_keep = keep THEN 1 ELSE 0 END)::BIGINT
       |      AS agreen,
       |    sum(CASE WHEN s2 >= 5000 THEN 1 ELSE 0 END)::BIGINT AS stdn,
       |    sum(s2)::BIGINT AS ss2,
       |    sum(CASE WHEN lang_hit THEN 1 ELSE 0 END)::BIGINT AS langn
       |  FROM s)
       |SELECT metric, value FROM (
       |  SELECT 'gate_agreement_frac' AS metric,
       |    ((agreen * 2000000 + nd) // (2 * nd))::DOUBLE / 1e6 AS value
       |  FROM a
       |  UNION ALL SELECT 'langid_accuracy',
       |    ((langn * 2000000 + nd) // (2 * nd))::DOUBLE / 1e6 FROM a
       |  UNION ALL SELECT 'learned_keep_frac',
       |    ((keepn * 2000000 + nd) // (2 * nd))::DOUBLE / 1e6 FROM a
       |  UNION ALL SELECT 'mean_readability2',
       |    (CASE WHEN ss2 >= 0 THEN (ss2 * 2 + nd) // (2 * nd)
       |          ELSE -((-ss2 * 2 + nd) // (2 * nd)) END)::DOUBLE / 100.0
       |  FROM a
       |  UNION ALL SELECT 'n_docs', nd::DOUBLE FROM a
       |  UNION ALL SELECT 'readability_std_plus_frac',
       |    ((stdn * 2000000 + nd) // (2 * nd))::DOUBLE / 1e6 FROM a)
       |ORDER BY metric""".stripMargin
  }

  // -------------------------------------------------------------- q212

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al., NeurIPS '23 "Data Selection for Language Models via
    * Importance Resampling"): documents scored by how much more likely
    * their hashed unigram features are under a TARGET domain (source
    * 'src0' — the curated slice) than under the raw corpus; the top-30
    * become the selection. Features are md5-hashed into 64 buckets
    * map-side ([[Fragments.hashBucket]]); both distributions reduce to
    * 64-row broadcast tables (add-½ smoothing ⇒ 2c+1 integers).
    * Determinism: each bucket's importance ratio is an exact BIGINT in
    * micro-units — (2·t_k+1)·10⁶ DIV (2·r_k+1) — and a document's weight
    * is the exact integer sum of its tokens' ratios: the log-free form
    * of DSIR's log-likelihood-ratio sum (per-bucket the same monotone
    * evidence, accumulated linearly instead of in log space, so no libm
    * call exists anywhere; the length-normalizing constant (2R+K)/(2T+K)
    * scales every ratio uniformly and is rank-neutral, so it is
    * dropped). Scale: one corpus tokenize pass, two 64-row aggregates,
    * one broadcast join back — no shuffle carries anything wider than
    * (doc_id, bucket). */
  val dsirWeights: Q = (s, dir) => {
    val toks = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("term"))
      .withColumn("b", Fragments.hashBucket(col("term"), 64))
    val raw = toks.groupBy("b").agg(count(lit(1)).as("r_k"))
    val tgt = toks.filter(col("source") === "src0")
      .groupBy("b").agg(count(lit(1)).as("t_k"))
    val scores = raw.join(tgt, Seq("b"), "left")
      .selectExpr("b",
        "((coalesce(t_k, 0L) * 2 + 1) * 1000000) DIV (r_k * 2 + 1) AS score_micro")
    toks.join(broadcast(scores), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("score_micro").as("weight_micro"))
      .withColumn("mean_micro", expr("weight_micro DIV n_tok"))
      .orderBy(col("weight_micro").desc, col("doc_id"))
      .limit(30)
  }

  val dsirWeightsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, unnest($ToksSql) AS term FROM documents),
       |tb AS (
       |  SELECT doc_id, source, ${Fragments.hashBucketSql("term", 64)} AS b
       |  FROM tok),
       |raw AS (SELECT b, count(*)::BIGINT AS r_k FROM tb GROUP BY 1),
       |tgt AS (SELECT b, count(*)::BIGINT AS t_k FROM tb
       |        WHERE source = 'src0' GROUP BY 1),
       |sc AS (
       |  SELECT raw.b,
       |    ((coalesce(t_k, 0) * 2 + 1) * 1000000) // (r_k * 2 + 1)
       |      AS score_micro
       |  FROM raw LEFT JOIN tgt USING (b)),
       |w AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tok,
       |    sum(score_micro)::BIGINT AS weight_micro
       |  FROM tb JOIN sc USING (b) GROUP BY 1)
       |SELECT doc_id, n_tok, weight_micro,
       |  weight_micro // n_tok AS mean_micro
       |FROM w ORDER BY weight_micro DESC, doc_id LIMIT 30""".stripMargin

  // -------------------------------------------------------------- q216

  /** Blocked entity-resolution BEST-MATCH (q216): the resolution step on
    * top of q72/q123's pairing primitives. Every part is scored against
    * candidates sharing its blocking key (name noun + adjective initial
    * — the blocking-key discipline of the record-linkage literature),
    * and only the argmax survives, gated by an absolute threshold and a
    * margin over the runner-up (the Fellegi–Sunter accept-region shape:
    * a best match you would auto-link only when it clearly beats the
    * alternative). Pair space is per-block quadratic, never
    * corpus-quadratic; argmax + margin are one window per left id over
    * rank-capped candidates. Scores round to 6 dp BEFORE ranking with
    * id tie-breaks, so the ordering is total and engine-independent
    * ([[graft.functions.JaroWinkler]] is bit-identical to DuckDB's). */
  val erBestMatch: Q = (s, dir) => {
    // Canonicalize-first: exact-duplicate records share one score, so JW
    // runs per DISTINCT (name_a, name_b) pair — never per record pair —
    // and records re-enter only through each name's three smallest ids.
    // Identical output to the definitional record-level formulation (the
    // oracle + Round6OpsSpec replay): the record-level rank-1 and rank-2
    // candidates are always among each candidate-name group's two
    // smallest member ids (three carried so a self-id can be excluded),
    // because ties in (jw DESC, id ASC) interleave groups by id. On a
    // corpus of 20k records over 64 distinct names this cuts 6.2M JW
    // evaluations to ~500 — the standard dedupe-before-score move of the
    // record-linkage literature.
    val p = Tables.t(s, dir, "part").select(
      col("p_partkey"), col("p_name"))
    val wN = Window.partitionBy("p_name").orderBy("p_partkey")
    val mins = p.withColumn("rn", row_number().over(wN))
      .filter(col("rn") <= 3)
      .groupBy("p_name")
      .agg(max(when(col("rn") === 1, col("p_partkey"))).as("m1"),
        max(when(col("rn") === 2, col("p_partkey"))).as("m2"),
        max(when(col("rn") === 3, col("p_partkey"))).as("m3"))
    val nameTbl = mins.select(col("p_name"),
      element_at(split(col("p_name"), " "), -1).as("blk_noun"),
      substring(col("p_name"), 1, 1).as("blk_ini"),
      col("m1"), col("m2"), col("m3"))
    val na = nameTbl.select(col("p_name").as("name_a"),
      col("blk_noun"), col("blk_ini"))
    val nb = nameTbl.select(col("p_name").as("name_b"),
      col("blk_noun"), col("blk_ini"),
      col("m1"), col("m2"), col("m3"))
    val npairs = na.join(nb, Seq("blk_noun", "blk_ini"))
      .select(col("name_a"), col("name_b"),
        round(graft.functions.JaroWinkler(col("name_a"), col("name_b")), 6)
          .as("jw"),
        col("m1"), col("m2"), col("m3"))
    val w = Window.partitionBy("id_a").orderBy(col("jw").desc, col("id_b").asc)
    p.select(col("p_partkey").as("id_a"), col("p_name").as("name_a"))
      .join(broadcast(npairs), "name_a")
      .select(col("id_a"), col("name_a"), col("jw"),
        explode(slice(filter(array(col("m1"), col("m2"), col("m3")),
          x => x.isNotNull && x =!= col("id_a")), 1, 2)).as("id_b"))
      .withColumn("rk", row_number().over(w))
      .withColumn("jw2", lead("jw", 1).over(w))
      .filter(col("rk") === 1 && col("jw") >= 0.9)
      .select(col("id_a"), col("name_a"), col("id_b"), col("jw"),
        round(col("jw") - coalesce(col("jw2"), lit(0.0)), 6).as("margin"),
        (round(col("jw") - coalesce(col("jw2"), lit(0.0)), 6) >= 0.05)
          .as("confident"))
      .orderBy("id_a")
  }

  val erBestMatchSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_name,
      |    string_split(p_name, ' ')[-1] AS blk_noun,
      |    substr(p_name, 1, 1) AS blk_ini
      |  FROM part),
      |pairs AS (
      |  SELECT a.p_partkey AS id_a, a.p_name AS name_a, b.p_partkey AS id_b,
      |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
      |  FROM p a JOIN p b ON a.blk_noun = b.blk_noun AND a.blk_ini = b.blk_ini
      |    AND a.p_partkey <> b.p_partkey),
      |ranked AS (
      |  SELECT id_a, name_a, id_b, jw,
      |    row_number() OVER (PARTITION BY id_a ORDER BY jw DESC, id_b) AS rk,
      |    lead(jw) OVER (PARTITION BY id_a ORDER BY jw DESC, id_b) AS jw2
      |  FROM pairs)
      |SELECT id_a, name_a, id_b, jw,
      |  round(jw - coalesce(jw2, 0.0), 6) AS margin,
      |  round(jw - coalesce(jw2, 0.0), 6) >= 0.05 AS confident
      |FROM ranked WHERE rk = 1 AND jw >= 0.9
      |ORDER BY id_a""".stripMargin

  // -------------------------------------------------------------- q228

  /** RFM segmentation (q228): classic recency/frequency/monetary user
    * quartiles, built WITHOUT a global window over the user table (the
    * usual ntile formulation single-partitions the whole corpus).
    * Instead each dimension's three quartile cut values come from a
    * cumulative count over its DISTINCT-value spine (whole hours /
    * counts / whole currency units — bounded domains, q223's trick),
    * extracted with
    * the nearest-rank rule k_q = ⌈q·n/4⌉ = (q·n+3) DIV 4 in pure
    * integer arithmetic, then broadcast back as three 1-row frames.
    * Bucket = 1 + Σ(v > cut) — no floats anywhere. Output is the 4³
    * segment grid with user counts and monetary totals. */
  val rfmSegments: Q = (s, dir) => {
    val ev = Tables.t(s, dir, "events")
    val maxT = ev.agg(max(unix_micros(col("ts"))).as("max_us"))
    // the per-user table feeds the cut spines AND the final bucketing —
    // without materialization every branch re-runs the events scan +
    // aggregate (the unchecked plan held 28 scans). Through the
    // IterFrame width guard keyed on user_id (round-11 sweep): the melt
    // explode and spine joins otherwise rescan a collapsed frame
    // single-threaded
    val users = graft.common.IterFrame.keyed(
      ev
        .groupBy("user_id")
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("f"),
          sum(round(col("value") * 100).cast("long")).as("m_cents"))
        .crossJoin(broadcast(maxT))
        // whole-hour recency: day granularity degenerates on dense activity
        .select(col("user_id"),
          expr("(max_us - last_us) DIV 3600000000").as("r"),
          col("f"), expr("m_cents DIV 100").as("m")),
      col("user_id"))
    // all three cut spines melt out of ONE pass over the users table
    val melt = users.select(explode(array(
      struct(lit("r").as("dim"), col("r").cast("long").as("v")),
      struct(lit("f").as("dim"), col("f").cast("long").as("v")),
      struct(lit("m").as("dim"), col("m").cast("long").as("v")))).as("p"))
      .select(col("p.dim").as("dim"), col("p.v").as("v"))
    val nrow = users.agg(count(lit(1)).as("n"))
    val perDim = melt.groupBy("dim", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("dim").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(nrow))
      .groupBy("dim")
      .agg(min(when(col("cum") >= expr("(1 * n + 3) DIV 4"), col("v")))
        .as("c1"),
        min(when(col("cum") >= expr("(2 * n + 3) DIV 4"), col("v")))
          .as("c2"),
        min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("v")))
          .as("c3"))
    val cutsRow = perDim.groupBy().agg(
      max(when(col("dim") === "r", col("c1"))).as("r1"),
      max(when(col("dim") === "r", col("c2"))).as("r2"),
      max(when(col("dim") === "r", col("c3"))).as("r3"),
      max(when(col("dim") === "f", col("c1"))).as("f1"),
      max(when(col("dim") === "f", col("c2"))).as("f2"),
      max(when(col("dim") === "f", col("c3"))).as("f3"),
      max(when(col("dim") === "m", col("c1"))).as("m1"),
      max(when(col("dim") === "m", col("c2"))).as("m2"),
      max(when(col("dim") === "m", col("c3"))).as("m3"))
    def bucket(c: String) =
      lit(1) + when(col(c) > col(s"${c}1"), 1).otherwise(0) +
        when(col(c) > col(s"${c}2"), 1).otherwise(0) +
        when(col(c) > col(s"${c}3"), 1).otherwise(0)
    users
      .crossJoin(broadcast(cutsRow))
      .select(col("user_id"), col("m"),
        bucket("r").as("r_b"), bucket("f").as("f_b"), bucket("m").as("m_b"))
      .groupBy("r_b", "f_b", "m_b")
      .agg(count(lit(1)).as("n_users"), sum("m").as("sum_m"))
      .orderBy("r_b", "f_b", "m_b")
  }

  val rfmSegmentsSql: String = {
    def cutsSql(c: String): String =
      s"""cuts_$c AS (
         |  SELECT
         |    min(CASE WHEN cum >= (1 * n + 3) // 4 THEN v END) AS ${c}1,
         |    min(CASE WHEN cum >= (2 * n + 3) // 4 THEN v END) AS ${c}2,
         |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS ${c}3
         |  FROM (
         |    SELECT $c AS v,
         |      sum(count(*)) OVER (ORDER BY $c
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |        AS cum
         |    FROM users GROUP BY $c) sp
         |  CROSS JOIN (SELECT count(*)::BIGINT AS n FROM users) t)""".stripMargin
    def bucketSql(c: String): String =
      s"1 + (CASE WHEN $c > ${c}1 THEN 1 ELSE 0 END) + " +
        s"(CASE WHEN $c > ${c}2 THEN 1 ELSE 0 END) + " +
        s"(CASE WHEN $c > ${c}3 THEN 1 ELSE 0 END)"
    s"""WITH maxt AS (SELECT max(epoch_us(ts))::BIGINT AS max_us FROM events),
       |users AS (
       |  SELECT user_id,
       |    (((SELECT max_us FROM maxt) - max(epoch_us(ts))) // 3600000000)::BIGINT
       |      AS r,
       |    count(*)::BIGINT AS f,
       |    (sum(round(value * 100)::BIGINT) // 100)::BIGINT AS m
       |  FROM events GROUP BY 1),
       |${cutsSql("r")},
       |${cutsSql("f")},
       |${cutsSql("m")},
       |b AS (
       |  SELECT user_id, m,
       |    ${bucketSql("r")} AS r_b,
       |    ${bucketSql("f")} AS f_b,
       |    ${bucketSql("m")} AS m_b
       |  FROM users CROSS JOIN cuts_r CROSS JOIN cuts_f CROSS JOIN cuts_m)
       |SELECT r_b, f_b, m_b, count(*)::BIGINT AS n_users,
       |  sum(m)::BIGINT AS sum_m
       |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // -------------------------------------------------------------- q230

  /** Audience-overlap matrix (q230): Jaccard overlap between the user
    * audiences of every event-type pair — "do purchasers also share?"
    * for attribution/mix design (the behavioral twin of q229's content
    * cosine). The intersection is a USER-KEYED self-join of the
    * distinct (type, user) table — per user at most |types|² pair rows,
    * bounded fan-out — and Jaccard is exact-integer
    * |A∩B| / (|A|+|B|−|A∩B|) with one final division. */
  val audienceOverlap: Q = (s, dir) => {
    // audience pairs feed totals + both self-join legs — through the
    // IterFrame width guard keyed on user_id (round-11 sweep), which
    // also hands the user-keyed self-join both sides' partitioning
    val p = graft.common.IterFrame.keyed(
      Tables.t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct(),
      col("user_id"))
    val tot = p.groupBy("event_type").agg(count(lit(1)).as("t"))
    p.as("a").join(p.as("b"), "user_id")
      .filter(col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(tot.select(col("event_type").as("type_a"),
        col("t").as("n_a"))), "type_a")
      .join(broadcast(tot.select(col("event_type").as("type_b"),
        col("t").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round(col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  val audienceOverlapSql: String =
    """WITH p AS (SELECT DISTINCT event_type, user_id FROM events),
      |tot AS (SELECT event_type, count(*)::BIGINT AS t FROM p GROUP BY 1),
      |inter AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*)::BIGINT AS n_ab
      |  FROM p a JOIN p b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, ta.t AS n_a, tb.t AS n_b, n_ab,
      |  round(n_ab::DOUBLE / ((ta.t + tb.t - n_ab)::DOUBLE), 6) AS jaccard
      |FROM inter
      |JOIN tot ta ON ta.event_type = type_a
      |JOIN tot tb ON tb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin

  // -------------------------------------------------------------- q236

  /** Deterministic Poisson bootstrap CI (q236): a 90% confidence
    * interval on each source's mean document length from B=32
    * hash-seeded resamples — the online-bootstrap trick (each replicate
    * weights every row by an independent Poisson(1) draw, so resampling
    * is one map-side explode, no sampling-with-replacement shuffle; the
    * draw is the inverse CDF applied to an md5 uniform of (doc_id, b),
    * truncated at 3, so both engines derive identical weights from
    * identical literals). Replicate b=0 carries weight 1 — the full-
    * sample mean rides the same pass. Per-replicate means are exact
    * integer ratios; the 90% CI takes the nearest-rank 5th/95th
    * percentile of the B replicate means (rank window over ≤B rows per
    * source). One explode + one keyed aggregate + a B-row window: scan
    * cost ×(B+1) map-side, one shuffle on (source, b). */
  val bootstrapCi: Q = (s, dir) => {
    val b = 32
    // Poisson(1) CDF breakpoints, written as identical literals in both
    // engines: P(X<=0)=e^-1, P(X<=1)=2e^-1, P(X<=2)=2.5e^-1
    val u = col("h").cast("double") / 4294967296.0
    val w = when(col("b") === 0, 1L)
      .when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .otherwise(3L)
    val reps = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(sequence(lit(0), lit(b))).as("b"))
      .withColumn("h", conv(substring(
        md5(concat(col("doc_id").cast("string"), lit("_"),
          col("b").cast("string"))), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("w", w)
      .groupBy("source", "b")
      .agg(sum(col("w") * col("n_chars")).as("sx"), sum("w").as("sw"))
      .filter(col("sw") > 0)
      .withColumn("mean_b",
        col("sx").cast("double") / col("sw").cast("double"))
      .localCheckpoint(true)
    val full = reps.filter(col("b") === 0)
      .select(col("source"), round(col("mean_b"), 4).as("mean_full"))
    val boots = reps.filter(col("b") > 0)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy("mean_b", "b")))
      .withColumn("nr", count(lit(1)).over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(max("nr").as("n_reps"),
        max(when(col("rnk") === expr("(5 * nr + 99) DIV 100"),
          col("mean_b"))).as("lo"),
        max(when(col("rnk") === expr("(95 * nr + 99) DIV 100"),
          col("mean_b"))).as("hi"))
    full.join(boots, "source")
      .select(col("source"), col("mean_full"), col("n_reps"),
        round(col("lo"), 4).as("ci_lo"), round(col("hi"), 4).as("ci_hi"))
      .orderBy("source")
  }

  val bootstrapCiSql: String =
    """WITH reps AS (
      |  SELECT source, b,
      |    sum(w * n_chars)::BIGINT AS sx, sum(w)::BIGINT AS sw
      |  FROM (
      |    SELECT source, n_chars, b,
      |      CASE WHEN b = 0 THEN 1
      |           WHEN u < 0.36787944117144233 THEN 0
      |           WHEN u < 0.7357588823428847 THEN 1
      |           WHEN u < 0.9196986029286058 THEN 2
      |           ELSE 3 END AS w
      |    FROM (
      |      SELECT doc_id, source, n_chars, b,
      |        (('0x' || substr(md5(doc_id::VARCHAR || '_' || b::VARCHAR),
      |          1, 8))::BIGINT)::DOUBLE / 4294967296.0 AS u
      |      FROM documents
      |      CROSS JOIN (SELECT unnest(range(0, 33)) AS b) t) uu) ww
      |  GROUP BY 1, 2 HAVING sum(w) > 0),
      |m AS (
      |  SELECT source, b, sx::DOUBLE / sw::DOUBLE AS mean_b FROM reps),
      |full_m AS (
      |  SELECT source, round(mean_b, 4) AS mean_full FROM m WHERE b = 0),
      |ranked AS (
      |  SELECT source, mean_b,
      |    row_number() OVER (PARTITION BY source ORDER BY mean_b, b)
      |      AS rnk,
      |    count(*) OVER (PARTITION BY source) AS nr
      |  FROM m WHERE b > 0),
      |ci AS (
      |  SELECT source, max(nr)::BIGINT AS n_reps,
      |    max(CASE WHEN rnk = (5 * nr + 99) // 100 THEN mean_b END) AS lo,
      |    max(CASE WHEN rnk = (95 * nr + 99) // 100 THEN mean_b END) AS hi
      |  FROM ranked GROUP BY 1)
      |SELECT f.source, f.mean_full, ci.n_reps,
      |  round(ci.lo, 4) AS ci_lo, round(ci.hi, 4) AS ci_hi
      |FROM full_m f JOIN ci USING (source)
      |ORDER BY f.source""".stripMargin

  // ----------------------------------------------------------- registry

  // -------------------------------------------------------------- q302

  /** End-to-end incremental-lifecycle capstone (q302): one simulated
    * daily ingest drives ALL THREE persisted-state paths the engine
    * owns — the dedup fingerprint index ([[graft.Compact]], q209), the
    * frozen-model ANN index ([[graft.llm.AnnIndex]] append, q263), and
    * the graph-edge artifact ([[graft.operators.GraphArtifact]] append,
    * q301) — and emits ONE governance report read back from the
    * PERSISTED states: corpus duplicate rate, worst-cell ANN occupancy
    * drift (+ retrain flag), and the co-purchase triangle count. The
    * corpus splits 80/20 (documents and orders by key mod 5, vectors at
    * the q263 id boundary), each state builds on the base and appends
    * the batch, and the oracle reproduces every number from the FULL
    * corpus inline — so the green row proves base + append ≡ full for
    * the whole lifecycle at once (the q301 proof pattern applied to all
    * three states together). Quantization follows the house
    * disciplines: exact integer DIV half-away for the rate, the q263
    * 6-dp drift arithmetic, exact BIGINT census. */
  val lifecycleCapstone: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-capstone")
    try {
    // The three persisted-state chains (dedup index, ANN index, graph
    // artifact) are INDEPENDENT — separate inputs, separate state dirs,
    // report assembled only after all three commit. Sequentially each
    // chain leaves most of the 32 cores idle (many small jobs with
    // per-job barriers and driver-side commit work), so they run from a
    // 3-thread pool and the FIFO scheduler back-fills one chain's task
    // tails with the others' jobs (optimization guide §2.6 "overlap
    // independent jobs"). Values are untouched: each chain's internal
    // order is preserved, and the oracle row still proves base+append ≡
    // full for all three states. Measured 23.6 → 17.6 s solo at sf0.1
    // (min-of-2, local[32]); the graph chain dominates the critical path.
    //
    // POOL SIZE = CHAIN COUNT, not a cluster knob (round-15 rule, fixed
    // here and in GraphArtifact/Compact): the threads only SUBMIT jobs —
    // execution parallelism is governed by the scheduler's task slots,
    // which back-fill whatever is free regardless of executor count. More
    // threads than independent chains is impossible (there is nothing
    // more to submit); fewer would serialize chains for no reason. The
    // guide's "2-3 jobs in flight is plenty" is the same observation from
    // the cluster side. Scale-safe by construction: the number is a
    // property of the DAG, not of the machine.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // dedup state: base ingest, then the daily batch (id-keyed upsert)
    val docs = Tables.t(s, dir, "documents")
    val dState = tmp.resolve("dedup").toString
    val fDedup = scala.concurrent.Future {
      graft.Compact.run(s, dState, docs.filter(col("doc_id") % 5 =!= 0))
      graft.Compact.run(s, dState, docs.filter(col("doc_id") % 5 === 0))
    }
    // ANN state: frozen-model build on the base, append the rest
    val emb = Tables.t(s, dir, "embeddings")
    val aDir = tmp.resolve("ann").toString
    val fAnn = scala.concurrent.Future {
      graft.llm.AnnIndex.build(emb.filter(col("vec_id") < 350), aDir)
      graft.llm.AnnIndex.append(emb.filter(col("vec_id") >= 350), aDir)
    }
    // graph state: partition-local append of the day's orders + clicks.
    // 8 buckets for THIS throwaway state (vs the serving default 32):
    // bucket count is a layout knob — the base+append ≡ full law and
    // every value below are bucket-agnostic (GraphArtifactSpec runs the
    // law at 8 vs the default 32) — and at proof scale 4 sub-tables × 32
    // partitioned writes are pure small-file overhead
    val gDir = tmp.resolve("graph").toString
    // items rides the IterFrame width guard keyed on o (round-11
    // sweep): both build and append derive pair support via an o-keyed
    // self-join — the q231-class collapse would serialize it. clicks
    // stays a bare checkpoint: its consumers are linear bucket writes
    // that repartition internally. Both are EAGER (checkpoints), so they
    // materialize here on the caller thread, before the fork.
    val items = graft.common.IterFrame.keyed(
      graft.operators.GraphArtifact.itemsInline(s, dir), col("o"))
    val clicks = graft.operators.GraphArtifact.clickEdgesInline(s, dir)
      .localCheckpoint(true)
    val Bk = graft.operators.GraphArtifact.BucketsKey
    // the bucket-count conf is session-scoped and read once at BUILD
    // time inside the graph chain; the other two chains never touch it,
    // so setting it around the forked build is race-free
    val prevBk = s.conf.getOption(Bk)
    s.conf.set(Bk, "8")
    val fGraph = scala.concurrent.Future {
      graft.operators.GraphArtifact.buildFrom(s,
        items.filter(col("o") % 5 =!= 0),
        clicks.filter(col("u") % 5 =!= 0), gDir)
      graft.operators.GraphArtifact.append(s,
        items.filter(col("o") % 5 === 0),
        clicks.filter(col("u") % 5 === 0), gDir)
    }
    try {
      // drain ALL chains to completion before rethrowing (round-14
      // advice): a fast-fail Await.result(Future.sequence) would
      // restore the bucket conf and rmrf the temp dir while sibling
      // chains still run Spark jobs against both
      Seq(fDedup, fAnn, fGraph).map(f =>
        scala.concurrent.Await.ready(
          f, scala.concurrent.duration.Duration.Inf).value.get)
        .foreach(_.get)
    } finally {
      pool.shutdown()
      prevBk match {
        case Some(v) => s.conf.set(Bk, v)
        case None    => s.conf.unset(Bk)
      }
    }
    val dup = graft.Compact.readIndex(s, dState).get
      .agg(count(lit(1)).as("n"), countDistinct("fp").as("dfp"))
      .select((expr("((n - dfp) * 20000 + n) DIV (2 * n)")
        .cast("double") / 10000.0).as("dup_rate4"))
    val drift = graft.llm.AnnIndex.drift(s, aDir)
      .agg(max(col("drift6")).as("drift_max6"),
        max(col("retrain").cast("int")).as("retrain"))
    val census = graft.operators.Graph.triangleCensus(
      s.read.parquet(s"$gDir/copurchase").drop("bkt"))
      .select(col("n_triangles"))
    // collect the single report row EAGERLY so the three persisted-state
    // temp dirs can be deleted before returning (Bench runs this query
    // reps× per sweep and PlanSpec executes it too — without the cleanup
    // disk usage grew without bound across runs); the returned frame is
    // a literal with the identical schema
    val report = dup.crossJoin(broadcast(drift)).crossJoin(broadcast(census))
    val rows = report.collect().toSeq
    s.createDataFrame(rows.asJava, report.schema)
    } finally {
      // the states live on the local fs (createTempDirectory)
      def rmrf(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete(); ()
      }
      rmrf(tmp.toFile)
    }
  }

  /** The drift and census legs reuse q263's and q179's oracle SQL
    * verbatim as derived tables, so the capstone can never drift from
    * the arithmetic those rows already gate. */
  val lifecycleCapstoneSql: String =
    s"""WITH dup AS (
       |  SELECT count(*)::BIGINT AS n, count(DISTINCT fp)::BIGINT AS dfp
       |  FROM (SELECT ${Fragments.BagFpSql} AS fp FROM documents))
       |SELECT
       |  (((n - dfp) * 20000 + n) // (2 * n))::DOUBLE / 10000.0 AS dup_rate4,
       |  d.drift_max6, d.retrain, t.n_triangles
       |FROM dup,
       |  (SELECT max(drift6) AS drift_max6,
       |          max(CASE WHEN retrain THEN 1 ELSE 0 END) AS retrain
       |   FROM (${LlmQueries.annDriftSql})) d,
       |  (SELECT n_triangles FROM (${Analytics.triangleCountSql})) t""".stripMargin

  val queries: Map[String, Q] = Map(
    "q302_lifecycle_capstone" -> lifecycleCapstone,
    "q228_rfm_segments" -> rfmSegments,
    "q236_bootstrap_ci" -> bootstrapCi,
    "q230_audience_overlap" -> audienceOverlap,
    "q70_pii_redact" -> piiRedact,
    "q71_split_assign" -> splitAssign,
    "q72_fuzzy_pairs" -> fuzzyPairsExact,
    "q73_tfidf_topterms" -> tfidfTopTerms,
    "q74_repetition_quality" -> repetitionQuality,
    "q75_merge_upsert" -> mergeUpsert,
    "q76_stratified_sample" -> stratifiedSample,
    "q77_quantize_int8" -> quantizeInt8,
    "q80_funnel_steps" -> funnelSteps,
    "q81_latest_per_key" -> latestPerKey,
    "q82_lm_score" -> lmScore,
    "q84_histogram" -> histogram,
    "q85_corr_stats" -> corrStats,
    "q188_ccnet_buckets" -> ccnetBuckets,
    "q195_weighted_median" -> weightedMedian,
    "q200_corpus_report" -> corpusReport,
    "q300_model_gate_report" -> modelGateReport,
    "q202_halflife_decay" -> halflifeDecay,
    "q212_dsir_weights" -> dsirWeights,
    "q216_er_best_match" -> erBestMatch)

  val oracleSql: Map[String, String] = Map(
    "q302_lifecycle_capstone" -> lifecycleCapstoneSql,
    "q228_rfm_segments" -> rfmSegmentsSql,
    "q230_audience_overlap" -> audienceOverlapSql,
    "q236_bootstrap_ci" -> bootstrapCiSql,
    "q70_pii_redact" -> piiRedactSql,
    "q71_split_assign" -> splitAssignSql,
    "q72_fuzzy_pairs" -> fuzzyPairsSql,
    "q73_tfidf_topterms" -> tfidfTopTermsSql,
    "q74_repetition_quality" -> repetitionQualitySql,
    "q75_merge_upsert" -> mergeUpsertSql,
    "q76_stratified_sample" -> stratifiedSampleSql,
    "q77_quantize_int8" -> quantizeInt8Sql,
    "q80_funnel_steps" -> funnelStepsSql,
    "q81_latest_per_key" -> latestPerKeySql,
    "q82_lm_score" -> lmScoreSql,
    "q84_histogram" -> histogramSql,
    "q85_corr_stats" -> corrStatsSql,
    "q188_ccnet_buckets" -> ccnetBucketsSql,
    "q195_weighted_median" -> weightedMedianSql,
    "q200_corpus_report" -> corpusReportSql,
    "q300_model_gate_report" -> modelGateReportSql,
    "q202_halflife_decay" -> halflifeDecaySql,
    "q212_dsir_weights" -> dsirWeightsSql,
    "q216_er_best_match" -> erBestMatchSql)
}
