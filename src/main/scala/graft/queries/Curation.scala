package graft.queries

import graft.{Q, Tables}
import graft.llm.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 corpus-curation + analytics operators (no reference analog —
  * the reference stops at table I/O,
  * hive-io-exp-core/src/main/java/com/facebook/hiveio/input/HiveInput.java:66):
  * benchmark decontamination, cohort retention, time-range window
  * frames, ntile profiling, incremental partial-aggregate merge, URL
  * canonicalization dedup, and per-group feature standardization.
  * Determinism discipline matches `Pipeline`: integer-sum moments,
  * floor instead of round at discretization boundaries, stable final
  * ORDER BY, identical double op-order in both engines.
  */
object Curation {

  private val NormSql = Fragments.NormSql
  private val ToksSql = Fragments.ToksSql

  /** md5-of-id split bucket 0..99 — single definition in [[Fragments]],
    * shared with q71 so the split assignment and the decontamination
    * gate agree on the partitioning by construction. */
  private def bucket = Fragments.splitBucket(col("doc_id"))
  private val BucketSql = Fragments.BucketSql

  // -------------------------------------------------------------- q87

  /** Benchmark decontamination (the GPT-3/Llama train-set hygiene step):
    * flag train-split documents sharing any word 8-gram with the held-out
    * test split. The test side collapses to a distinct shingle set —
    * vanishingly small next to the corpus — and broadcasts, so the
    * train-side scan never shuffles: at 100 TB this is one map-side
    * semi-join per doc-shingle plus a keyed count. Shingles are distinct
    * per doc ([[TextOps.wordShingles]]), so count(*) IS the distinct
    * overlap count. */
  val decontam: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"), bucket.as("bucket"))
    val trainSh = d.filter(col("bucket") < 80)
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 8)).as("sh"))
    val testSh = d.filter(col("bucket") >= 90)
      .select(explode(TextOps.wordShingles(col("text"), 8)).as("sh")).distinct()
    trainSh.join(broadcast(testSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_overlap"))
      .orderBy("doc_id")
  }

  val decontamSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, $ToksSql AS toks, $BucketSql AS bucket
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, bucket,
       |    unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
       |      for i in range(1, len(toks) - 6)])) AS sh
       |  FROM t),
       |tst AS (SELECT DISTINCT sh FROM sh WHERE bucket >= 90)
       |SELECT s.doc_id, count(*)::INTEGER AS n_overlap
       |FROM sh s JOIN tst USING (sh)
       |WHERE s.bucket < 80
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q88

  /** Cohort retention: users grouped by first-activity day, counted at
    * each day offset they return. Two keyed aggregations and one keyed
    * join on user_id — map-combinable throughout; the distinct
    * (user, day) dedup bounds the final shuffle at one row per active
    * user-day regardless of raw event volume. */
  val cohortRetention: Q = (s, dir) => {
    val e = Tables.t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val f = e.groupBy("user_id").agg(min("day").as("cohort"))
    e.join(f, "user_id")
      .select(col("user_id"), col("cohort"),
        datediff(col("day"), col("cohort")).as("offset_days"))
      .distinct()
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"))
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_day", "offset_days")
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id, ts::DATE AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
      |ud AS (SELECT DISTINCT e.user_id, f.cohort,
      |         date_diff('day', f.cohort, e.day)::INTEGER AS offset_days
      |       FROM e JOIN f USING (user_id))
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, offset_days,
      |       count(*) AS users
      |FROM ud GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- q89

  /** Time-range window frame: per event, count and sum of the same
    * user's events in the trailing hour — RANGE BETWEEN on an epoch-
    * seconds key, the only frame kind whose result is independent of
    * tie order (every row with the same key is in the frame), which is
    * what makes it hash-comparable across engines. Value sums ride as
    * exact integer cents. One shuffle on user_id, sorted once. */
  val rangeFrameHour: Q = (s, dir) => {
    val e = Tables.t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      col("ts").cast("long").as("sec"),
      round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-3600, Window.currentRow)
    e.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).cast("int").as("n_hour"),
        (sum("cents").over(w).cast("double") / 100).as("sum_hour"))
      .orderBy("event_id")
  }

  val rangeFrameHourSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    (epoch_ns(ts) // 1000000000) AS sec,
      |    round(value * 100)::BIGINT AS cents
      |  FROM events)
      |SELECT event_id, user_id,
      |  (count(*) OVER w)::INTEGER AS n_hour,
      |  (sum(cents) OVER w)::DOUBLE / 100 AS sum_hour
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------- q90

  /** Decile profile of customer balances via ntile(10). The global-order
    * window is the textbook form (fine to ~10^8 rows: one total sort);
    * the 100 TB path is cut points from approx_percentile broadcast into
    * a map-side bucket lookup — same output contract, documented here so
    * the scale swap is mechanical. Per-decile sums are exact cents. */
  val ntileDeciles: Q = (s, dir) => {
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(10).over(w).as("decile"))
      .groupBy("decile").agg(
        count(lit(1)).as("n"),
        round(min("c_acctbal"), 2).as("min_bal"),
        round(max("c_acctbal"), 2).as("max_bal"),
        (sum(round(col("c_acctbal") * 100).cast("long")).cast("double") / 100)
          .as("sum_bal"))
      .orderBy("decile")
  }

  val ntileDecilesSql: String =
    """WITH d AS (
      |  SELECT c_custkey, c_acctbal,
      |    (ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC))::INTEGER AS decile
      |  FROM customer)
      |SELECT decile, count(*) AS n,
      |  round(min(c_acctbal), 2) AS min_bal,
      |  round(max(c_acctbal), 2) AS max_bal,
      |  sum(round(c_acctbal * 100)::BIGINT)::DOUBLE / 100 AS sum_bal
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q91

  /** Incremental aggregate maintenance: a base snapshot's partial
    * aggregates merged with a delta batch's — the sum/count pairs are
    * associative, so merging partials equals recomputing from scratch
    * (which is exactly what the oracle does). This is the pattern that
    * turns a 100 TB daily full recompute into an O(delta) update; exact
    * integer cents make the merge order irrelevant. */
  val incrementalAgg: Q = (s, dir) => {
    val o = Tables.t(s, dir, "orders").select(
      col("o_orderstatus").as("st"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderdate"))
    val cut = lit("1997-01-01").cast("date")
    def partial(df: DataFrame): DataFrame =
      df.groupBy("st").agg(count(lit(1)).as("n"), sum("cents").as("c"))
    partial(o.filter(col("o_orderdate") < cut))
      .unionByName(partial(o.filter(col("o_orderdate") >= cut)))
      .groupBy("st").agg(
        sum("n").as("n_orders"),
        (sum("c").cast("double") / 100).as("total"))
      .orderBy("st")
  }

  val incrementalAggSql: String =
    """SELECT o_orderstatus AS st, count(*) AS n_orders,
      |  sum(round(o_totalprice * 100)::BIGINT)::DOUBLE / 100 AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q92

  /** URL canonicalization + dedup (web-corpus curation): lowercase, strip
    * query/fragment, strip trailing slashes, then keep one doc per
    * canonical URL. The fixtures carry no URLs, so both engines derive
    * the same synthetic URL per doc (the q70 pattern) and the operator
    * under test is the canonicalization chain — pure codegen'd regex,
    * one keyed agg; at 100 TB the group count is the distinct-URL count. */
  val urlCanonical: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val url = concat(lit("https://WWW."), col("source"), lit(".Example.com/"),
      col("lang"), lit("/page-"), (col("doc_id") % 50).cast("string"),
      lit("/?utm_source=feed&ref="), col("doc_id").cast("string"), lit("#frag"))
    d.select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(lower(col("url")), "[?#].*$", ""), "/+$", "")
          .as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
      .orderBy("canonical")
  }

  val urlCanonicalSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://WWW.' || source || '.Example.com/' || lang || '/page-' ||
      |    (doc_id % 50)::VARCHAR || '/?utm_source=feed&ref=' ||
      |    doc_id::VARCHAR || '#frag' AS url
      |  FROM documents)
      |SELECT regexp_replace(regexp_replace(lower(url), '[?#].*$', ''),
      |                      '/+$', '') AS canonical,
      |  count(*) AS n_docs, min(doc_id) AS keeper
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q93

  /** Per-label z-score standardization of embedding dims 0–3 (feature
    * normalization for training): moments as exact integer sums over
    * floor-quantized values (the q85/q77 determinism discipline), then
    * one closed-form double pass with identical op order in both
    * engines. The stats table is |labels|×dims rows — broadcast; the
    * corpus never shuffles. */
  val zscoreNorm: Q = (s, dir) => {
    // slice before exploding: exploding all dims and filtering pos < 4
    // would materialize dims/4 times the needed rows in the scan stage
    val e = Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(slice(col("embedding").cast("array<double>"), 1, 4))
          .as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"),
        floor(col("v") * 10000).cast("long").as("x"))
    val st = e.groupBy("label", "pos").agg(
      count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val d = (c: String) => col(c).cast("double")
    e.join(broadcast(st), Seq("label", "pos"))
      .select(col("vec_id"), col("pos"),
        round((d("x") - d("sx") / d("n")) /
          (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) / d("n")), 4).as("z"))
      .transform(graft.Presentation.sort(_, "vec_id", "pos"))
  }

  val zscoreNormSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, k.k::INTEGER AS pos,
      |    floor(embedding[k.k + 1]::DOUBLE * 10000)::BIGINT AS x
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(4)) AS k) k),
      |st AS (SELECT label, pos, count(*) AS n, sum(x)::BIGINT AS sx,
      |         sum(x * x)::BIGINT AS sxx
      |       FROM e GROUP BY 1, 2)
      |SELECT e.vec_id, e.pos,
      |  round((e.x::DOUBLE - st.sx::DOUBLE / st.n::DOUBLE) /
      |        (sqrt(st.n::DOUBLE * st.sxx::DOUBLE - st.sx::DOUBLE * st.sx::DOUBLE)
      |         / st.n::DOUBLE), 4) AS z
      |FROM e JOIN st USING (label, pos) ORDER BY vec_id, pos""".stripMargin

  // -------------------------------------------------------------- q94

  /** Sequence packing for LLM training: docs stream in a deterministic
    * md5 order within each source and are assigned to fixed 2048-token
    * training sequences by running token total (the streaming
    * approximation of greedy bin packing — each source packs
    * independently, so at 100 TB the window shuffles once on source and
    * no partition sees more than its own source's docs; a global-order
    * pack would serialize the corpus through one task). Integer cumsum,
    * integer division — bit-identical across engines. */
  val sequencePack: Q = (s, dir) => {
    val budget = 2048
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("source"), col("n_tok").cast("int").as("n_tok"),
        floor((col("cum") - col("n_tok")) / budget).cast("int").as("pack_id"))
      .orderBy("doc_id")
  }

  val sequencePackSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, len($ToksSql)::BIGINT AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source
       |      ORDER BY md5(doc_id::VARCHAR), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d)
       |SELECT doc_id, source, n_tok::INTEGER AS n_tok,
       |  ((cum - n_tok) // 2048)::INTEGER AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q95

  /** Correlated EXISTS subquery (TPC-H Q4 shape, adapted to the fixture
    * schema: "orders with a lineitem shipped >30 days after ordering").
    * Catalyst decorrelates to a left-semi join on the equi part with the
    * inequality as residual — one keyed shuffle pair, no per-row
    * re-execution, which is what makes EXISTS usable at 100 TB. */
  val existsSubquery: Q = (s, dir) => {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_ex")
    Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem_ex")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders_ex
        |WHERE EXISTS (SELECT 1 FROM lineitem_ex
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAYS)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  val existsSubquerySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------- q96

  /** NOT IN subquery (TPC-H Q16 shape via the lineitem bridge): distinct
    * suppliers per brand, excluding a subquery-defined supplier set. NOT
    * IN is the null-aware anti join — a different Catalyst path from
    * NOT EXISTS/anti (q15): one null on either side changes the answer,
    * so the planner must broadcast the exclusion set whole. The
    * exclusion side here is tiny (it always is in the Q16 shape); the
    * fact side never shuffles for it. */
  val notInSubquery: Q = (s, dir) => {
    Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem_ni")
    Tables.t(s, dir, "part").createOrReplaceTempView("part_ni")
    Tables.t(s, dir, "supplier").createOrReplaceTempView("supplier_ni")
    s.sql(
      """SELECT p_brand, count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem_ni JOIN part_ni ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier_ni WHERE s_acctbal < 0)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  val notInSubquerySql: String =
    """SELECT p_brand, count(DISTINCT l_suppkey) AS n_supp
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13'
      |  AND l_suppkey NOT IN
      |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // -------------------------------------------------------------- q97

  /** Time-series gap filling with forward fill: each user's daily value
    * series densified to a full day spine (sequence + explode — no
    * driver-side calendar) and gaps carried forward. The fill uses the
    * portable two-window form — a running non-null count partitions the
    * series into fill groups, then one max per group — instead of
    * `last_value IGNORE NULLS`, whose support and semantics differ
    * across engines. Two windows on the same (user, day) sort — one
    * exchange. Day totals ride as exact cents. */
  val forwardFill: Q = (s, dir) => {
    val e = Tables.t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "day").agg(sum("cents").as("cents"))
    val spine = e.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(e, Seq("user_id", "day"), "left")
      .withColumn("grp", count("cents").over(w))
      .withColumn("filled",
        (max("cents").over(Window.partitionBy("user_id", "grp")).cast("double") / 100)
          .as("filled"))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cents").isNull.as("is_gap"), col("filled"))
      .orderBy("user_id", "day")
  }

  val forwardFillSql: String =
    """WITH e AS (
      |  SELECT user_id, ts::DATE AS day,
      |         sum(round(value * 100)::BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1)),
      |j AS (
      |  SELECT s.user_id, s.day, e.cents,
      |    count(e.cents) OVER (PARTITION BY s.user_id ORDER BY s.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM spine s LEFT JOIN e ON s.user_id = e.user_id AND s.day = e.day)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |  (cents IS NULL) AS is_gap,
      |  (max(cents) OVER (PARTITION BY user_id, grp))::DOUBLE / 100 AS filled
      |FROM j ORDER BY user_id, day""".stripMargin

  // -------------------------------------------------------------- q98

  /** Distribution-rank battery: dense_rank, percent_rank, cume_dist over
    * orders within status — the remaining window-rank surface beyond
    * q18's rank. The sort key is (price, orderkey), so every rank is
    * tie-free and the rank-derived doubles are ratios of identical
    * integers. One exchange on the partition key. */
  val rankBattery: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.t(s, dir, "orders")
      .filter(col("o_orderkey") % 29 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        dense_rank().over(w).cast("int").as("drk"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  val rankBatterySql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  (dense_rank() OVER w)::INTEGER AS drk,
      |  round(percent_rank() OVER w, 6) AS prk,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders
      |WHERE o_orderkey % 29 = 0
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- q99

  /** Ordered string aggregation (LISTAGG): per nation, the
    * alphabetized roster of high-balance customers. Spark builds it as
    * sort_array(collect_list) + concat_ws — collect order is
    * nondeterministic but the explicit sort canonicalizes it, which is
    * the only portable LISTAGG contract (and the map-combinable one:
    * lists merge associatively, the sort runs once per group). */
  val stringAgg: Q = (s, dir) => {
    val c = Tables.t(s, dir, "customer").filter(col("c_acctbal") > 9000)
    val n = Tables.t(s, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).cast("int").as("n_cust"),
        concat_ws(",", sort_array(collect_list(col("c_name")))).as("roster"))
      .orderBy("n_name")
  }

  val stringAggSql: String =
    """SELECT n_name, count(*)::INTEGER AS n_cust,
      |  string_agg(c_name, ',' ORDER BY c_name) AS roster
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 9000
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------- q100

  /** The training-data pipeline capstone: split assignment (q71) →
    * exact dedup (q30) → quality gate (q39) → decontamination of the
    * train split against the surviving test split (q87) → per-split
    * sequence packing (q94), reported as per-(split, source) doc /
    * token / pack counts. Every stage is individually oracle-proven;
    * this query proves the COMPOSITION end to end. Plan shape: linear
    * scans + keyed windows + one broadcast semi-join — nothing
    * quadratic, nothing driver-side; the same DAG runs at 100 TB. */
  val pipelineCapstone: Q = (s, dir) =>
    capstoneWith(s, dir, TextOps.qualityScore(col("text")) >= 0.3)

  /** q100's pipeline with the quality gate as a parameter — q259 swaps
    * the rule-based score for the learned classifier without touching
    * any other stage. `keepGate` is a boolean expression over
    * col("text"). */
  private def capstoneWith(s: org.apache.spark.sql.SparkSession,
      dir: String, keepGate: org.apache.spark.sql.Column) = {
    val budget = 2048
    val d = Tables.t(s, dir, "documents").select(
      col("doc_id"), col("text"), col("source"), bucket.as("bucket"))
    val base = d.select(col("doc_id"), col("text"), col("source"),
      when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
        .otherwise("test").as("split"),
      TextOps.fingerprint(col("text")).as("fp"),
      keepGate.as("keep"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    val deduped = base
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keeper") && col("keep"))
    val testSh = deduped.filter(col("split") === "test")
      .select(explode(TextOps.wordShingles(col("text"), 8)).as("sh")).distinct()
    val contaminated = deduped.filter(col("split") === "train")
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 8)).as("sh"))
      .join(broadcast(testSh), "sh").select("doc_id").distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val packed = clean.withColumn("cum", sum("n_tok").over(
        Window.partitionBy("split", "source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pack_id", floor((col("cum") - col("n_tok")) / budget))
    packed.groupBy("split", "source").agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum("n_tok").as("n_tokens"),
        (max("pack_id") + 1).cast("int").as("n_packs"))
      .orderBy("split", "source")
  }

  val pipelineCapstoneSql: String =
    capstoneSqlWith(s"${Fragments.qualitySql} >= 0.3")

  /** DuckDB twin of [[capstoneWith]] — `keepSql` is the boolean gate
    * over the base CTE's columns (text/toks available). */
  private def capstoneSqlWith(keepSql: String): String = {
    val nTok = s"len($ToksSql)"
    s"""WITH base AS (
       |  SELECT doc_id, text, source,
       |    CASE WHEN $BucketSql < 80 THEN 'train'
       |         WHEN $BucketSql < 90 THEN 'val' ELSE 'test' END AS split,
       |    md5($NormSql) AS fp,
       |    ($keepSql) AS keep,
       |    $nTok::BIGINT AS n_tok,
       |    $ToksSql AS toks
       |  FROM documents),
       |deduped AS (
       |  SELECT * FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM base)
       |  WHERE doc_id = keeper AND keep),
       |tst AS (
       |  SELECT DISTINCT unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
       |    for i in range(1, len(toks) - 6)])) AS sh
       |  FROM deduped WHERE split = 'test'),
       |bad AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
       |      for i in range(1, len(toks) - 6)])) AS sh
       |    FROM deduped WHERE split = 'train') t
       |  JOIN tst USING (sh)),
       |clean AS (
       |  SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
       |packed AS (
       |  SELECT split, source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY split, source
       |      ORDER BY md5(doc_id::VARCHAR), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM clean)
       |SELECT split, source, count(*)::INTEGER AS n_docs,
       |  sum(n_tok)::BIGINT AS n_tokens,
       |  (max((cum - n_tok) // 2048) + 1)::INTEGER AS n_packs
       |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------- q258

  /** DuckDB list of the learned scorer's features over a token-list
    * expression: distinct non-empty unigrams ++ distinct word bigrams —
    * the twin of [[TextOps.linearQualityScore]]'s feature set. */
  private def learnedFeatsSql(toks: String): String =
    s"([x for x in list_distinct($toks) if x <> ''] || " +
      s"list_distinct([array_to_string(($toks)[i:i+1], ' ') " +
      s"for i in range(1, len($toks))]))"

  /** DuckDB twin of the learned scorer's exact integer weight sum: the
    * fixture model recomputed inline per feature (the BpeKernel
    * discipline — the oracle replays the MODEL, not the training). */
  private[queries] def learnedWsumSql(toks: String): String = {
    val w = graft.functions.QualityModel.fixtureSql(
      Fragments.hashBucketSql("f", graft.functions.QualityModel.Buckets))
    s"coalesce(list_sum([$w for f in ${learnedFeatsSql(toks)}]), 0)"
  }

  /** Learned quality-classifier inference (q258): the hashed-ngram
    * linear scorer ([[TextOps.linearQualityScore]] — model-as-data,
    * [[graft.functions.QualityModel]]) over every document: exact
    * BIGINT weight sum, feature count, normalized 4-dp score, and the
    * integer-compare keep decision. One codegen'd scan projection —
    * no joins, no shuffles beyond the presentation sort; the inference
    * shape that gates a 100 TB corpus at scan speed. */
  val learnedQuality: Q = (s, dir) => {
    val w = graft.functions.QualityModel.fixture()
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.linearQualityScore(col("text"), w).as("lq"))
      .select(col("doc_id"),
        col("lq.n_feats").as("n_feats"), col("lq.w_sum").as("w_sum"))
      // 4-dp score by EXACT integer half-away rounding of w_sum*10/n:
      // a float round() here differs between engines precisely on the
      // half-boundary docs (w_sum*10 ≡ n/2 mod n — sf0.1 has one), the
      // q221 quantize-in-integers lesson applied to the output itself
      .withColumn("nf", greatest(col("n_feats"), lit(1)).cast("long"))
      .withColumn("q4i", expr(
        "CASE WHEN w_sum >= 0 THEN (w_sum * 20 + nf) DIV (2 * nf) " +
        "ELSE -((-w_sum * 20 + nf) DIV (2 * nf)) END"))
      .select(col("doc_id"), col("n_feats"), col("w_sum"),
        (col("q4i").cast("double") / 10000.0).as("quality4"),
        (col("w_sum") > 0).as("keep"))
      .orderBy("doc_id")
  }

  val learnedQualitySql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |w AS (
       |  SELECT doc_id,
       |    len(${learnedFeatsSql("toks")})::INTEGER AS n_feats,
       |    (${learnedWsumSql("toks")})::BIGINT AS w_sum
       |  FROM t)
       |SELECT doc_id, n_feats, w_sum,
       |  (CASE WHEN w_sum >= 0
       |     THEN (w_sum * 20 + greatest(n_feats, 1)) //
       |          (2 * greatest(n_feats, 1))
       |     ELSE -((-w_sum * 20 + greatest(n_feats, 1)) //
       |          (2 * greatest(n_feats, 1))) END) / 10000.0 AS quality4,
       |  w_sum > 0 AS keep
       |FROM w ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q259

  /** q100's capstone with the learned classifier as the quality gate
    * (q259): identical split/dedup/decontam/pack stages, but documents
    * survive on `w_sum > 0` ([[TextOps.linearQualityScore]]) instead of
    * the rule-based score — the one-line model swap a production
    * pipeline performs when a trained gate replaces heuristics. */
  val capstoneLearnedGate: Q = (s, dir) =>
    capstoneWith(s, dir,
      TextOps.linearQualityScore(col("text"),
        graft.functions.QualityModel.fixture()).getField("w_sum") > 0)

  val capstoneLearnedGateSql: String =
    capstoneSqlWith(s"${learnedWsumSql(ToksSql)} > 0")

  // -------------------------------------------------------------- q303

  /** Oracle-replayable TRAINING for the learned quality gate (q303):
    * two integer-quantized batch-perceptron steps distill the rule gate
    * (qualityScore ≥ 0.3, the q100 capstone rule) into the q258
    * hashed-ngram linear model over the train split (bucket < 80).
    * Batch (epoch-level) updates instead of per-doc sequential ones:
    * the update is a SUM over margin violators, so it is
    * order-independent — which is exactly what makes the loop
    * replayable bit-for-bit in SQL (a sequential perceptron's state
    * chain is not). Step 1 from zero weights updates on every doc
    * (score 0 always violates); step 2 re-scores under the clipped
    * step-1 weights and updates on the violators only. Weights clip to
    * ±1000 milli-units (the QualityModel.load contract). The trainer is
    * three keyed aggregates + one broadcast join — no driver loop over
    * docs, no floats anywhere, and the feature extraction is the
    * scorer's own (distinct unigrams ++ distinct bigrams, md5-hashed
    * into 512 buckets), so train and serve can never skew.
    *
    * Output: the full 512-row (bucket, w_milli) weight table — the
    * serving artifact itself, hash-gated against the DuckDB replay of
    * the same two steps. QualityModelSpec shows this table beating the
    * fixture weights on held-out rule labels through the codegen
    * scorer ([[graft.functions.QualityModel.load]] round trip). */
  val trainedQuality: Q = (s, dir) => {
    val B = graft.functions.QualityModel.Buckets
    val train = Tables.t(s, dir, "documents")
      .filter(bucket < 80)
      .select(col("doc_id"),
        when(TextOps.qualityScore(col("text")) >= 0.3, 1L)
          .otherwise(-1L).as("y"),
        col("text"))
    val uni = filter(array_distinct(TextOps.tokens(col("text"))), f => f =!= "")
    // reused thrice (step-1 sum, scoring, step-2 sum) — through the
    // IterFrame width guard keyed on b (round-11 sweep): the scoring
    // pass joins a BROADCAST model table, so a collapsed width here
    // would run it single-threaded; keying on b also feeds both
    // bucket-keyed weight sums their partitioning
    val fb = graft.common.IterFrame.keyed(
      train
        .select(col("doc_id"), col("y"),
          explode(concat(uni, TextOps.wordShingles(col("text"), 2))).as("f"))
        .groupBy(col("doc_id"), col("y"),
          Fragments.hashBucket(col("f"), B).as("b"))
        .agg(count(lit(1)).as("cnt")),
      col("b"))
    val w1 = fb.groupBy("b").agg(sum(col("y") * col("cnt")).as("u"))
      .select(col("b"),
        greatest(lit(-1000L), least(lit(1000L), col("u"))).as("w1"))
    val viol = fb.join(broadcast(w1), "b") // model table ≤ B rows
      .groupBy("doc_id", "y")
      .agg(sum(col("cnt") * col("w1")).as("s"))
      .filter(col("y") * col("s") <= 0)
      .select("doc_id")
    val u2 = fb.join(viol, "doc_id")
      .groupBy("b").agg(sum(col("y") * col("cnt")).as("u2"))
    val w2 = w1.join(u2, Seq("b"), "left")
      .select(col("b").as("bucket"),
        greatest(lit(-1000L),
          least(lit(1000L), col("w1") + coalesce(col("u2"), lit(0L))))
          .as("w"))
    s.range(0, B).select(col("id").cast("int").as("bucket"))
      .join(broadcast(w2), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("w"), lit(0L)).cast("int").as("w_milli"))
      .orderBy("bucket")
  }

  val trainedQualitySql: String = {
    val B = graft.functions.QualityModel.Buckets
    s"""WITH t AS (
       |  SELECT doc_id, text, $ToksSql AS toks FROM documents
       |  WHERE ${Fragments.BucketSql} < 80),
       |lab AS (
       |  SELECT doc_id,
       |    CASE WHEN ${Fragments.qualitySql} >= 0.3 THEN 1 ELSE -1 END AS y,
       |    toks FROM t),
       |fb AS MATERIALIZED (
       |  SELECT doc_id, y, ${Fragments.hashBucketSql("f", B)} AS b,
       |    count(*)::BIGINT AS cnt
       |  FROM (SELECT doc_id, y, unnest(${learnedFeatsSql("toks")}) AS f
       |        FROM lab)
       |  GROUP BY 1, 2, 3),
       |w1 AS MATERIALIZED (
       |  SELECT b, greatest(-1000, least(1000, sum(y * cnt)))::BIGINT AS w1
       |  FROM fb GROUP BY 1),
       |viol AS (
       |  SELECT fb.doc_id FROM fb JOIN w1 USING (b)
       |  GROUP BY fb.doc_id, fb.y HAVING fb.y * sum(cnt * w1) <= 0),
       |u2 AS (
       |  SELECT b, sum(y * cnt)::BIGINT AS u2
       |  FROM fb JOIN viol USING (doc_id) GROUP BY 1),
       |w2 AS (
       |  SELECT w1.b,
       |    greatest(-1000, least(1000, w1 + coalesce(u2, 0)))::BIGINT AS w
       |  FROM w1 LEFT JOIN u2 USING (b))
       |SELECT r.range::INTEGER AS bucket, coalesce(w, 0)::INTEGER AS w_milli
       |FROM range($B) r LEFT JOIN w2 ON w2.b = r.range
       |ORDER BY bucket""".stripMargin
  }

  // -------------------------------------------------------------- q265

  /** Corpus version diff (q265): the dataset-versioning primitive —
    * given two snapshots, report every document that was added, removed,
    * or changed (same id, different content fingerprint), dropping the
    * unchanged mass. Snapshots are derived deterministically from the
    * fixture (A = buckets 0–89, B = buckets 10–99 with every 13th doc
    * revised), so the oracle replays both sides. One full-outer join
    * keyed on doc_id over md5 content fingerprints — entirely map-side
    * + one keyed shuffle; at 100 TB this is the cheap daily answer to
    * "what changed between yesterday's corpus and today's", feeding
    * incremental recompute (the `graft.Compact` / AnnIndex.append
    * batches) instead of full rebuilds. */
  val corpusDiff: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"), bucket.as("bucket"))
    val a = d.filter(col("bucket") < 90)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp_a"))
    val b = d.filter(col("bucket") >= 10)
      .select(col("doc_id"), TextOps.fingerprint(
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev")))
          .otherwise(col("text"))).as("fp_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_b").isNull, "removed")
          .when(col("fp_a").isNull, "added")
          .when(col("fp_a") =!= col("fp_b"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))
      .orderBy("doc_id")
  }

  val corpusDiffSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, $BucketSql AS bucket FROM documents),
       |a AS (
       |  SELECT doc_id, md5($NormSql) AS fp_a FROM d WHERE bucket < 90),
       |b AS (
       |  SELECT doc_id,
       |    md5(regexp_replace(lower(trim(
       |      CASE WHEN doc_id % 13 = 0 THEN text || ' rev' ELSE text END)),
       |      '\\s+', ' ', 'g')) AS fp_b
       |  FROM d WHERE bucket >= 10)
       |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |  CASE WHEN fp_b IS NULL THEN 'removed'
       |       WHEN fp_a IS NULL THEN 'added'
       |       WHEN fp_a <> fp_b THEN 'changed' END AS status
       |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
       |WHERE (CASE WHEN fp_b IS NULL THEN 'removed'
       |       WHEN fp_a IS NULL THEN 'added'
       |       WHEN fp_a <> fp_b THEN 'changed' END) IS NOT NULL
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q266

  /** Neyman-allocation stratified sampling plan (q266): split a
    * B=10 000-doc annotation/eval budget across sources proportional to
    * N_h·σ_h — the variance-minimizing classical allocation, the
    * principled alternative to proportional splits when strata differ
    * in spread. The identity N_h·σ_h = √(n_h·Σx² − (Σx)²) makes the
    * Neyman weight ONE sqrt of an exact BIGINT moment per stratum
    * (milli-quantized, the q246 discipline); allocation integerizes by
    * largest remainder (the q247 rounding), so Σalloc = B exactly —
    * spec-invariant, not approximately. Per-stratum moments are one
    * map-combinable aggregate; everything after is strata-sized. */
  val neymanAlloc: Q = (s, dir) => {
    val budget = 10000L
    val st = Tables.t(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"))
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("m", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("w3",
        round(sqrt(col("m").cast("double")) * 1000).cast("long"))
      .localCheckpoint(true)
    val wt = st.agg(sum("w3").as("wt"))
    val j = st.crossJoin(broadcast(wt))
      .withColumn("base", expr(s"($budget * w3) DIV wt"))
      .withColumn("rem", expr(s"($budget * w3) % wt"))
      .localCheckpoint(true)
    val sb = j.agg(sum("base").as("sb"))
    j.crossJoin(broadcast(sb))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .withColumn("alloc", col("base") +
        when(col("rk") <= lit(budget) - col("sb"), 1L).otherwise(0L))
      .select(col("source"), col("n"), col("w3"), col("alloc"))
      .orderBy("source")
  }

  val neymanAllocSql: String =
    """WITH st AS (
      |  SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sx,
      |    sum(n_chars * n_chars)::BIGINT AS sxx
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT source, n, n * sxx - sx * sx AS m,
      |    round(sqrt((n * sxx - sx * sx)::DOUBLE) * 1000)::BIGINT AS w3
      |  FROM st),
      |t AS (SELECT sum(w3)::BIGINT AS wt FROM w),
      |j AS (
      |  SELECT source, n, w3, (10000 * w3) // wt AS base,
      |    (10000 * w3) % wt AS rem
      |  FROM w, t),
      |s2 AS (SELECT sum(base)::BIGINT AS sb FROM j),
      |r AS (
      |  SELECT j.*, s2.sb,
      |    row_number() OVER (ORDER BY rem DESC, source ASC)::BIGINT AS rk
      |  FROM j, s2)
      |SELECT source, n, w3,
      |  (base + CASE WHEN rk <= 10000 - sb THEN 1 ELSE 0 END)::BIGINT
      |    AS alloc
      |FROM r ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q268

  /** Contrastive training-pair mining (q268): labeled (anchor, partner)
    * pairs for embedding/reranker training. Positives are the verified
    * bag-of-words duplicate pairs (same order-invariant fingerprint,
    * [[TextOps.bagFingerprint]] — shuffled near-copies collide; exact
    * fingerprints find nothing in this fixture; canonical a < b, pair
    * fan-out bounded by dup-group size, the q110 discipline); negatives
    * pair each positive anchor with the document at a fixed id-space
    * shift ((id + 37) mod (max+1)) — a deterministic derangement with
    * NO global window or randomness, then anti-joined against the
    * positive set so an accidental true duplicate can never be labeled
    * negative. Every stage is a keyed join or map-side expression; at
    * 100 TB the only care is the id-shift assumption (contiguous ids —
    * production swaps in a hash-bucket partner with the same plan
    * shape). */
  val contrastivePairs: Q = (s, dir) => {
    // IterFrame keyed on fp (round-11 sweep): the frame is data-scale
    // (a row per document) and feeds a self-join — a bare checkpoint
    // would let AQE coalesce it and serialize the positive-pair stage
    // (the q231/q292 probe-caught class); keying on fp co-partitions
    // both self-join sides
    val d = graft.common.IterFrame.keyed(
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), TextOps.bagFingerprint(col("text")).as("fp")),
      col("fp"))
    val pos = d.as("x").join(d.as("y"), Seq("fp"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .localCheckpoint(true)
    val mx = d.agg(max("doc_id").as("mx"))
    val neg = pos.select(col("doc_a")).distinct()
      .crossJoin(broadcast(mx))
      .withColumn("nid", (col("doc_a") + 37) % (col("mx") + 1))
      .join(d.select(col("doc_id").as("nid")), "nid")
      .select(least(col("doc_a"), col("nid")).as("a"),
        greatest(col("doc_a"), col("nid")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
      .join(pos, Seq("doc_a", "doc_b"), "left_anti")
    pos.withColumn("label", lit(1))
      .unionByName(neg.withColumn("label", lit(0)))
      .orderBy(col("label").desc, col("doc_a"), col("doc_b"))
  }

  val contrastivePairsSql: String =
    s"""WITH d AS (SELECT doc_id, ${Fragments.BagFpSql} AS fp FROM documents),
       |pos AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM d x JOIN d y ON x.fp = y.fp AND x.doc_id < y.doc_id),
       |mx AS (SELECT max(doc_id) AS mx FROM d),
       |neg AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT least(p.doc_a, n.doc_id) AS doc_a,
       |           greatest(p.doc_a, n.doc_id) AS doc_b
       |    FROM (SELECT DISTINCT doc_a FROM pos) p, mx
       |    JOIN d n ON n.doc_id = (p.doc_a + 37) % (mx.mx + 1))
       |  WHERE doc_a <> doc_b AND (doc_a, doc_b) NOT IN
       |    (SELECT (doc_a, doc_b) FROM pos)
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, 1::INT AS label FROM pos
       |UNION ALL
       |SELECT doc_a, doc_b, 0::INT AS label FROM neg
       |ORDER BY label DESC, doc_a, doc_b""".stripMargin

  // ------------------------------------------------- q270–q273 shared

  /** Per-document (learned score, rule label, learned keep) triple —
    * the shared input of the classifier-evaluation family q270–q273.
    * `q4i` is q258's exact 4-dp integer score (half-away integer DIV,
    * never a float round), `label` is the rule-based Gopher-style gate
    * that the capstones q100/q175 already oracle-verify at ≥ 0.3, and
    * `pred` is the learned gate (w_sum > 0) of q259. One codegen'd scan
    * projection — the evaluation family measures the trained model
    * against the heuristic it replaces, the standard acceptance gate
    * before a classifier swap ships (FineWeb-Edu / DCLM practice). */
  private def scoredLabeled(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    val w = graft.functions.QualityModel.fixture()
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.linearQualityScore(col("text"), w).as("lq"),
        (TextOps.qualityScore(col("text")) >= 0.3).as("label"))
      .withColumn("w_sum", col("lq.w_sum"))
      .withColumn("nf", greatest(col("lq.n_feats"), lit(1)).cast("long"))
      .withColumn("q4i", expr(
        "CASE WHEN w_sum >= 0 THEN (w_sum * 20 + nf) DIV (2 * nf) " +
        "ELSE -((-w_sum * 20 + nf) DIV (2 * nf)) END"))
      .select(col("doc_id"), col("q4i"), col("label"),
        (col("w_sum") > 0).as("pred"))
  }

  /** DuckDB twin of [[scoredLabeled]], rendered as a WITH-prefix whose
    * final CTE is `scored(doc_id, q4i, label, pred)`. */
  private val ScoredLabeledSql: String =
    s"""raw AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
       |feats AS (
       |  SELECT doc_id,
       |    (${learnedWsumSql("toks")})::BIGINT AS w_sum,
       |    greatest(len(${learnedFeatsSql("toks")}), 1)::BIGINT AS nf,
       |    (${Fragments.qualitySql}) >= 0.3 AS label
       |  FROM raw),
       |scored AS (
       |  SELECT doc_id,
       |    (CASE WHEN w_sum >= 0 THEN (w_sum * 20 + nf) // (2 * nf)
       |          ELSE -((-w_sum * 20 + nf) // (2 * nf)) END) AS q4i,
       |    label, w_sum > 0 AS pred
       |  FROM feats)""".stripMargin

  // -------------------------------------------------------------- q270

  /** ROC-AUC of the learned quality score against the rule-based gate
    * (q270): the probability a random kept-by-rule document outscores a
    * random dropped one — the single-number acceptance test run before
    * a trained classifier replaces a heuristic gate. Computed in the
    * exact Mann–Whitney rank form over the DISTINCT-score spine (the
    * q224 discipline): doubled mid-ranks keep the positive rank sum
    * R⁺, and AUC = (2R⁺ − 2n⁺(n⁺+1)/2) / (2n⁺n⁻), an exact-BIGINT
    * ratio evaluated in one IEEE division. Data-scale work is one
    * (q4i, label) count aggregate; the spine windows run on the bounded
    * distinct-score table. */
  val rocAuc: Q = (s, dir) => {
    val cell = scoredLabeled(s, dir)
      .groupBy("q4i", "label").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // doubled mid-rank per distinct score: r2 = lo + hi (q224's spine)
    val g = cell.groupBy("q4i").agg(sum("cnt").as("t"))
      .withColumn("hi", sum("t").over(Window.orderBy("q4i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("q4i"), (col("hi") - col("t") + 1 + col("hi")).as("r2"))
    cell.join(broadcast(g), "q4i")
      .agg(
        sum(when(col("label"), col("cnt")).otherwise(0L)).as("n_pos"),
        sum(when(!col("label"), col("cnt")).otherwise(0L)).as("n_neg"),
        sum(when(col("label"), col("cnt") * col("r2")).otherwise(0L))
          .as("rpos2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("rpos2") - col("n_pos") * (col("n_pos") + 1))
            .cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double")), 6).as("auc"))
  }

  val rocAucSql: String =
    s"""WITH $ScoredLabeledSql,
       |cell AS (
       |  SELECT q4i, label, count(*)::BIGINT AS cnt
       |  FROM scored GROUP BY 1, 2),
       |g AS (
       |  SELECT q4i, sum(cnt)::BIGINT AS t,
       |    sum(sum(cnt)) OVER (ORDER BY q4i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS hi
       |  FROM cell GROUP BY 1),
       |g2 AS (SELECT q4i, hi - t + 1 + hi AS r2 FROM g),
       |a AS (
       |  SELECT
       |    sum(CASE WHEN label THEN cnt ELSE 0 END)::BIGINT AS n_pos,
       |    sum(CASE WHEN NOT label THEN cnt ELSE 0 END)::BIGINT AS n_neg,
       |    sum(CASE WHEN label THEN cnt * r2 ELSE 0 END)::BIGINT AS rpos2
       |  FROM cell JOIN g2 USING (q4i))
       |SELECT n_pos, n_neg,
       |  round((rpos2 - n_pos * (n_pos + 1))::DOUBLE /
       |    (2.0 * n_pos::DOUBLE * n_neg::DOUBLE), 6) AS auc
       |FROM a""".stripMargin

  // -------------------------------------------------------------- q271

  /** Score-calibration bins (q271): ten equal-width bins over the
    * learned score's [min, max] range, each reporting document count,
    * rule-positive count, the positive fraction, and the mean score —
    * the reliability diagram that says WHERE the classifier's threshold
    * can safely sit. Bin edges, fractions, and means are all exact
    * integer arithmetic ((q4i−mn)·10 DIV (mx−mn+1) bin index; half-away
    * DIV for the 4-dp fractions) so both engines agree bit-for-bit.
    * One scan + one broadcast min/max scalar + one 10-row aggregate. */
  val calibrationBins: Q = (s, dir) => {
    val d = scoredLabeled(s, dir).localCheckpoint(true)
    val mm = d.agg(min("q4i").as("mn"), max("q4i").as("mx"))
    d.crossJoin(broadcast(mm))
      .withColumn("bin",
        expr("((q4i - mn) * 10) DIV (mx - mn + 1)").cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum("q4i").as("sq"))
      .withColumn("pos_frac4", expr(
        "((n_pos * 20000 + n) DIV (2 * n))").cast("double") / 10000.0)
      .withColumn("mean_score4", expr(
        "CASE WHEN sq >= 0 THEN (sq * 2 + n) DIV (2 * n) " +
        "ELSE -((-sq * 2 + n) DIV (2 * n)) END").cast("double") / 10000.0)
      .select(col("bin"), col("n"), col("n_pos"),
        col("pos_frac4"), col("mean_score4"))
      .orderBy("bin")
  }

  val calibrationBinsSql: String =
    s"""WITH $ScoredLabeledSql,
       |mm AS (SELECT min(q4i) AS mn, max(q4i) AS mx FROM scored),
       |b AS (
       |  SELECT ((q4i - mn) * 10 // (mx - mn + 1))::INT AS bin,
       |    label, q4i
       |  FROM scored CROSS JOIN mm),
       |g AS (
       |  SELECT bin, count(*)::BIGINT AS n,
       |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       |    sum(q4i)::BIGINT AS sq
       |  FROM b GROUP BY 1)
       |SELECT bin, n, n_pos,
       |  ((n_pos * 20000 + n) // (2 * n))::DOUBLE / 10000.0 AS pos_frac4,
       |  (CASE WHEN sq >= 0 THEN (sq * 2 + n) // (2 * n)
       |        ELSE -((-sq * 2 + n) // (2 * n)) END)::DOUBLE / 10000.0
       |    AS mean_score4
       |FROM g ORDER BY bin""".stripMargin

  // -------------------------------------------------------------- q272

  /** Operating-point sweep (q272): confusion counts and exact 4-dp
    * precision / recall / F1 at five thresholds spanning the learned
    * score's range (mn + i·(mx−mn) DIV 4, i = 0..4) — the
    * threshold-picking table behind every "keep the top X%" curation
    * decision. The five thresholds broadcast against one scan; every
    * derived metric is a half-away integer DIV of exact counts, so the
    * knife-edge float rounds that bit q258 at sf0.1 cannot recur. */
  val thresholdSweep: Q = (s, dir) => {
    val d = scoredLabeled(s, dir).localCheckpoint(true)
    val thr = d.agg(min("q4i").as("mn"), max("q4i").as("mx"))
      .crossJoin(broadcast(d.sparkSession.range(0, 5).toDF("i")))
      .select(col("i").cast("int").as("thr_i"),
        expr("mn + ((mx - mn) * i) DIV 4").as("thr"))
    d.crossJoin(broadcast(thr))
      .groupBy("thr_i", "thr")
      .agg(
        sum(when(col("label") && col("q4i") >= col("thr"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(!col("label") && col("q4i") >= col("thr"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("label") && col("q4i") < col("thr"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(!col("label") && col("q4i") < col("thr"), 1L)
          .otherwise(0L)).as("tn"))
      .withColumn("prec4", expr(
        "CASE WHEN tp + fp = 0 THEN NULL ELSE " +
        "((tp * 20000 + (tp + fp)) DIV (2 * (tp + fp))) END")
        .cast("double") / 10000.0)
      .withColumn("rec4", expr(
        "CASE WHEN tp + fn = 0 THEN NULL ELSE " +
        "((tp * 20000 + (tp + fn)) DIV (2 * (tp + fn))) END")
        .cast("double") / 10000.0)
      .withColumn("f14", expr(
        "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE " +
        "((2 * tp * 20000 + (2 * tp + fp + fn)) DIV " +
        "(2 * (2 * tp + fp + fn))) END").cast("double") / 10000.0)
      .select(col("thr_i"), col("thr"), col("tp"), col("fp"),
        col("fn"), col("tn"), col("prec4"), col("rec4"), col("f14"))
      .orderBy("thr_i")
  }

  val thresholdSweepSql: String =
    s"""WITH $ScoredLabeledSql,
       |mm AS (SELECT min(q4i) AS mn, max(q4i) AS mx FROM scored),
       |thr AS (
       |  SELECT i::INT AS thr_i, mn + ((mx - mn) * i) // 4 AS thr
       |  FROM mm CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS i)),
       |g AS (
       |  SELECT thr_i, thr,
       |    sum(CASE WHEN label AND q4i >= thr THEN 1 ELSE 0 END)::BIGINT AS tp,
       |    sum(CASE WHEN NOT label AND q4i >= thr THEN 1 ELSE 0 END)::BIGINT AS fp,
       |    sum(CASE WHEN label AND q4i < thr THEN 1 ELSE 0 END)::BIGINT AS fn,
       |    sum(CASE WHEN NOT label AND q4i < thr THEN 1 ELSE 0 END)::BIGINT AS tn
       |  FROM scored CROSS JOIN thr GROUP BY 1, 2)
       |SELECT thr_i, thr, tp, fp, fn, tn,
       |  (CASE WHEN tp + fp = 0 THEN NULL ELSE
       |    (tp * 20000 + (tp + fp)) // (2 * (tp + fp)) END)::DOUBLE
       |    / 10000.0 AS prec4,
       |  (CASE WHEN tp + fn = 0 THEN NULL ELSE
       |    (tp * 20000 + (tp + fn)) // (2 * (tp + fn)) END)::DOUBLE
       |    / 10000.0 AS rec4,
       |  (CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE
       |    (2 * tp * 20000 + (2 * tp + fp + fn)) //
       |    (2 * (2 * tp + fp + fn)) END)::DOUBLE / 10000.0 AS f14
       |FROM g ORDER BY thr_i""".stripMargin

  // -------------------------------------------------------------- q273

  /** Gate-agreement audit (q273): the 2×2 confusion matrix between the
    * rule-based gate and the learned gate plus Cohen's κ — observed
    * agreement corrected for the agreement two independent gates with
    * these marginals would reach by chance. κ uses the exact 2×2
    * identity 2(n₁₁n₀₀ − n₁₀n₀₁) / ((n₁₁+n₁₀)(n₁₀+n₀₀) +
    * (n₁₁+n₀₁)(n₀₁+n₀₀)): a signed ratio of exact BIGINTs, quantized
    * 4-dp by half-away integer DIV. One scan, one single-row
    * conditional aggregate — the "did the model swap change WHO we
    * keep, beyond chance" number a curation sign-off wants. */
  val kappaAgreement: Q = (s, dir) =>
    scoredLabeled(s, dir)
      .agg(
        sum(when(col("label") && col("pred"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("label") && !col("pred"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("label") && col("pred"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("label") && !col("pred"), 1L).otherwise(0L)).as("n00"))
      .withColumn("po4", expr(
        "((n11 + n00) * 20000 + (n11 + n10 + n01 + n00)) DIV " +
        "(2 * (n11 + n10 + n01 + n00))").cast("double") / 10000.0)
      .withColumn("den",
        (col("n11") + col("n10")) * (col("n10") + col("n00")) +
          (col("n11") + col("n01")) * (col("n01") + col("n00")))
      .withColumn("num",
        lit(2) * (col("n11") * col("n00") - col("n10") * col("n01")))
      .withColumn("kappa4", expr(
        "CASE WHEN den = 0 THEN NULL " +
        "WHEN num >= 0 THEN (num * 20000 + den) DIV (2 * den) " +
        "ELSE -((-num * 20000 + den) DIV (2 * den)) END")
        .cast("double") / 10000.0)
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        col("po4"), col("kappa4"))

  val kappaAgreementSql: String =
    s"""WITH $ScoredLabeledSql,
       |c AS (
       |  SELECT
       |    sum(CASE WHEN label AND pred THEN 1 ELSE 0 END)::BIGINT AS n11,
       |    sum(CASE WHEN label AND NOT pred THEN 1 ELSE 0 END)::BIGINT AS n10,
       |    sum(CASE WHEN NOT label AND pred THEN 1 ELSE 0 END)::BIGINT AS n01,
       |    sum(CASE WHEN NOT label AND NOT pred THEN 1 ELSE 0 END)::BIGINT AS n00
       |  FROM scored),
       |k AS (
       |  SELECT *,
       |    2 * (n11 * n00 - n10 * n01) AS num,
       |    (n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00) AS den
       |  FROM c)
       |SELECT n11, n10, n01, n00,
       |  (((n11 + n00) * 20000 + (n11 + n10 + n01 + n00)) //
       |    (2 * (n11 + n10 + n01 + n00)))::DOUBLE / 10000.0 AS po4,
       |  (CASE WHEN den = 0 THEN NULL
       |        WHEN num >= 0 THEN (num * 20000 + den) // (2 * den)
       |        ELSE -((-num * 20000 + den) // (2 * den)) END)::DOUBLE
       |    / 10000.0 AS kappa4
       |FROM k""".stripMargin

  // -------------------------------------------------------------- q293

  /** Hashing-trick collision audit (q293): the load histogram of
    * q258's 512-bucket feature hash — how many buckets carry k
    * distinct corpus features each (plus the empty-bucket row) — the
    * standard diagnostic before trusting a hashed linear model: heavy
    * collisions mean weights are shared across unrelated n-grams. The
    * feature space is exactly [[TextOps.linearQualityScore]]'s
    * (distinct unigrams ∪ distinct bigrams, corpus-deduped); one
    * distinct + two bounded aggregates (≤ 512 rows after the first). */
  val hashCollisionAudit: Q = (s, dir) => {
    val b = graft.functions.QualityModel.Buckets
    val feats = Tables.t(s, dir, "documents")
      .select(explode(concat(
        filter(array_distinct(TextOps.tokens(col("text"))), f => f =!= ""),
        TextOps.wordShingles(col("text"), 2))).as("f"))
      .distinct()
    val loads = feats
      .select(Fragments.hashBucket(col("f"), b).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("load"))
      .localCheckpoint(true)
    val hist = loads.groupBy("load").agg(count(lit(1)).as("n_buckets"))
    val empty = loads.agg((lit(b.toLong) - count(lit(1))).as("n_buckets"))
      .select(lit(0L).as("load"), col("n_buckets"))
    hist.unionByName(empty)
      .filter(col("n_buckets") > 0)
      .orderBy("load")
  }

  val hashCollisionAuditSql: String = {
    val b = graft.functions.QualityModel.Buckets
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |feats AS MATERIALIZED (
       |  SELECT DISTINCT f FROM (
       |    SELECT unnest(${learnedFeatsSql("toks")}) AS f FROM t)),
       |loads AS MATERIALIZED (
       |  SELECT ${Fragments.hashBucketSql("f", b)} AS bkt,
       |    count(*)::BIGINT AS load
       |  FROM feats GROUP BY 1),
       |h AS (SELECT load, count(*)::BIGINT AS n_buckets FROM loads GROUP BY 1
       |      UNION ALL
       |      SELECT 0::BIGINT, ($b - count(*))::BIGINT FROM loads)
       |SELECT load, n_buckets FROM h WHERE n_buckets > 0
       |ORDER BY load""".stripMargin
  }

  // -------------------------------------------------------------- q295

  /** Cross-source duplicate-leakage matrix (q295): for every source
    * pair, how many exact-dup fingerprints they share and what fraction
    * of the smaller source's content that is — the governance table
    * that catches one crawl re-ingesting another (and the licensing
    * question "whose text is this really"). Keyed on the
    * order-invariant bag-of-words fingerprint (q110's key), so
    * shuffled near-copies collide too; one distinct (source, fp)
    * projection; the fp-keyed self-join fans out only where content
    * actually collides; containment is a half-away 4-dp integer DIV.
    * Pairs with zero overlap never materialize. */
  val sourceLeakage: Q = (s, dir) => {
    // IterFrame keyed on fp (round-11 sweep): distinct output feeding a
    // self-join on fp — keyed, both sides co-partition with no exchange
    val d = graft.common.IterFrame.keyed(
      Tables.t(s, dir, "documents")
        .select(col("source"), TextOps.bagFingerprint(col("text")).as("fp"))
        .distinct(),
      col("fp"))
    val sizes = d.groupBy("source").agg(count(lit(1)).as("nv"))
    d.as("a").join(d.as("b"), Seq("fp"))
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("nv").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("nv").as("n_b"))), "src_b")
      .withColumn("containment4", expr(
        "(n_shared * 20000 + least(n_a, n_b)) DIV (2 * least(n_a, n_b))")
        .cast("double") / 10000.0)
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_shared"), col("containment4"))
      .orderBy("src_a", "src_b")
  }

  val sourceLeakageSql: String =
    s"""WITH d AS MATERIALIZED (
       |  SELECT DISTINCT source, ${Fragments.BagFpSql} AS fp FROM documents),
       |sz AS MATERIALIZED (
       |  SELECT source, count(*)::BIGINT AS nv FROM d GROUP BY 1),
       |sh AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    count(*)::BIGINT AS n_shared
       |  FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, x.nv AS n_a, y.nv AS n_b, n_shared,
       |  ((n_shared * 20000 + least(x.nv, y.nv)) //
       |   (2 * least(x.nv, y.nv)))::DOUBLE / 10000.0 AS containment4
       |FROM sh JOIN sz x ON x.source = sh.src_a
       |JOIN sz y ON y.source = sh.src_b
       |ORDER BY src_a, src_b""".stripMargin

  // -------------------------------------------------------------- q298

  /** Snapshot quality drift (q298): q265's corpus-version diff asked
    * WHAT changed; this asks whether the change moved QUALITY — per
    * source, the exact 4-dp mean rule-quality of snapshot A (buckets
    * 0–89) vs snapshot B (buckets 10–99, every 13th doc revised) and
    * the delta. Per-doc scores quantize to exact 1e-4 integers before
    * the sums (the q200 exact-mean discipline), so the drift table is
    * order-free integer arithmetic end to end. */
  val snapshotQualityDrift: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        bucket.as("bucket"))
      .localCheckpoint(true)
    def q4(t: org.apache.spark.sql.Column) =
      round(TextOps.qualityScore(t) * 1e4).cast("long")
    val a = d.filter(col("bucket") < 90)
      .groupBy("source")
      .agg(count(lit(1)).as("n_a"), sum(q4(col("text"))).as("s_a"))
    val b = d.filter(col("bucket") >= 10)
      .withColumn("t2",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev")))
          .otherwise(col("text")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_b"), sum(q4(col("t2"))).as("s_b"))
    a.join(b, Seq("source"), "full_outer")
      .na.fill(0L, Seq("n_a", "s_a", "n_b", "s_b"))
      .withColumn("m_a", expr(
        "CASE WHEN n_a = 0 THEN NULL ELSE (s_a * 2 + n_a) DIV (2 * n_a) END"))
      .withColumn("m_b", expr(
        "CASE WHEN n_b = 0 THEN NULL ELSE (s_b * 2 + n_b) DIV (2 * n_b) END"))
      .select(col("source"), col("n_a"), col("n_b"),
        (col("m_a").cast("double") / 1e4).as("mean_a4"),
        (col("m_b").cast("double") / 1e4).as("mean_b4"),
        ((col("m_b") - col("m_a")).cast("double") / 1e4).as("delta4"))
      .orderBy("source")
  }

  val snapshotQualityDriftSql: String = {
    val q4 = s"round((${Fragments.qualitySql}) * 10000)::BIGINT"
    val q4b = q4.replace("text", "t2")
    s"""WITH d AS (
       |  SELECT doc_id, source, text, $BucketSql AS bucket FROM documents),
       |a AS (
       |  SELECT source, count(*)::BIGINT AS n_a, sum($q4)::BIGINT AS s_a
       |  FROM d WHERE bucket < 90 GROUP BY 1),
       |b AS (
       |  SELECT source, count(*)::BIGINT AS n_b, sum($q4b)::BIGINT AS s_b
       |  FROM (SELECT source,
       |          CASE WHEN doc_id % 13 = 0 THEN text || ' rev' ELSE text END
       |            AS t2
       |        FROM d WHERE bucket >= 10)
       |  GROUP BY 1),
       |j AS (
       |  SELECT coalesce(a.source, b.source) AS source,
       |    coalesce(n_a, 0) AS n_a, coalesce(s_a, 0) AS s_a,
       |    coalesce(n_b, 0) AS n_b, coalesce(s_b, 0) AS s_b
       |  FROM a FULL OUTER JOIN b ON a.source = b.source),
       |m AS (
       |  SELECT source, n_a, n_b,
       |    CASE WHEN n_a = 0 THEN NULL
       |         ELSE (s_a * 2 + n_a) // (2 * n_a) END AS m_a,
       |    CASE WHEN n_b = 0 THEN NULL
       |         ELSE (s_b * 2 + n_b) // (2 * n_b) END AS m_b
       |  FROM j)
       |SELECT source, n_a, n_b,
       |  m_a::DOUBLE / 1e4 AS mean_a4, m_b::DOUBLE / 1e4 AS mean_b4,
       |  (m_b - m_a)::DOUBLE / 1e4 AS delta4
       |FROM m ORDER BY source""".stripMargin
  }

  // -------------------------------------------------------------- q299

  /** Effective sample size of the temperature mixture (q299): q192's
    * T = 2 weights flatten the source distribution — ESS = (Σw)²/Σw²
    * says how many EFFECTIVE sources the reweighted mixture behaves
    * like (n_sources when uniform, 1 when degenerate). Each source's
    * w = √(share) is micro-quantized once (one division + one
    * correctly-rounded sqrt per source, both engines identical), then
    * ESS is a half-away 4-dp quotient of the exact DECIMAL(38)
    * moment sums. Data-scale work: one token-count aggregate. */
  val mixtureEss: Q = (s, dir) => {
    val perSrc = Tables.t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tok"))
    val tot = perSrc.agg(sum("n_tok").as("nn"))
    perSrc.crossJoin(broadcast(tot))
      .withColumn("w6",
        round(sqrt(col("n_tok").cast("double") / col("nn").cast("double"))
          * 1e6).cast("long"))
      .agg(count(lit(1)).cast("int").as("n_sources"),
        sum("w6").as("s1"),
        sum(expr("CAST(w6 AS DECIMAL(38,0)) * w6")).as("s2"))
      .select(col("n_sources"),
        expr("(CAST(s1 AS DECIMAL(38,0)) * s1 * 20000 + s2) DIV (2 * s2)")
          .cast("double").divide(10000.0).as("ess4"))
  }

  val mixtureEssSql: String =
    s"""WITH p AS (
       |  SELECT source, sum(len($ToksSql))::BIGINT AS n_tok
       |  FROM documents GROUP BY 1),
       |t AS (SELECT sum(n_tok)::BIGINT AS nn FROM p),
       |w AS (
       |  SELECT round(sqrt(n_tok::DOUBLE / nn::DOUBLE) * 1e6)::BIGINT AS w6
       |  FROM p CROSS JOIN t),
       |m AS (
       |  SELECT count(*)::INT AS n_sources, sum(w6)::BIGINT AS s1,
       |    sum(w6::HUGEINT * w6)::HUGEINT AS s2
       |  FROM w)
       |SELECT n_sources,
       |  ((s1::HUGEINT * s1 * 20000 + s2) // (2 * s2))::DOUBLE / 10000.0
       |    AS ess4
       |FROM m""".stripMargin

  // -------------------------------------------------------------- q101

  /** Unpivot / melt (wide → long reshaping): lineitem's four measure
    * columns to (metric, value) rows via `Dataset.unpivot` — the
    * inverse of q48's pivot. Map-side row explosion, no shuffle beyond
    * the presentation sort; at 100 TB output is a fixed 4× of the
    * filtered input. */
  val unpivotMeasures: Q = (s, dir) =>
    Tables.t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 997 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val unpivotMeasuresSql: String =
    """SELECT l_orderkey, l_linenumber, metric, value
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |             l_discount, l_tax
      |      FROM lineitem WHERE l_orderkey % 997 = 0)
      |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice,
      |                              l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  // -------------------------------------------------------------- q102

  /** Map-typed column surface: per nation, build a segment→count map
    * (map_from_entries over the sorted per-segment counts) and consume
    * it with element_at / size / map_keys — then emit ONLY scalars,
    * because hash-comparing nested map columns across engines (and
    * through the driver's pandas compare) is where determinism goes to
    * die. The oracle computes the same scalars relationally; the map
    * construction under test lives on the Spark side. */
  val mapFunctions: Q = (s, dir) => {
    val c = Tables.t(s, dir, "customer")
    val n = Tables.t(s, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("n_name")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("c_mktsegment"), col("cnt"))))).as("m"))
      .select(col("n_name"),
        size(col("m")).as("n_segments"),
        coalesce(element_at(col("m"), "BUILDING"), lit(0L)).as("building_cnt"),
        concat_ws(",", map_keys(col("m"))).as("segments"))
      .orderBy("n_name")
  }

  val mapFunctionsSql: String =
    """WITH sc AS (
      |  SELECT n_name, c_mktsegment AS seg, count(*) AS cnt
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT n_name,
      |  count(*)::INTEGER AS n_segments,
      |  coalesce(sum(cnt) FILTER (WHERE seg = 'BUILDING'), 0)::BIGINT AS building_cnt,
      |  string_agg(seg, ',' ORDER BY seg) AS segments
      |FROM sc GROUP BY n_name ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------- q103

  /** Time-bucketed distinct cardinality (the telemetry workhorse):
    * events per 6-hour bucket with distinct users. Buckets are integer
    * epoch-seconds division — portable across engines by construction
    * (window()/time_bucket() origins differ between engines; integer
    * math doesn't). count_distinct expands to the classic two-exchange
    * expand+regroup; at 100 TB cardinalities beyond memory swap to the
    * oracle-gated HLL path (q49) with the same query shape. */
  val windowedDistinct: Q = (s, dir) =>
    Tables.t(s, dir, "events")
      .select((col("ts").cast("long") / 21600).cast("long").as("bucket"),
        col("user_id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .select(from_unixtime(col("bucket") * 21600, "yyyy-MM-dd HH:mm").as("bucket_start"),
        col("n_events"), col("n_users"))
      .orderBy("bucket_start")

  // make_timestamp(micros) yields a NAIVE timestamp, so strftime is
  // timezone-independent — to_timestamp() would return TIMESTAMPTZ and
  // render in the host's local zone, breaking the compare off-UTC.
  val windowedDistinctSql: String =
    """SELECT strftime(make_timestamp(
      |          ((epoch_ns(ts) // 1000000000) // 21600 * 21600) * 1000000),
      |                '%Y-%m-%d %H:%M') AS bucket_start,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q104

  /** Robust outlier stats per group: median, MAD (median absolute
    * deviation), and the |x − med| > 3·MAD outlier count — the
    * heavy-tail-safe alternative to q85's stddev. Exact percentiles
    * over integer cents (the interpolation arithmetic is identical
    * integer-derived doubles in both engines, proven by q54); two
    * keyed aggregations, map-combinable except the percentile state,
    * which is the documented trade — approx_percentile (q65) is the
    * sketch path at extreme group sizes. */
  val madOutliers: Q = (s, dir) => {
    val e = Tables.t(s, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
    val med = e.groupBy("event_type")
      .agg(expr("percentile(c, 0.5)").as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .select(col("event_type"), col("med"), abs(col("c") - col("med")).as("ad"))
      .groupBy("event_type")
      .agg(min("med").as("med"), expr("percentile(ad, 0.5)").as("mad"))
    e.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(min("med") / 100, 4).as("median"),
        round(min("mad") / 100, 4).as("mad"),
        sum(when(abs(col("c") - col("med")) > col("mad") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  val madOutliersSql: String =
    """WITH e AS (
      |  SELECT event_type, round(value * 100)::BIGINT AS c FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(c, 0.5) AS med FROM e GROUP BY 1),
      |mad AS (
      |  SELECT e.event_type, min(med.med) AS med,
      |         quantile_cont(abs(e.c - med.med), 0.5) AS mad
      |  FROM e JOIN med USING (event_type) GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  round(min(mad.med) / 100, 4) AS median,
      |  round(min(mad.mad) / 100, 4) AS mad,
      |  sum(CASE WHEN abs(e.c - mad.med) > mad.mad * 3 THEN 1 ELSE 0 END)::BIGINT
      |    AS n_outliers
      |FROM e JOIN mad USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q105

  /** explode_outer: the null-preserving generator — docs too short for
    * an 80-token shingle keep one NULL row instead of vanishing (the
    * plain-explode data-loss foot-gun). The fixture straddles the
    * boundary, so both branches carry rows. DuckDB has no OUTER unnest;
    * the oracle's left-join-to-exploded form is the relational
    * identity. */
  val explodeOuter: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        explode_outer(TextOps.wordShingles(col("text"), 80)).as("sh"))
      .orderBy(col("doc_id"), col("sh").asc_nulls_first)

  val explodeOuterSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_distinct([array_to_string(toks[i:i+79], ' ')
       |      for i in range(1, len(toks) - 78)]) AS sh
       |  FROM (SELECT doc_id, $ToksSql AS toks FROM documents)),
       |x AS (SELECT doc_id, unnest(sh) AS sh FROM t)
       |SELECT t.doc_id, x.sh
       |FROM t LEFT JOIN x USING (doc_id)
       |ORDER BY t.doc_id, x.sh ASC NULLS FIRST""".stripMargin

  // -------------------------------------------------------------- q106

  /** Boolean aggregates (every / any): per order status, whether every
    * order clears a floor and whether any crosses a ceiling — plus the
    * count they summarize. Map-combinable bit aggregation. */
  val boolAgg: Q = (s, dir) =>
    Tables.t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).as("any_over_400k"))
      .orderBy("o_orderstatus")

  val boolAggSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_totalprice > 400000) AS any_over_400k
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q107

  /** Argument extremes (max_by / min_by ≈ DuckDB arg_max/arg_min): per
    * status, which order carries the highest and lowest total. The
    * (price, orderkey) struct makes ties deterministic — bare
    * max_by(value, price) ties are engine-arbitrary, the classic
    * nondeterminism trap in this aggregate. */
  val argExtremes: Q = (s, dir) =>
    Tables.t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
        max(col("o_totalprice")).as("top_price"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("bottom_order"),
        min(col("o_totalprice")).as("bottom_price"))
      .orderBy("o_orderstatus")

  // DuckDB 1.0's arg_max/arg_min reject struct ordering keys, so the
  // oracle derives the same deterministic winners via row_number
  val argExtremesSql: String =
    """WITH r AS (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
      |  FROM orders)
      |SELECT o_orderstatus,
      |  max(CASE WHEN rd = 1 THEN o_orderkey END) AS top_order,
      |  max(CASE WHEN rd = 1 THEN o_totalprice END) AS top_price,
      |  max(CASE WHEN ra = 1 THEN o_orderkey END) AS bottom_order,
      |  max(CASE WHEN ra = 1 THEN o_totalprice END) AS bottom_price
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q192

  /** Temperature-scaled domain sampling weights (T = 2, the standard
    * multilingual-LM upsampling rule p_i ∝ tokens_i^(1/T)): per-source
    * token masses become sampling probabilities under both the raw
    * (T = 1) and temperature-flattened (T = 2) rules, plus the boost
    * each source receives from flattening. T = 2 is chosen
    * deliberately: tokens^(1/2) is ONE `sqrt`, which IEEE 754 requires
    * to be correctly rounded in both engines — no libm transcendental
    * in the hot path (the general-T `pow` form is documented, not
    * shipped). `boost` divides the two ALREADY-6dp-rounded
    * probabilities, so every emitted digit is reproducible.
    *
    * Scale shape: one map-combinable keyed agg to ≤|sources| rows, a
    * single-row total broadcast back over them — the corpus is touched
    * once map-side regardless of size. */
  val temperatureMix: Q = (s, dir) => {
    val perSrc = Tables.t(s, dir, "documents")
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("tokens"))
      .withColumn("w", sqrt(col("tokens").cast("double")))
    val tot = perSrc.agg(sum("tokens").as("tot_tokens"), sum("w").as("tot_w"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        round(col("tokens").cast("double") / col("tot_tokens").cast("double"), 6)
          .as("p_raw"),
        round(col("w") / col("tot_w"), 6).as("p_t2"))
      // a source under ~5e-7 of the corpus rounds p_raw to exactly 0;
      // NULL beats emitting Infinity for its flattening boost
      .withColumn("boost",
        when(col("p_raw") > 0, round(col("p_t2") / col("p_raw"), 4)))
      .orderBy("source")
  }

  val temperatureMixSql: String =
    s"""WITH d AS (
       |  SELECT source, len($ToksSql)::BIGINT AS n_tok FROM documents),
       |s AS (
       |  SELECT source, sum(n_tok)::BIGINT AS tokens,
       |    sqrt(sum(n_tok)::DOUBLE) AS w
       |  FROM d GROUP BY 1),
       |t AS (SELECT sum(tokens) AS tot_tokens, sum(w) AS tot_w FROM s)
       |SELECT source, tokens,
       |  round(tokens::DOUBLE / tot_tokens::DOUBLE, 6) AS p_raw,
       |  round(w / tot_w, 6) AS p_t2,
       |  CASE WHEN round(tokens::DOUBLE / tot_tokens::DOUBLE, 6) > 0
       |       THEN round(round(w / tot_w, 6) /
       |                  round(tokens::DOUBLE / tot_tokens::DOUBLE, 6), 4)
       |  END AS boost
       |FROM s CROSS JOIN t ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q198

  /** Per-source distribution shift: total-variation distance between
    * each source's unigram distribution and the corpus-wide one — the
    * domain-shift monitor a mixture pipeline (q169/q192) reads before
    * reweighting, and the drift alarm for incremental crawls. TV is
    * chosen over KL deliberately: no logarithm, so the whole statistic
    * is divisions + one absolute sum. The vocabulary a source does NOT
    * contain never materializes: Σ_{t∉S} q_t = 1 − Σ_{t∈S} q_t, so the
    * correction term folds into the same per-source aggregate —
    * deliberately not a vocab×sources cross join.
    *
    * Scale shape: (source, term) counts collapse map-side; corpus term
    * counts are ONE further keyed count reused for totals; the scoring
    * join is term-keyed; per-source totals broadcast back. Shuffles
    * carry count rows bounded by |sources|·|vocab|, never tokens. */
  val domainShift: Q = (s, dir) => {
    val st = Tables.t(s, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c_st"))
    val ct = st.groupBy("term").agg(sum("c_st").as("c_t"))
    val ns = st.groupBy("source").agg(sum("c_st").as("n_s"))
    val n = ct.agg(sum("c_t").as("n_tot"))
    st.join(ct, "term")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(n))
      .groupBy("source")
      .agg(count(lit(1)).cast("int").as("n_terms"),
        sum(abs(col("c_st").cast("double") / col("n_s").cast("double")
          - col("c_t").cast("double") / col("n_tot").cast("double"))).as("od"),
        sum(col("c_t").cast("double") / col("n_tot").cast("double")).as("qm"))
      .select(col("source"), col("n_terms"),
        (round((col("od") + (lit(1.0) - col("qm"))) * lit(0.5), 4) + lit(0.0))
          .as("tv_dist"))
      .orderBy("source")
  }

  val domainShiftSql: String =
    s"""WITH tok AS (SELECT source, unnest($ToksSql) AS term FROM documents),
       |st AS (SELECT source, term, count(*) AS c_st FROM tok GROUP BY 1, 2),
       |ct AS (SELECT term, sum(c_st)::BIGINT AS c_t FROM st GROUP BY 1),
       |ns AS (SELECT source, sum(c_st)::BIGINT AS n_s FROM st GROUP BY 1),
       |n AS (SELECT sum(c_t)::BIGINT AS n_tot FROM ct)
       |SELECT s.source, count(*)::INT AS n_terms,
       |  round((sum(abs(s.c_st::DOUBLE / ns.n_s::DOUBLE
       |              - ct.c_t::DOUBLE / n.n_tot::DOUBLE))
       |         + (1.0 - sum(ct.c_t::DOUBLE / n.n_tot::DOUBLE))) * 0.5, 4) + 0.0
       |    AS tv_dist
       |FROM st s JOIN ct USING (term) JOIN ns USING (source) CROSS JOIN n
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q169

  /** Domain-mix rebalancing — the training-mixture op: each source gets
    * a target share of the corpus (here: srcs 0–4 are "high-value" at
    * 8% each, the other fifteen at 4%), enforced by keeping the first
    * quota docs per source under a DETERMINISTIC hash order (md5 of the
    * doc id — reproducible at any scale, no RNG). Quota arithmetic is
    * exact-integer cross-multiplication: keep iff rank·100 ≤ w·total.
    * One keyed window per source + a 1-row total broadcast — the corpus
    * shuffles once on source. */
  val domainMix: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
    val w = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 8L)
      .otherwise(4L)
    val ranked = docs
      .withColumn("hkey", md5(concat(col("doc_id").cast("string"), lit("mix"))))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(col("hkey"), col("doc_id"))).cast("long"))
    val total = docs.agg(count(lit(1)).as("total"))
    ranked.join(broadcast(total))
      .filter(col("rnk") * 100 <= w * col("total"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  val domainMixSql: String =
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(doc_id::VARCHAR || 'mix'), doc_id) AS rnk
      |  FROM documents),
      |tot AS (SELECT count(*)::BIGINT AS total FROM documents)
      |SELECT source, count(*)::BIGINT AS n_kept
      |FROM ranked, tot
      |WHERE rnk * 100 <= (CASE WHEN source IN
      |        ('src0', 'src1', 'src2', 'src3', 'src4')
      |      THEN 8 ELSE 4 END) * total
      |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q170

  /** Token-budget corpus selection: per language, take documents in
    * descending quality order (rounded score, doc-id tie-break) until
    * the running token total reaches the budget — the "best N tokens
    * per language" op every pretraining mix needs. The cumulative sum
    * is one window per language key (keyed exchange, not a global
    * sort); at 100 TB the same contract binary-searches a quality
    * threshold instead (two aggregate passes), noted here. */
  /** The budget fill parameterized over the token counter — whitespace
    * tokens for q170, true BPE subwords for q206 ([[TextOps.subwordCount]],
    * the denomination a production pipeline budgets in). Same plan either
    * way: the counter is a map-side column, the fill one keyed window. */
  private def tokenBudgetBy(
      counter: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Q =
    (s, dir) => {
    val budget = 3000L
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        counter(col("text")).as("n_tokens"),
        TextOps.qualityScore(col("text")).as("q"))
    val w = Window.partitionBy("lang")
      .orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_used"),
        max("cum_tokens").as("cum_check"))
      .orderBy("lang")
  }

  val tokenBudget: Q = tokenBudgetBy(t => size(TextOps.tokens(t)).cast("long"))

  /** q206: the q170 budget fill denominated in BPE subwords. */
  val tokenBudgetBpe: Q = tokenBudgetBy(t => TextOps.subwordCount(t))

  val tokenBudgetSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, len($ToksSql)::BIGINT AS n_tokens,
       |         ${Fragments.qualitySql} AS q
       |  FROM documents),
       |c AS (
       |  SELECT lang, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY q DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM d)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |       sum(n_tokens)::BIGINT AS tokens_used,
       |       max(cum_tokens)::BIGINT AS cum_check
       |FROM c WHERE cum_tokens <= 3000
       |GROUP BY lang ORDER BY lang""".stripMargin

  val tokenBudgetBpeSql: String = {
    val chain = Fragments.bpeWordSql()
    val subwords =
      s"""coalesce(list_sum([len(string_split($chain, '${Fragments.BpeSep}'))
         |      for w in ${Fragments.BpeWordsSql}]), 0)::BIGINT""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, lang, $subwords AS n_tokens,
       |         ${Fragments.qualitySql} AS q
       |  FROM documents),
       |c AS (
       |  SELECT lang, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY q DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM d)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |       sum(n_tokens)::BIGINT AS tokens_used,
       |       max(cum_tokens)::BIGINT AS cum_check
       |FROM c WHERE cum_tokens <= 3000
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // -------------------------------------------------------------- q171

  /** Duplicate-cluster canonical pick: order-invariant duplicate groups
    * (md5 of the SORTED DISTINCT token set — bag-of-words identity, one
    * notch coarser than q30's exact normalized-text fingerprint) keep
    * their HIGHEST-QUALITY member (rounded score, smallest doc id on
    * ties) — the representative-selection step after dedup discovery,
    * where q59's capstone keeps min-id this picks best-quality. One
    * keyed window over the fingerprint; only groups with >1 member are
    * reported. Sort parity: Spark `array_sort` and DuckDB `list_sort`
    * both order ASCII tokens bytewise. */
  val clusterCanonical: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.bagFingerprint(col("text")).as("fp"),
        TextOps.qualityScore(col("text")).as("q"))
    val w = Window.partitionBy("fp").orderBy(col("q").desc, col("doc_id").asc)
    docs.withColumn("pick", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("pick") === 1 && col("n_members") > 1)
      .select(col("fp"), col("doc_id").as("keeper"), col("q").as("keeper_q"),
        col("n_members"))
      .orderBy("fp")
  }

  val clusterCanonicalSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${Fragments.BagFpSql} AS fp,
       |    ${Fragments.qualitySql} AS q
       |  FROM documents),
       |r AS (
       |  SELECT fp, doc_id, q,
       |    row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id ASC)
       |      AS pick,
       |    count(*) OVER (PARTITION BY fp) AS n_members
       |  FROM d)
       |SELECT fp, doc_id AS keeper, q AS keeper_q, n_members::BIGINT AS n_members
       |FROM r WHERE pick = 1 AND n_members > 1
       |ORDER BY fp""".stripMargin

  // -------------------------------------------------------------- q173

  /** Deterministic shard assignment for training export: every doc maps
    * to shard `md5(id ∥ "shard") mod 16` — a pure function of the id,
    * so any re-run (or any engine) produces the identical sharding with
    * no RNG and no global sort. The report is the per-shard manifest an
    * export writes next to the data: doc count, token total, source
    * spread, id range. At 100 TB the same expression feeds
    * `repartition(col("shard"))` + `partitionBy("shard")` on the write
    * path — one keyed exchange, and the hash spreads hot sources evenly
    * across shards by construction (the manifest's n_docs column is the
    * skew check). */
  val shardExport: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(
        Fragments.hashBucket(
          concat(col("doc_id").cast("string"), lit("shard")), 16).as("shard"),
        col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        countDistinct("source").as("n_sources"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("shard")

  val shardExportSql: String =
    s"""WITH d AS (
       |  SELECT ${Fragments.hashBucketSql("doc_id::VARCHAR || 'shard'", 16)}
       |      AS shard,
       |    source, doc_id, len($ToksSql)::BIGINT AS n_tokens
       |  FROM documents)
       |SELECT shard, count(*)::BIGINT AS n_docs,
       |  sum(n_tokens)::BIGINT AS n_tokens,
       |  count(DISTINCT source)::BIGINT AS n_sources,
       |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM d GROUP BY shard ORDER BY shard""".stripMargin

  // -------------------------------------------------------------- q175

  /** Deterministic hash-Bernoulli downsampling: keep a doc iff
    * `md5(id ∥ "samp") mod 1000` falls under the source tier's rate
    * (50% for the five high-value sources, 10% for the rest) — the
    * seeded-subsample op every corpus ablation needs, with the hash as
    * the seed so membership is reproducible at any scale and on any
    * engine. Unlike q169's exact-quota rebalance (per-source window
    * rank), this is rate-based and entirely MAP-SIDE: no window, no
    * per-source exchange — the only shuffle is the final report's
    * group-by, so at 100 TB the sample materializes at scan speed. */
  val hashSample: Q = (s, dir) => {
    val keep = Fragments.hashBucket(
      concat(col("doc_id").cast("string"), lit("samp")), 1000) <
      when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 500)
        .otherwise(100)
    Tables.t(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(keep.cast("long")).as("n_kept"))
      .orderBy("source")
  }

  val hashSampleSql: String =
    s"""SELECT source, count(*)::BIGINT AS n_docs,
       |  sum((${Fragments.hashBucketSql("doc_id::VARCHAR || 'samp'", 1000)} <
       |       CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4')
       |            THEN 500 ELSE 100 END)::BIGINT)::BIGINT AS n_kept
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q180

  /** WEIGHTED sampling without replacement, 5 docs per source, where a
    * doc's selection priority is proportional to its token count —
    * Duffield–Lund–Thorup priority sampling: priority = w/u for a
    * uniform u, keep the k LARGEST per stratum. The uniform is derived
    * from md5(doc_id) as (bucket + ½)/10⁶, so the whole key reduces to
    * ONE double division of exact integers,
    * 2·10⁶·w / (2·bucket + 1) — and IEEE division is correctly
    * rounded, so the key is bit-identical in every engine (the reason
    * this is priority sampling and not Efraimidis–Spirakis −ln(u)/w:
    * ln is only within-1-ulp, the q73 libm lesson). Complements q175
    * (rate Bernoulli, unweighted) and q76 (per-stratum rank,
    * unweighted): this is the "sample long documents preferentially
    * under a fixed per-domain budget" op a token-weighted training mix
    * needs.
    *
    * Scale shape: key computation is map-side; the only shuffle is the
    * per-source window, and rank ≤ 5 plans as WindowGroupLimit so each
    * partition retains 5 rows before the exchange. */
  val weightedSample: Q = (s, dir) => {
    val oddHash = Fragments.hashBucket(
      concat(col("doc_id").cast("string"), lit("wsamp")), 1000000)
      .cast("double") * 2.0 + 1.0
    val w = Window.partitionBy("source")
      .orderBy(col("priority").desc, col("doc_id"))
    Tables.t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("double").as("n_tok"),
        oddHash.as("oh"))
      .where(col("n_tok") > 0)
      .withColumn("priority", lit(2000000.0) * col("n_tok") / col("oh"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("source"), col("doc_id"),
        round(col("priority"), 6).as("priority"))
      .orderBy(col("source"), col("priority").desc, col("doc_id"))
  }

  val weightedSampleSql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id, len($ToksSql)::DOUBLE AS n_tok,
       |    ${Fragments.hashBucketSql("doc_id::VARCHAR || 'wsamp'", 1000000)}::DOUBLE
       |      * 2.0 + 1.0 AS oh
       |  FROM documents),
       |k AS (SELECT source, doc_id, 2000000.0 * n_tok / oh AS priority
       |      FROM d WHERE n_tok > 0),
       |r AS (SELECT source, doc_id, priority,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY priority DESC, doc_id) AS rn
       |      FROM k)
       |SELECT source, doc_id, round(priority, 6) AS priority
       |FROM r WHERE rn <= 5
       |ORDER BY source, priority DESC, doc_id""".stripMargin

  // -------------------------------------------------------------- q187

  /** Paragraph-level exact dedup with document reassembly (the
    * RefinedWeb/CCNet line-dedup shape): each document splits into
    * non-overlapping 32-token paragraphs (the q108 chunker at stride =
    * width — the stand-in for a newline splitter on this corpus), a
    * paragraph instance survives only if it is the corpus-wide FIRST
    * occurrence of its fingerprint (min (doc_id, par_idx)), and each
    * document reassembles from its surviving paragraphs in order. The
    * output carries md5(kept paragraph fps in order) as the reassembled
    * document's fingerprint, so no stage ever shuffles paragraph text.
    *
    * Scale shape: the paragraph explode is map-side; first-occurrence
    * ranking is ONE window exchange keyed on the paragraph fingerprint
    * carrying (fp, doc_id, par_idx) triples; reassembly is ONE keyed
    * exchange on doc_id. Linear at 100 TB — the cross-document dedup
    * never compares documents, only fingerprint-equal paragraphs. */
  val paragraphDedup: Q = (s, dir) => {
    val par = Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(32))).as("st"))
      .select(col("doc_id"), (col("st") / 32).cast("int").as("par_idx"),
        md5(concat_ws(" ", slice(col("toks"), col("st") + 1, lit(32)))).as("fp"))
    val w = Window.partitionBy("fp").orderBy("doc_id", "par_idx")
    par.withColumn("kept", row_number().over(w) === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_pars"),
        sum(col("kept").cast("int")).cast("int").as("n_kept"),
        round(sum(col("kept").cast("int")).cast("double") / count(lit(1)), 4)
          .as("kept_frac"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("par_idx").as("i"), col("fp").as("f"))))),
          x => x.getField("f")))).as("kept_fp"))
      .orderBy("doc_id")
  }

  val paragraphDedupSql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |p AS (
       |  SELECT doc_id, (st // 32)::INT AS par_idx,
       |    md5(array_to_string(toks[st+1:st+32], ' ')) AS fp
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(0, greatest(len(toks), 1), 32)) AS st FROM t)),
       |k AS (
       |  SELECT doc_id, par_idx, fp,
       |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, par_idx) = 1
       |      AS kept
       |  FROM p)
       |SELECT doc_id, count(*)::INT AS n_pars,
       |  sum(kept::INT)::INT AS n_kept,
       |  round(sum(kept::INT)::DOUBLE / count(*), 4) AS kept_frac,
       |  md5(coalesce(string_agg(fp, ' ' ORDER BY par_idx)
       |        FILTER (WHERE kept), '')) AS kept_fp
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- registry

  // -------------------------------------------------------------- q222

  /** Cross-source quantile normalization (q222): each document's length
    * is re-expressed as the GLOBAL length at the same quantile its
    * length occupies WITHIN its source — the rank-based distribution
    * alignment used to make per-source quality/length scores comparable
    * before mixing (the bioinformatics quantile-normalization recipe
    * applied to corpus curation). Mechanics: percent_rank inside each
    * source (a source-keyed window — distributes on the natural key),
    * mapped to a global rank index, resolved against a cumulative
    * reference table of DISTINCT lengths (bounded domain — hundreds of
    * rows regardless of corpus size) via a broadcast interval join, so
    * the only global-ordering structure lives on the tiny distinct-value
    * table, never on the corpus. percent_rank is (rank−1)/(n−1) in both
    * engines — one exact-integer division — and the rank index is one
    * IEEE multiply + round on that, so the mapping is bit-identical. */
  val quantileNormalize: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
      .select("doc_id", "source", "n_chars")
    // the reference table is checkpointed (bounded distinct-value
    // domain) and the grand total derives from IT, so the corpus scan
    // runs once for the reference and once for the row pass — not three
    // times
    val ref = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
      .withColumn("hi", sum("cnt").over(Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("n_chars").as("v"), (col("hi") - col("cnt") + 1).as("lo"),
        col("hi"))
      .localCheckpoint(true)
    val tot = ref.agg(sum(col("hi") - col("lo") + 1).as("nn"))
    docs
      .withColumn("pr", percent_rank().over(
        Window.partitionBy("source").orderBy("n_chars", "doc_id")))
      .crossJoin(broadcast(tot))
      .withColumn("idx",
        round(col("pr") * (col("nn") - 1).cast("double")).cast("long") + 1)
      .join(broadcast(ref),
        col("idx") >= col("lo") && col("idx") <= col("hi"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("v").as("norm_chars"))
      .transform(graft.Presentation.sort(_, "doc_id"))
  }

  val quantileNormalizeSql: String =
    """WITH t AS (SELECT count(*)::BIGINT AS nn FROM documents),
      |ref AS (
      |  SELECT n_chars AS v, count(*)::BIGINT AS cnt,
      |    sum(count(*)) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS hi
      |  FROM documents GROUP BY 1),
      |ref2 AS (SELECT v, hi - cnt + 1 AS lo, hi FROM ref),
      |p AS (
      |  SELECT doc_id, source, n_chars,
      |    percent_rank() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS pr
      |  FROM documents)
      |SELECT p.doc_id, p.source, p.n_chars, r.v AS norm_chars
      |FROM p CROSS JOIN t JOIN ref2 r
      |  ON (round(p.pr * (t.nn - 1)::DOUBLE)::BIGINT + 1) BETWEEN r.lo AND r.hi
      |ORDER BY p.doc_id""".stripMargin

  // -------------------------------------------------------------- q225

  /** Per-source Gini coefficient (q225): how unequally is text volume
    * distributed across a source's documents? (A source where one doc
    * carries half the characters mixes differently from a uniform one —
    * the inequality lens on the q169/q192 mixing family.) Uses the
    * rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    * within-source ascending sort: every term is an exact BIGINT from
    * one source-keyed window + one aggregate (two source-keyed
    * shuffles, no global structure), and the single division is the
    * only float op. */
  val giniBySource: Q = (s, dir) => {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    Tables.t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sx"),
        sum(col("i") * col("n_chars")).as("six"))
      .filter(col("sx") > 0)
      .select(col("source"), col("n"),
        round((lit(2) * col("six") - (col("n") + 1) * col("sx"))
          .cast("double") / (col("n") * col("sx")).cast("double"), 6)
          .as("gini"))
      .orderBy("source")
  }

  val giniBySourceSql: String =
    """WITH r AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id)::BIGINT AS i
      |  FROM documents),
      |m AS (
      |  SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sx,
      |    sum(i * n_chars)::BIGINT AS six
      |  FROM r GROUP BY 1)
      |SELECT source, n,
      |  round((2 * six - (n + 1) * sx)::DOUBLE / ((n * sx)::DOUBLE), 6)
      |    AS gini
      |FROM m WHERE sx > 0 ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q226

  /** Per-source winsorization (q226): clip document lengths at the
    * source's nearest-rank p10/p90 — the outlier-taming step before
    * the q91 standardization family. The percentile is the pure-integer
    * nearest-rank definition k = ⌈p·n⌉ (k₁₀ = (n+9) DIV 10, k₉₀ =
    * (9n+9) DIV 10): no interpolation, no floats anywhere. One
    * source-keyed rank window, a 2-value-per-source conditional
    * aggregate, and a broadcast join back — row-level output at scan
    * cost with a single shuffle on the source key. */
  val winsorize: Q = (s, dir) => {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val ranked = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
    val bounds = ranked.groupBy("source")
      .agg(max(when(col("rnk") === expr("(n + 9) DIV 10"), col("n_chars")))
        .as("lo_v"),
        max(when(col("rnk") === expr("(n * 9 + 9) DIV 10"), col("n_chars")))
          .as("hi_v"))
    ranked.join(broadcast(bounds), "source")
      .select(col("doc_id"), col("source"), col("n_chars"),
        least(greatest(col("n_chars"), col("lo_v")), col("hi_v"))
          .as("clipped"))
      .transform(graft.Presentation.sort(_, "doc_id"))
  }

  val winsorizeSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id)::BIGINT AS rnk,
      |    count(*) OVER (PARTITION BY source)::BIGINT AS n
      |  FROM documents),
      |bounds AS (
      |  SELECT source,
      |    max(CASE WHEN rnk = (n + 9) // 10 THEN n_chars END) AS lo_v,
      |    max(CASE WHEN rnk = (n * 9 + 9) // 10 THEN n_chars END) AS hi_v
      |  FROM ranked GROUP BY 1)
      |SELECT r.doc_id, r.source, r.n_chars,
      |  least(greatest(r.n_chars, b.lo_v), b.hi_v) AS clipped
      |FROM ranked r JOIN bounds b USING (source)
      |ORDER BY r.doc_id""".stripMargin

  // -------------------------------------------------------------- q227

  /** Spearman rank correlation (q227): per (returnflag) group, the
    * rank correlation between quantity and extended price — the
    * monotone-association complement of q217's linear OLS (Spearman is
    * Pearson on average ranks, so it survives the nonlinearity and
    * outliers OLS is blind to). Tie-averaged ranks are carried DOUBLED
    * (2·avgrank = 2·minrank + ties − 1, an exact BIGINT from a rank
    * window + a tie-count window, both on the group key), so all five
    * moment sums are exact integers and ρ is one fixed IEEE expression
    * over their double conversions (q217's discipline; sqrt is
    * correctly-rounded, `pow` stays banned). Window + aggregate on the
    * same group key — one shuffle of the data at any scale. */
  val spearmanGroup: Q = (s, dir) => {
    val base = Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
    // One data-scale pass: the (group, x, y) count cube (bounded by the
    // two value domains) carries everything downstream. Doubled
    // tie-averaged ranks 2·avg = 2·hi − ties + 1 come from per-group
    // cumulative counts over each value spine (tiny windows over the
    // cube, never over rows — a rank window partitioned by 3 groups
    // would serialize the corpus onto 3 tasks), and the moment sums run
    // over the cube weighted by cell count. Rank products are O(n³)
    // magnitudes, so they accumulate in DECIMAL(38,0) (DuckDB: HUGEINT)
    // — exact far past BIGINT's ~1.3M-rows-per-group ceiling.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // eager localCheckpoint (the graph-family discipline): the cube is
    // consumed three times (both rank spines + the moment pass) and
    // would otherwise re-run the corpus scan + aggregate per consumer
    val pairCnt = base.groupBy("l_returnflag", "x", "y")
      .agg(count(lit(1)).as("pc"))
      .localCheckpoint(true)
    def rankTbl(c: String): org.apache.spark.sql.DataFrame =
      pairCnt.groupBy(col("l_returnflag"), col(c).as("v"))
        .agg(sum("pc").as("cnt"))
        .withColumn("hi", sum("cnt").over(
          Window.partitionBy("l_returnflag").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("l_returnflag"), col("v"),
          (lit(2) * col("hi") - col("cnt") + 1).as(s"r_$c"))
    // x-spine (≤ |quantity domain|·groups rows) broadcasts; the y-spine
    // scales with the price domain, so it joins shuffle-hash — hashing
    // two cube-sized sides beats single-threading a quarter-million-row
    // broadcast build on the driver
    val ranked = pairCnt
      .join(broadcast(rankTbl("x")).withColumnRenamed("v", "x"),
        Seq("l_returnflag", "x"))
      .join(rankTbl("y").withColumnRenamed("v", "y").hint("shuffle_hash"),
        Seq("l_returnflag", "y"))
      .select(col("l_returnflag"), col("pc"),
        col("r_x").as("rx"), col("r_y").as("ry"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double"); val syd = col("sy").cast("double")
    ranked.groupBy("l_returnflag")
      .agg(sum("pc").as("n"),
        sum(col("pc").cast(dec) * col("rx")).as("sx"),
        sum(col("pc").cast(dec) * col("ry")).as("sy"),
        sum(col("pc").cast(dec) * col("rx") * col("rx")).as("sxx"),
        sum(col("pc").cast(dec) * col("rx") * col("ry")).as("sxy"),
        sum(col("pc").cast(dec) * col("ry") * col("ry")).as("syy"))
      .withColumn("num", nd * col("sxy").cast("double") - sxd * syd)
      .withColumn("den_x", nd * col("sxx").cast("double") - sxd * sxd)
      .withColumn("den_y", nd * col("syy").cast("double") - syd * syd)
      .filter(col("den_x") > 0 && col("den_y") > 0)
      .select(col("l_returnflag"), col("n"),
        round(col("num") / (sqrt(col("den_x")) * sqrt(col("den_y"))), 6)
          .as("rho"))
      .orderBy("l_returnflag")
  }

  val spearmanGroupSql: String =
    """WITH base AS (
      |  SELECT l_returnflag, l_quantity::BIGINT AS x,
      |    round(l_extendedprice)::BIGINT AS y FROM lineitem),
      |pc AS (
      |  SELECT l_returnflag, x, y, count(*)::BIGINT AS pc
      |  FROM base GROUP BY 1, 2, 3),
      |xt AS (
      |  SELECT l_returnflag, v, 2 * hi - cnt + 1 AS r FROM (
      |    SELECT l_returnflag, x AS v, sum(pc)::BIGINT AS cnt,
      |      sum(sum(pc)) OVER (PARTITION BY l_returnflag ORDER BY x
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |        AS hi
      |    FROM pc GROUP BY 1, 2) s),
      |yt AS (
      |  SELECT l_returnflag, v, 2 * hi - cnt + 1 AS r FROM (
      |    SELECT l_returnflag, y AS v, sum(pc)::BIGINT AS cnt,
      |      sum(sum(pc)) OVER (PARTITION BY l_returnflag ORDER BY y
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |        AS hi
      |    FROM pc GROUP BY 1, 2) s),
      |m AS (
      |  SELECT p.l_returnflag, sum(p.pc)::BIGINT AS n,
      |    sum(p.pc::HUGEINT * xt.r) AS sx, sum(p.pc::HUGEINT * yt.r) AS sy,
      |    sum(p.pc::HUGEINT * xt.r * xt.r) AS sxx,
      |    sum(p.pc::HUGEINT * xt.r * yt.r) AS sxy,
      |    sum(p.pc::HUGEINT * yt.r * yt.r) AS syy
      |  FROM pc p
      |  JOIN xt ON xt.l_returnflag = p.l_returnflag AND xt.v = p.x
      |  JOIN yt ON yt.l_returnflag = p.l_returnflag AND yt.v = p.y
      |  GROUP BY 1),
      |d AS (
      |  SELECT *,
      |    n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
      |    n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS den_x,
      |    n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS den_y
      |  FROM m)
      |SELECT l_returnflag, n,
      |  round(num / (sqrt(den_x) * sqrt(den_y)), 6) AS rho
      |FROM d WHERE den_x > 0 AND den_y > 0
      |ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------- q234

  /** Per-source trimmed mean (q234): the mean of document lengths after
    * discarding the bottom and top 10% BY RANK (k = n DIV 10 rows off
    * each end) next to the plain mean — the estimator q226 clips toward
    * (winsorize keeps mass at the fence; trimming removes it). Pure
    * integers: rank window on the source key, kept-range filter, exact
    * BIGINT sums; each mean is one division + round. One keyed window +
    * one aggregate — two source-keyed shuffles at any scale. */
  val trimmedMean: Q = (s, dir) => {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("k", expr("n DIV 10"))
      .groupBy("source")
      .agg(max("n").as("n"), sum("n_chars").as("s_all"),
        sum(when(col("rnk") > col("k") && col("rnk") <= col("n") - col("k"),
          col("n_chars")).otherwise(0L)).as("s_trim"),
        sum(when(col("rnk") > col("k") && col("rnk") <= col("n") - col("k"),
          1L).otherwise(0L)).as("n_trim"))
      .filter(col("n_trim") > 0)
      .select(col("source"), col("n"), col("n_trim"),
        round(col("s_all").cast("double") / col("n").cast("double"), 4)
          .as("mean_all"),
        round(col("s_trim").cast("double") / col("n_trim").cast("double"), 4)
          .as("mean_trimmed"))
      .orderBy("source")
  }

  val trimmedMeanSql: String =
    """WITH r AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id)::BIGINT AS rnk,
      |    count(*) OVER (PARTITION BY source)::BIGINT AS n
      |  FROM documents),
      |m AS (
      |  SELECT source, max(n)::BIGINT AS n, sum(n_chars)::BIGINT AS s_all,
      |    sum(CASE WHEN rnk > n // 10 AND rnk <= n - n // 10
      |             THEN n_chars ELSE 0 END)::BIGINT AS s_trim,
      |    sum(CASE WHEN rnk > n // 10 AND rnk <= n - n // 10
      |             THEN 1 ELSE 0 END)::BIGINT AS n_trim
      |  FROM r GROUP BY 1)
      |SELECT source, n, n_trim,
      |  round(s_all::DOUBLE / n::DOUBLE, 4) AS mean_all,
      |  round(s_trim::DOUBLE / n_trim::DOUBLE, 4) AS mean_trimmed
      |FROM m WHERE n_trim > 0 ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q243

  /** Deterministic bottom-k evaluation sample (q243): exactly k=10 docs
    * per source, chosen as the k smallest md5 priorities — the
    * fixed-size-per-stratum complement of q175's threshold hash sample
    * (threshold → fixed RATE, bottom-k → fixed COUNT; both are pure
    * functions of the ids, so any engine / any rerun / any scale draws
    * the same sample, and a grown corpus only ever replaces samples
    * with lower-priority newcomers — the classic consistent bottom-k
    * property). Plans as WindowGroupLimit on the source key: each task
    * pre-prunes to its local k before the shuffle. */
  val bottomKSample: Q = (s, dir) => {
    val w = Window.partitionBy("source")
      .orderBy(col("pri"), col("doc_id"))
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        Fragments.hashBucket(col("doc_id").cast("string"), 1000000)
          .as("pri"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("source"), col("pri"), col("rk"))
      .orderBy("source", "rk")
  }

  val bottomKSampleSql: String =
    s"""SELECT doc_id, source, pri, rk FROM (
       |  SELECT doc_id, source,
       |    ${Fragments.hashBucketSql("doc_id::VARCHAR", 1000000)} AS pri,
       |    (row_number() OVER (PARTITION BY source
       |      ORDER BY ${Fragments.hashBucketSql("doc_id::VARCHAR", 1000000)},
       |               doc_id))::INTEGER AS rk
       |  FROM documents) r
       |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  // -------------------------------------------------------------- q247

  /** Exact water-filling allocation (q247): split a token budget (half
    * the corpus) across sources toward a UNIFORM target, capped by each
    * source's availability — small sources contribute everything they
    * have (saturated), the rest fill to a common level λ. The optimal-
    * allocation step q169/q192's proportional mixes skip. Entirely
    * integer: sources sort ascending by capacity (a window over the
    * per-source table — bounded, the value-spine pattern), saturation is
    * the cross-multiplied prefix test cᵢ·(n−i) ≤ B−cumᵢ, λ is carried
    * as an exact (numerator, denominator) pair, and the division
    * remainder goes to the lexicographically-first unsaturated sources
    * (largest-remainder rounding) so Σalloc = B EXACTLY — the spec
    * asserts the invariant, the oracle replays every step. */
  val waterfill: Q = (s, dir) => {
    val caps = Tables.t(s, dir, "documents")
      .select(col("source"), TextOps.tokens(col("text")).as("toks"))
      .select(col("source"), size(col("toks")).cast("long").as("tk"))
      .groupBy("source").agg(sum("tk").as("cap"))
      .localCheckpoint(true)
    val tot = caps.agg(sum("cap").as("ct"), count(lit(1)).as("n"))
    val ranked = caps.crossJoin(broadcast(tot))
      .withColumn("b", expr("ct DIV 2"))
      .withColumn("rn", row_number().over(
        Window.orderBy("cap", "source")).cast("long"))
      .withColumn("cum", sum("cap").over(Window.orderBy("cap", "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sat",
        col("cap") * (col("n") - col("rn")) <= col("b") - col("cum"))
      .localCheckpoint(true)
    val lam = ranked.agg(
      sum(when(col("sat"), 1L).otherwise(0L)).as("k"),
      coalesce(max(when(col("sat"), col("cum"))), lit(0L)).as("cum_k"),
      max("b").as("b"), max("n").as("n"))
      .select(col("k"), (col("b") - col("cum_k")).as("lam_n"),
        (col("n") - col("k")).as("lam_d"))
    val w2 = Window.orderBy("source")
    ranked.crossJoin(broadcast(lam))
      .withColumn("rn2",
        sum(when(!col("sat"), 1L).otherwise(0L)).over(
          w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("alloc",
        when(col("sat"), col("cap")).otherwise(
          expr("lam_n DIV lam_d") +
            when(col("rn2") <= expr("lam_n % lam_d"), 1L).otherwise(0L)))
      .select(col("source"), col("cap"), col("alloc"), col("sat"))
      .orderBy("source")
  }

  val waterfillSql: String =
    s"""WITH caps AS (
       |  SELECT source, sum(len($ToksSql))::BIGINT AS cap
       |  FROM documents GROUP BY 1),
       |tot AS (
       |  SELECT sum(cap)::BIGINT AS ct, count(*)::BIGINT AS n FROM caps),
       |ranked AS (
       |  SELECT source, cap, ct // 2 AS b, n,
       |    row_number() OVER (ORDER BY cap, source)::BIGINT AS rn,
       |    sum(cap) OVER (ORDER BY cap, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
       |      AS cum
       |  FROM caps CROSS JOIN tot),
       |r2 AS (
       |  SELECT *, cap * (n - rn) <= b - cum AS sat FROM ranked),
       |lam AS (
       |  SELECT sum(CASE WHEN sat THEN 1 ELSE 0 END)::BIGINT AS k,
       |    (max(b) - coalesce(max(CASE WHEN sat THEN cum END), 0))::BIGINT
       |      AS lam_n,
       |    (max(n) - sum(CASE WHEN sat THEN 1 ELSE 0 END))::BIGINT AS lam_d
       |  FROM r2),
       |r3 AS (
       |  SELECT r2.*, lam.lam_n, lam.lam_d,
       |    sum(CASE WHEN NOT sat THEN 1 ELSE 0 END) OVER (ORDER BY source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
       |      AS rn2
       |  FROM r2 CROSS JOIN lam)
       |SELECT source, cap,
       |  CASE WHEN sat THEN cap
       |       ELSE lam_n // lam_d +
       |         (CASE WHEN rn2 <= lam_n % lam_d THEN 1 ELSE 0 END)
       |  END::BIGINT AS alloc, sat
       |FROM r3 ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q248

  /** Effective-unique token budget (q248): per source, raw token count
    * vs the count surviving exact deduplication (tokens attributed only
    * to each duplicate cluster's representative — min doc_id per
    * normalized-text fingerprint, q30's rule) and the inflation ratio —
    * "how much data do I ACTUALLY have?", the honest denominator for
    * every budget the q170/q206/q247 family allocates. One fingerprint
    * aggregate (map-side md5), a representative semi-join, two keyed
    * sums — the q30 dedup shape with a budget rollup on top. */
  val effectiveTokens: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("tk"),
        md5(TextOps.normalized(col("text"))).as("fp"))
      .localCheckpoint(true)
    val reps = docs.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val uniq = docs.join(reps, Seq("fp", "doc_id"), "left_semi")
      .groupBy("source").agg(sum("tk").as("unique_tokens"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tk").as("raw_tokens"))
      .join(uniq, "source")
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("unique_tokens"),
        round(col("raw_tokens").cast("double") /
          col("unique_tokens").cast("double"), 4).as("inflation"))
      .orderBy("source")
  }

  val effectiveTokensSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source, len($ToksSql)::BIGINT AS tk,
       |    md5($NormSql) AS fp
       |  FROM documents),
       |reps AS (SELECT fp, min(doc_id) AS doc_id FROM docs GROUP BY 1),
       |uniq AS (
       |  SELECT d.source, sum(d.tk)::BIGINT AS unique_tokens
       |  FROM docs d SEMI JOIN reps r
       |    ON d.fp = r.fp AND d.doc_id = r.doc_id
       |  GROUP BY 1),
       |raw AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(tk)::BIGINT AS raw_tokens
       |  FROM docs GROUP BY 1)
       |SELECT raw.source AS source, n_docs, raw_tokens, unique_tokens,
       |  round(raw_tokens::DOUBLE / unique_tokens::DOUBLE, 4) AS inflation
       |FROM raw JOIN uniq ON uniq.source = raw.source
       |ORDER BY raw.source""".stripMargin

  // -------------------------------------------------------------- q249

  /** Split-leakage audit (q249): does any exact-duplicate content
    * straddle the q71 train/val/test boundary? For each ordered split
    * pair, the number of distinct fingerprints present on BOTH sides
    * and the leaked-doc count on the target side — the governance check
    * that a deterministic doc-id split does NOT guarantee content
    * disjointness when duplicates exist (the reason q87's decontam
    * exists). Fingerprint-keyed joins of two bounded per-split
    * fingerprint tables. */
  val splitLeakage: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"), md5(TextOps.normalized(col("text"))).as("fp"),
        when(Fragments.splitBucket(col("doc_id")) < 80, "train")
          .when(Fragments.splitBucket(col("doc_id")) < 90, "val")
          .otherwise("test").as("split"))
      .localCheckpoint(true)
    // IterFrame keyed on fp (round-11 sweep): the distinct fingerprint
    // table feeds its own self-join AND the per-doc leakage join, both
    // fp-keyed
    val fps = graft.common.IterFrame.keyed(
      docs.select("split", "fp").distinct(), col("fp"))
    val leakedFp = fps.as("a").join(fps.as("b"), "fp")
      .filter(col("a.split") < col("b.split"))
      .groupBy(col("a.split").as("split_a"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
    val leakedDocs = docs.as("d")
      .join(fps.as("o"), col("d.fp") === col("o.fp") &&
        col("d.split") < col("o.split"))
      .groupBy(col("d.split").as("split_a"), col("o.split").as("split_b"))
      .agg(countDistinct(col("d.doc_id")).as("n_leaked_docs"))
    // seed the full ordered-pair grid so a leak-free corpus reports
    // three explicit zero rows instead of an empty result
    import s.implicits._
    val grid = Seq(("test", "train"), ("test", "val"), ("train", "val"))
      .toDF("split_a", "split_b")
    grid.join(leakedFp, Seq("split_a", "split_b"), "left")
      .join(leakedDocs, Seq("split_a", "split_b"), "left")
      .na.fill(0L, Seq("n_shared_fp", "n_leaked_docs"))
      .orderBy("split_a", "split_b")
  }

  val splitLeakageSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, md5($NormSql) AS fp,
       |    CASE WHEN ${Fragments.BucketSql} < 80 THEN 'train'
       |         WHEN ${Fragments.BucketSql} < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |fps AS (SELECT DISTINCT split, fp FROM docs),
       |sh AS (
       |  SELECT a.split AS split_a, b.split AS split_b,
       |    count(*)::BIGINT AS n_shared_fp
       |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.split < b.split
       |  GROUP BY 1, 2),
       |ld AS (
       |  SELECT d.split AS split_a, o.split AS split_b,
       |    count(DISTINCT d.doc_id)::BIGINT AS n_leaked_docs
       |  FROM docs d JOIN fps o ON d.fp = o.fp AND d.split < o.split
       |  GROUP BY 1, 2)
       |SELECT g.split_a, g.split_b,
       |  coalesce(n_shared_fp, 0)::BIGINT AS n_shared_fp,
       |  coalesce(n_leaked_docs, 0)::BIGINT AS n_leaked_docs
       |FROM (VALUES ('test', 'train'), ('test', 'val'), ('train', 'val'))
       |  g(split_a, split_b)
       |LEFT JOIN sh ON sh.split_a = g.split_a AND sh.split_b = g.split_b
       |LEFT JOIN ld ON ld.split_a = g.split_a AND ld.split_b = g.split_b
       |ORDER BY g.split_a, g.split_b""".stripMargin

  // -------------------------------------------------------------- q250

  /** Joint 2-D histogram (q250): document count over length-quartile ×
    * quality-tercile cells — the heatmap behind "are short docs the
    * low-quality ones?". Both cut vectors come from nearest-rank
    * spines over DISTINCT values (the q228 integer recipe; quality here
    * is the exact integer stopword-free ratio in basis points so its
    * spine is bounded too), buckets are pure integer comparisons
    * against a broadcast 1-row cut frame, and the output is the ≤12
    * cell counts. */
  val jointHistogram: Q = (s, dir) => {
    val base = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").as("len"),
        size(TextOps.tokens(col("text"))).cast("long").as("tk"),
        size(filter(TextOps.tokens(col("text")),
          t => t.isin("the", "a", "of", "and", "to"))).cast("long")
          .as("sw"))
      .select(col("doc_id"), col("len"),
        when(col("tk") > 0,
          expr("((tk - sw) * 10000) DIV tk")).otherwise(0L).as("q_bp"))
      .localCheckpoint(true)
    def cuts(c: String, parts: Int): org.apache.spark.sql.DataFrame = {
      val spine = base.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
      val exprs = (1 until parts).map { q =>
        min(when(col("cum") >=
          expr(s"($q * n + ${parts - 1}) DIV $parts"), col("v")))
          .as(s"${c}$q")
      }
      spine.agg(exprs.head, exprs.tail: _*)
    }
    base
      .crossJoin(broadcast(cuts("len", 4)))
      .crossJoin(broadcast(cuts("q_bp", 3)))
      .select(col("doc_id"),
        (lit(1) + when(col("len") > col("len1"), 1).otherwise(0) +
          when(col("len") > col("len2"), 1).otherwise(0) +
          when(col("len") > col("len3"), 1).otherwise(0)).as("len_q"),
        (lit(1) + when(col("q_bp") > col("q_bp1"), 1).otherwise(0) +
          when(col("q_bp") > col("q_bp2"), 1).otherwise(0)).as("qual_t"))
      .groupBy("len_q", "qual_t")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("len_q", "qual_t")
  }

  val jointHistogramSql: String = {
    def cutsSql(c: String, parts: Int, out: String): String = {
      val mins = (1 until parts).map { q =>
        s"min(CASE WHEN cum >= ($q * n + ${parts - 1}) // $parts THEN v END) AS ${c}$q"
      }.mkString(",\n         |    ")
      s"""$out AS (
         |  SELECT
         |    $mins
         |  FROM (
         |    SELECT $c AS v,
         |      sum(count(*)) OVER (ORDER BY $c
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |        AS cum
         |    FROM base GROUP BY $c) sp
         |  CROSS JOIN (SELECT count(*)::BIGINT AS n FROM base) t)""".stripMargin
    }
    s"""WITH base AS (
       |  SELECT doc_id, n_chars AS len,
       |    CASE WHEN len($ToksSql) > 0
       |         THEN ((len($ToksSql) -
       |           len([x for x in $ToksSql
       |                IF list_contains(['the','a','of','and','to'], x)]))
       |           * 10000) // len($ToksSql)
       |         ELSE 0 END::BIGINT AS q_bp
       |  FROM documents),
       |${cutsSql("len", 4, "lc")},
       |${cutsSql("q_bp", 3, "qc")}
       |SELECT
       |  (1 + (CASE WHEN len > len1 THEN 1 ELSE 0 END) +
       |       (CASE WHEN len > len2 THEN 1 ELSE 0 END) +
       |       (CASE WHEN len > len3 THEN 1 ELSE 0 END)) AS len_q,
       |  (1 + (CASE WHEN q_bp > q_bp1 THEN 1 ELSE 0 END) +
       |       (CASE WHEN q_bp > q_bp2 THEN 1 ELSE 0 END)) AS qual_t,
       |  count(*)::BIGINT AS n_docs
       |FROM base CROSS JOIN lc CROSS JOIN qc
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q222_quantile_norm" -> quantileNormalize,
    "q248_effective_tokens" -> effectiveTokens,
    "q249_split_leakage" -> splitLeakage,
    "q250_joint_histogram" -> jointHistogram,
    "q247_waterfill" -> waterfill,
    "q243_bottomk_sample" -> bottomKSample,
    "q225_gini_source" -> giniBySource,
    "q226_winsorize" -> winsorize,
    "q227_spearman" -> spearmanGroup,
    "q234_trimmed_mean" -> trimmedMean,
    "q87_decontam_ngram" -> decontam,
    "q88_cohort_retention" -> cohortRetention,
    "q89_window_range_frame" -> rangeFrameHour,
    "q90_ntile_deciles" -> ntileDeciles,
    "q91_incremental_agg" -> incrementalAgg,
    "q92_url_canonical" -> urlCanonical,
    "q93_zscore_norm" -> zscoreNorm,
    "q94_sequence_pack" -> sequencePack,
    "q95_exists_subquery" -> existsSubquery,
    "q96_notin_subquery" -> notInSubquery,
    "q97_forward_fill" -> forwardFill,
    "q98_rank_battery" -> rankBattery,
    "q99_string_agg" -> stringAgg,
    "q100_pipeline_capstone" -> pipelineCapstone,
    "q258_learned_quality" -> learnedQuality,
    "q303_trained_quality" -> trainedQuality,
    "q259_capstone_learned_gate" -> capstoneLearnedGate,
    "q265_corpus_diff" -> corpusDiff,
    "q266_neyman_alloc" -> neymanAlloc,
    "q268_contrastive_pairs" -> contrastivePairs,
    "q270_roc_auc" -> rocAuc,
    "q271_calibration_bins" -> calibrationBins,
    "q272_threshold_sweep" -> thresholdSweep,
    "q273_kappa_agreement" -> kappaAgreement,
    "q293_hash_collision_audit" -> hashCollisionAudit,
    "q295_source_leakage" -> sourceLeakage,
    "q298_snapshot_quality_drift" -> snapshotQualityDrift,
    "q299_mixture_ess" -> mixtureEss,
    "q101_unpivot" -> unpivotMeasures,
    "q102_map_functions" -> mapFunctions,
    "q103_windowed_distinct" -> windowedDistinct,
    "q104_mad_outliers" -> madOutliers,
    "q105_explode_outer" -> explodeOuter,
    "q106_bool_agg" -> boolAgg,
    "q107_arg_extremes" -> argExtremes,
    "q169_domain_mix" -> domainMix,
    "q170_token_budget" -> tokenBudget,
    "q206_token_budget_bpe" -> tokenBudgetBpe,
    "q171_cluster_canonical" -> clusterCanonical,
    "q173_shard_export" -> shardExport,
    "q175_hash_sample" -> hashSample,
    "q180_weighted_sample" -> weightedSample,
    "q187_paragraph_dedup" -> paragraphDedup,
    "q192_temperature_mix" -> temperatureMix,
    "q198_domain_shift" -> domainShift)

  val oracleSql: Map[String, String] = Map(
    "q222_quantile_norm" -> quantileNormalizeSql,
    "q243_bottomk_sample" -> bottomKSampleSql,
    "q247_waterfill" -> waterfillSql,
    "q248_effective_tokens" -> effectiveTokensSql,
    "q249_split_leakage" -> splitLeakageSql,
    "q250_joint_histogram" -> jointHistogramSql,
    "q225_gini_source" -> giniBySourceSql,
    "q226_winsorize" -> winsorizeSql,
    "q227_spearman" -> spearmanGroupSql,
    "q234_trimmed_mean" -> trimmedMeanSql,
    "q87_decontam_ngram" -> decontamSql,
    "q88_cohort_retention" -> cohortRetentionSql,
    "q89_window_range_frame" -> rangeFrameHourSql,
    "q90_ntile_deciles" -> ntileDecilesSql,
    "q91_incremental_agg" -> incrementalAggSql,
    "q92_url_canonical" -> urlCanonicalSql,
    "q93_zscore_norm" -> zscoreNormSql,
    "q94_sequence_pack" -> sequencePackSql,
    "q95_exists_subquery" -> existsSubquerySql,
    "q96_notin_subquery" -> notInSubquerySql,
    "q97_forward_fill" -> forwardFillSql,
    "q98_rank_battery" -> rankBatterySql,
    "q99_string_agg" -> stringAggSql,
    "q100_pipeline_capstone" -> pipelineCapstoneSql,
    "q258_learned_quality" -> learnedQualitySql,
    "q303_trained_quality" -> trainedQualitySql,
    "q259_capstone_learned_gate" -> capstoneLearnedGateSql,
    "q265_corpus_diff" -> corpusDiffSql,
    "q266_neyman_alloc" -> neymanAllocSql,
    "q268_contrastive_pairs" -> contrastivePairsSql,
    "q270_roc_auc" -> rocAucSql,
    "q271_calibration_bins" -> calibrationBinsSql,
    "q272_threshold_sweep" -> thresholdSweepSql,
    "q273_kappa_agreement" -> kappaAgreementSql,
    "q293_hash_collision_audit" -> hashCollisionAuditSql,
    "q295_source_leakage" -> sourceLeakageSql,
    "q298_snapshot_quality_drift" -> snapshotQualityDriftSql,
    "q299_mixture_ess" -> mixtureEssSql,
    "q101_unpivot" -> unpivotMeasuresSql,
    "q102_map_functions" -> mapFunctionsSql,
    "q103_windowed_distinct" -> windowedDistinctSql,
    "q104_mad_outliers" -> madOutliersSql,
    "q105_explode_outer" -> explodeOuterSql,
    "q106_bool_agg" -> boolAggSql,
    "q107_arg_extremes" -> argExtremesSql,
    "q169_domain_mix" -> domainMixSql,
    "q170_token_budget" -> tokenBudgetSql,
    "q206_token_budget_bpe" -> tokenBudgetBpeSql,
    "q171_cluster_canonical" -> clusterCanonicalSql,
    "q173_shard_export" -> shardExportSql,
    "q175_hash_sample" -> hashSampleSql,
    "q180_weighted_sample" -> weightedSampleSql,
    "q187_paragraph_dedup" -> paragraphDedupSql,
    "q192_temperature_mix" -> temperatureMixSql,
    "q198_domain_shift" -> domainShiftSql)
}
