package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.TextOps

/** Extended operator coverage: batch windowed-time aggregation (the batch
  * twin of StreamOps.tumblingAgg), semi-structured JSON access, generator
  * (UDTF-style) expansion, and the user-function surface (scalar UDF +
  * typed Aggregator UDAF) — SURVEY.md §2.9/§2.10. */
object Extended {

  /** Tumbling event-time window aggregation via `window()` — identical
    * grouping to the streaming path, here over the batch fixture so the
    * DuckDB oracle (hour truncation) can verify it. */
  val windowTumbling: Q = (s, dir) =>
    Tables.t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("w_start", "event_type")

  val windowTumblingSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
      |       event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Semi-structured access: JSON path extraction from the props column,
    * both untyped (get_json_object) and schema'd (from_json). */
  val jsonExtract: Q = (s, dir) =>
    Tables.t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_schema"))
      .transform(graft.Presentation.sort(_, "event_id"))

  val jsonExtractSql: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k')::INTEGER AS k_path,
      |  json_extract_string(props, '$.k')::INTEGER AS k_schema
      |FROM events ORDER BY event_id""".stripMargin

  /** Generator/UDTF surface: explode tokens → corpus term frequencies. */
  val explodeTokenFreq: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(30)

  val explodeTokenFreqSql: String =
    """SELECT tok, count(*) AS n FROM (
      |  SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
      |  FROM documents)
      |WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 30""".stripMargin

  /** User-function surface: a scalar Scala UDF (price banding) and the
    * GeoMean typed Aggregator as a UDAF, in one aggregate — both run
    * partial+final like built-ins (UDFs cost codegen opacity; preferred
    * order is functions._ > custom Expression > UDF, §2.10). */
  val udfUdaf: Q = (s, dir) => {
    val band = udf((p: Double) => if (p < 50000) "low" else if (p < 150000) "mid" else "high")
    val geomean = udaf(graft.functions.GeoMean)
    Tables.t(s, dir, "orders")
      .withColumn("band", band(col("o_totalprice")))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(geomean(col("o_totalprice")), 4).as("geo_price"))
      .orderBy("band")
  }

  val udfUdafSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            ELSE 'high' END AS band,
      |       count(*) AS n,
      |       round(exp(avg(ln(o_totalprice))), 4) AS geo_price
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin

  /** Multimodal metadata path (§7 M7): text packed as binary media +
    * typed meta struct; the SQL-expressible projection (byte length,
    * frame count) is oracle-checked — the stubbed decode itself is
    * covered by MultimodalSpec. */
  val multimodalMeta: Q = (s, dir) =>
    graft.multimodal.Multimodal
      .packText(Tables.t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"),
        length(col("media")).as("media_bytes"),
        col("meta.kind").as("kind"),
        ceil(length(col("media")).cast("double") / 256.0).cast("long").as("n_frames"))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """SELECT doc_id, octet_length(encode(text))::INTEGER AS media_bytes,
      |       'text' AS kind,
      |       CAST(ceil(octet_length(encode(text))::DOUBLE / 256.0) AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Scalar subquery (Catalyst decorrelates to a broadcast of one row):
    * customers above the global mean balance. */
  val scalarSubquery: Q = (s, dir) => {
    Tables.t(s, dir, "customer").createOrReplaceTempView("customer_sq")
    s.sql(
      """SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer_sq
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq)
        |ORDER BY c_custkey""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  /** IN-subquery (decorrelated to a left-semi join). */
  val inSubquery: Q = (s, dir) => {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_in")
    Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem_in")
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders_in
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_in WHERE l_quantity > 48)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val inSubquerySql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 48)
      |ORDER BY o_orderkey""".stripMargin

  /** Pivot (conditional aggregation): lineitem counts by returnflag,
    * pivoted on linestatus. */
  val pivot: Q = (s, dir) =>
    Tables.t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy("l_returnflag")

  val pivotSql: String =
    """SELECT l_returnflag,
      |  count(*) FILTER (WHERE l_linestatus = 'F') AS F,
      |  count(*) FILTER (WHERE l_linestatus = 'O') AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** approx_count_distinct (HLL++) — raw sketch values differ across
    * engines, so the oracle-checkable face is the exact count plus a
    * boolean asserting the sketch landed within 3× HLL++'s default rsd
    * (0.05 is one standard deviation, not a bound — a group can
    * legitimately exceed it on other data, so the oracle-gated envelope
    * is 3σ = 0.15): DuckDB computes the exact side and expects TRUE.
    * ApproxSpec additionally bounds the raw relative error tightly on
    * the fixture data. */
  val approxDistinct: Q = (s, dir) =>
    Tables.t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.15).as("within_3rsd"))
      .orderBy("l_returnflag")

  val approxDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |       TRUE AS within_3rsd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles per group (§2.4 breadth). One sort-based
    * percentile agg computes all three quantiles in a single pass; the array
    * is flattened to scalar columns so downstream tooling can hash rows. */
  val percentiles: Q = (s, dir) =>
    Tables.t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(percentile(col("o_totalprice"), typedLit(Seq(0.25, 0.5, 0.75))).as("pcts"))
      .select(col("o_orderstatus"),
        round(element_at(col("pcts"), 1), 4).as("p25"),
        round(element_at(col("pcts"), 2), 4).as("p50"),
        round(element_at(col("pcts"), 3), 4).as("p75"))
      .orderBy("o_orderstatus")

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** String/range predicate battery (§2.8): LIKE anchors, substring
    * containment, IN-list, BETWEEN. */
  val predicates: Q = (s, dir) =>
    Tables.t(s, dir, "part")
      .select(col("p_partkey"),
        col("p_name").like("%part%").as("has_part"),
        col("p_name").startsWith("name").as("starts_name"),
        col("p_name").endsWith("0").as("ends_zero"),
        col("p_name").contains("a").as("has_a"),
        col("p_size").isin(5, 10, 15).as("size_in"),
        col("p_retailprice").between(500, 1500).as("price_band"))
      .transform(graft.Presentation.sort(_, "p_partkey"))

  val predicatesSql: String =
    """SELECT p_partkey,
      |  p_name LIKE '%part%' AS has_part,
      |  p_name LIKE 'name%' AS starts_name,
      |  p_name LIKE '%0' AS ends_zero,
      |  contains(p_name, 'a') AS has_a,
      |  p_size IN (5, 10, 15) AS size_in,
      |  p_retailprice BETWEEN 500 AND 1500 AS price_band
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Array-function battery (§2.8 collections): sort, slice, contains,
    * distinct-count over token arrays. The sliced array is joined into a
    * single string column so downstream tooling can hash rows. */
  val arrayFuncs: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        concat_ws(" ", slice(sort_array(TextOps.tokens(col("text"))), 1, 5)).as("first5"),
        array_contains(TextOps.tokens(col("text")), "the").as("has_the"),
        size(TextOps.tokens(col("text"))).as("n_toks"),
        size(array_distinct(TextOps.tokens(col("text")))).as("n_uniq"))
      .transform(graft.Presentation.sort(_, "doc_id"))

  val arrayFuncsSql: String = {
    val toks = "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
    s"""SELECT doc_id,
       |  array_to_string((list_sort($toks))[1:5], ' ') AS first5,
       |  list_contains($toks, 'the') AS has_the,
       |  len($toks)::INTEGER AS n_toks,
       |  len(list_distinct($toks))::INTEGER AS n_uniq
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** As-of join (custom temporal operator, graft.operators.AsOf): for
    * each click event, the user's most recent purchase at or before the
    * click. Oracle: DuckDB's native ASOF LEFT JOIN. */
  val asofJoin: Q = (s, dir) => {
    val ev = Tables.t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    graft.operators.AsOf.join(clicks, purchases, key = "user_id",
        leftTs = "ts", rightTs = "ts",
        rightCols = Seq("purchase_id", "purchase_value"), rightTieBreak = "purchase_id")
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        col("purchase_value"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT c.event_id, c.user_id, p.purchase_id, p.purchase_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id,
      |                       value AS purchase_value
      |                FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** Batch sessionization via gaps-and-islands: a session breaks after
    * 30 min of inactivity; session id = running count of breaks. The
    * batch twin of StreamOps.sessionAgg/sessionize, fully
    * SQL-expressible so the oracle can verify it (session_window has no
    * DuckDB analog). */
  val sessionizeBatch: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum("brk").over(run))
      .groupBy("user_id", "session_id")
      .agg(date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeBatchSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR datediff('second',
      |                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    (sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
      |  FROM marked)
      |SELECT user_id, session_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Per-user time-weighted average event value (q214): each event's
    * value holds until the user's next event; the average weights each
    * value by its holding duration in whole seconds — the
    * temporal-aggregation complement of q60's as-of join (point lookup)
    * and q61's sessionization (gap partitioning). Determinism: values
    * quantized to exact milli-units (the fixture is 2-dp), durations
    * floor-divided to whole seconds on integer epoch-micros, so the
    * weighted sum is a BIGINT in both engines and the single final
    * division is the only float op. One window + one aggregate, both on
    * the user key — one shuffle total at any scale. */
  val timeWeightedAvg: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 1000).cast("long").as("v_milli"))
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dt_s", expr("(next_us - unix_micros(ts)) DIV 1000000"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dt_s").as("held_s"),
        sum(col("v_milli") * col("dt_s")).as("num_milli_s"))
      .filter(col("held_s") > 0)
      .select(col("user_id"), col("n_intervals"), col("held_s"),
        round(col("num_milli_s").cast("double") /
          (col("held_s").cast("double") * 1000.0), 6).as("twa"))
      .orderBy("user_id")
  }

  val timeWeightedAvgSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, ts,
      |    round(value * 1000)::BIGINT AS v_milli,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_us
      |  FROM events),
      |g AS (
      |  SELECT user_id, count(*)::BIGINT AS n_intervals,
      |    sum((next_us - epoch_us(ts)) // 1000000)::BIGINT AS held_s,
      |    sum(v_milli * ((next_us - epoch_us(ts)) // 1000000))::BIGINT
      |      AS num_milli_s
      |  FROM iv WHERE next_us IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_intervals, held_s,
      |  round(num_milli_s::DOUBLE / (held_s::DOUBLE * 1000.0), 6) AS twa
      |FROM g WHERE held_s > 0 ORDER BY user_id""".stripMargin

  /** Bucketized range join (graft.operators.RangeJoin): shipments whose
    * ship date falls in a sampled order's first week — a PURE range
    * predicate (no equi key), planned as an equi-join on time bins
    * instead of a nested-loop product (PlanSpec pins this). */
  val rangeJoin: Q = (s, dir) => {
    val week = 7L * 86400
    val o = Tables.t(s, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("lo"),
        (unix_timestamp(col("o_orderdate")) + week).as("hi"))
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_quantity"), unix_timestamp(col("l_shipdate")).as("pt"))
    graft.operators.RangeJoin.pointInInterval(li, o, "pt", "lo", "hi", binWidth = week)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_ship"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderkey")
  }

  val rangeJoinSql: String =
    """SELECT o_orderkey, count(*) AS n_ship, round(sum(l_quantity), 2) AS qty
      |FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 97 = 0) o
      |JOIN lineitem
      |  ON l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  /** Batch twin of the stream-stream interval join
    * (graft.streaming.StreamOps.intervalJoin — StreamingSpec proves the
    * streaming replay equals this): purchases within 30 minutes after a
    * click by the same user. */
  val intervalJoinBatch: Q = (s, dir) => {
    val ev = Tables.t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    graft.streaming.StreamOps.intervalJoin(clicks, purchases, "30 minutes")
      .orderBy("click_id", "purchase_id")
  }

  val intervalJoinBatchSql: String =
    """SELECT c.event_id AS click_id, c.user_id AS user_id,
      |       p.event_id AS purchase_id, p.value AS purchase_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |JOIN (SELECT event_id, user_id, ts, value FROM events
      |      WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  /** Scale path for q54: percentile_approx (GK sketch, mergeable — the
    * 100 TB answer where exact grouped percentiles need a full sort).
    * Oracle face: the exact values plus booleans asserting the sketch
    * landed within 5% relative error. */
  val approxPercentiles: Q = (s, dir) => {
    def withinPct(a: Column, e: Column): Column =
      abs(a - e) / e <= 0.05
    Tables.t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(percentile(col("o_totalprice"), typedLit(Seq(0.25, 0.5, 0.75))).as("pcts"),
        percentile_approx(col("o_totalprice"), typedLit(Seq(0.25, 0.5, 0.75)),
          lit(1000)).as("apcts"))
      .select(col("o_orderstatus"),
        round(element_at(col("pcts"), 2), 4).as("p50_exact"),
        withinPct(element_at(col("apcts"), 1), element_at(col("pcts"), 1)).as("p25_ok"),
        withinPct(element_at(col("apcts"), 2), element_at(col("pcts"), 2)).as("p50_ok"),
        withinPct(element_at(col("apcts"), 3), element_at(col("pcts"), 3)).as("p75_ok"))
      .orderBy("o_orderstatus")
  }

  val approxPercentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.50), 4) AS p50_exact,
      |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Salted skew join (graft.operators.Skew): lineitem⋈orders forced
    * through the salt path (broadcast disabled via hint-free SMJ would
    * hide it, so we join the raw frames). The oracle is the plain join —
    * salting must be result-invariant. */
  val saltedJoin: Q = (s, dir) => {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.t(s, dir, "orders")
      .filter(col("o_orderkey") % 61 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    graft.operators.Skew.saltedJoin(li, o, "o_orderkey", salts = 8)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderstatus")
  }

  val saltedJoinSql: String =
    """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderkey % 61 = 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------- q219

  /** Truncated exponential smoothing (q219): each user's event-value
    * series smoothed with EWMA(α=1/2) truncated at 8 taps — the
    * stream-shaped complement of q214's time-weighted average (q214
    * weights by holding time; this weights by recency). α=1/2 makes
    * every weight an exact power of two (128, 64, …, 1), and values are
    * 2-dp → exact cents, so numerator and present-weight denominator
    * are exact BIGINTs built from an 8-term lag chain; the single final
    * division is the only float op (then one round). Output is the
    * smoothed value AT each user's last event. Everything runs in one
    * user-keyed window — one shuffle on the natural key at any scale,
    * no unbounded state (the 8-tap truncation is what makes the
    * operator streaming/backfill-safe, unlike a full-history EWMA whose
    * integer form would overflow at 2^63). */
  val ewmaSmooth: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val taps = 8
    val base = Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("v"))
    val withLags = (0 until taps).foldLeft(base) { (df, k) =>
      df.withColumn(s"l$k", if (k == 0) col("v") else lag("v", k).over(w))
    }
    val num = (0 until taps).map { k =>
      when(col(s"l$k").isNotNull, col(s"l$k") * lit(1L << (taps - 1 - k)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val den = (0 until taps).map { k =>
      when(col(s"l$k").isNotNull, lit(1L << (taps - 1 - k))).otherwise(lit(0L))
    }.reduce(_ + _)
    withLags
      .withColumn("num", num).withColumn("den", den)
      .withColumn("rn", row_number().over(w))
      .withColumn("nmax", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === col("nmax"))
      .select(col("user_id"), col("nmax").as("n_events"),
        round(col("num").cast("double") /
          (col("den").cast("double") * 100.0), 4).as("ewma"))
      .orderBy("user_id")
  }

  val ewmaSmoothSql: String = {
    val lags = (0 until 8).map { k =>
      if (k == 0) "v AS l0"
      else s"lag(v, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l$k"
    }.mkString(",\n      |    ")
    val num = (0 until 8).map(k =>
      s"CASE WHEN l$k IS NOT NULL THEN l$k * ${1L << (7 - k)} ELSE 0 END")
      .mkString(" + ")
    val den = (0 until 8).map(k =>
      s"CASE WHEN l$k IS NOT NULL THEN ${1L << (7 - k)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, ts,
       |    round(value * 100)::BIGINT AS v FROM events),
       |lagged AS (
       |  SELECT user_id, event_id, ts,
       |    $lags,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS rn,
       |    count(*) OVER (PARTITION BY user_id) AS nmax
       |  FROM base)
       |SELECT user_id, nmax::BIGINT AS n_events,
       |  round(($num)::DOUBLE / (($den)::DOUBLE * 100.0), 4) AS ewma
       |FROM lagged WHERE rn = nmax ORDER BY user_id""".stripMargin
  }

  // -------------------------------------------------------------- q237

  /** Lead–lag cross-correlation (q237): CCF between the daily click
    * series and the daily purchase series at lags −3..+3 — "do clicks
    * lead purchases, and by how many days?" (q218's bivariate sibling;
    * the lag with the largest correlation is the discovered lead). One
    * pass builds the daily rollup (checkpointed — both series and every
    * lag read it); each lag is a day-shifted equi-join of the two tiny
    * series, and r is the exact-integer-moment Pearson form. All
    * post-rollup work is days×lags-sized — data-volume-independent. */
  val ccfLeadLag: Q = (s, dir) => {
    val daily = Tables.t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val x = daily.filter(col("event_type") === "click")
      .select(col("d"), col("c").as("x"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("d").as("dy"), col("c").as("y"))
    val lags = x.select(col("d"), col("x"),
      explode(sequence(lit(-3), lit(3))).as("k"))
      .join(y, expr("dy = date_add(d, k)"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double"); val syd = col("sy").cast("double")
    lags.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("num", nd * col("sxy").cast("double") - sxd * syd)
      .withColumn("den_x", nd * col("sxx").cast("double") - sxd * sxd)
      .withColumn("den_y", nd * col("syy").cast("double") - syd * syd)
      .filter(col("den_x") > 0 && col("den_y") > 0)
      .select(col("k"), col("n"),
        round(col("num") / (sqrt(col("den_x")) * sqrt(col("den_y"))), 6)
          .as("ccf"))
      .orderBy("k")
  }

  val ccfLeadLagSql: String =
    """WITH daily AS (
      |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS c
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1, 2),
      |x AS (SELECT d, c AS x FROM daily WHERE event_type = 'click'),
      |y AS (SELECT d AS dy, c AS y FROM daily WHERE event_type = 'purchase'),
      |lags AS (
      |  SELECT k, x.x, y.y
      |  FROM x CROSS JOIN (SELECT unnest(range(-3, 4))::INTEGER AS k) ks
      |  JOIN y ON y.dy = x.d + k),
      |m AS (
      |  SELECT k, count(*)::BIGINT AS n,
      |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |    sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy,
      |    sum(y * y)::BIGINT AS syy
      |  FROM lags GROUP BY 1),
      |d AS (
      |  SELECT *,
      |    n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
      |    n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS den_x,
      |    n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS den_y
      |  FROM m)
      |SELECT k::INTEGER AS k, n,
      |  round(num / (sqrt(den_x) * sqrt(den_y)), 6) AS ccf
      |FROM d WHERE den_x > 0 AND den_y > 0
      |ORDER BY k""".stripMargin

  // -------------------------------------------------------------- q238

  /** Index-base-100 rebase (q238): each event type's daily volume
    * re-expressed relative to its own first observed day (= 100) — the
    * classic comparability transform for series with different scales.
    * first_value rides the same type-keyed window as the presentation
    * of the series; the index is one exact-integer ratio × 100. */
  val indexRebase: Q = (s, dir) => {
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .withColumn("c0", first("c").over(w))
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd")
        .as("day"),
        col("c"),
        round(col("c").cast("double") * 100.0 / col("c0").cast("double"), 2)
          .as("idx"))
      .orderBy("event_type", "day")
  }

  val indexRebaseSql: String =
    """WITH daily AS (
      |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |f AS (
      |  SELECT event_type, d, c,
      |    first_value(c) OVER (PARTITION BY event_type ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0
      |  FROM daily)
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, c,
      |  round(c::DOUBLE * 100.0 / c0::DOUBLE, 2) AS idx
      |FROM f ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q239

  /** Day-of-week seasonality profile (q239): per event type, each
    * weekday's share of daily volume relative to a flat week — ratio =
    * (Σc_dow · n_days) / (n_dow · Σc_all), exact integers with one
    * final division (weekday numbering pinned cross-engine: Monday=0
    * via Spark `weekday` = DuckDB `isodow − 1`). The 7×types profile
    * is the seasonal factor table a decomposition would divide out. */
  val dowSeasonality: Q = (s, dir) => {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = daily.groupBy("event_type")
      .agg(sum("c").as("s_all"), count(lit(1)).as("n_all"))
    daily.withColumn("dow", weekday(col("d")))
      .groupBy("event_type", "dow")
      .agg(sum("c").as("s_dow"), count(lit(1)).as("n_dow"))
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"), col("n_dow"),
        round((col("s_dow") * col("n_all")).cast("double") /
          (col("n_dow") * col("s_all")).cast("double"), 4).as("factor"))
      .orderBy("event_type", "dow")
  }

  val dowSeasonalitySql: String =
    """WITH daily AS (
      |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, sum(c)::BIGINT AS s_all,
      |    count(*)::BIGINT AS n_all
      |  FROM daily GROUP BY 1),
      |dw AS (
      |  SELECT event_type, (isodow(d) - 1)::INTEGER AS dow,
      |    sum(c)::BIGINT AS s_dow, count(*)::BIGINT AS n_dow
      |  FROM daily GROUP BY 1, 2)
      |SELECT dw.event_type, dow, n_dow,
      |  round((s_dow * n_all)::DOUBLE / ((n_dow * s_all)::DOUBLE), 4)
      |    AS factor
      |FROM dw JOIN tot USING (event_type)
      |ORDER BY event_type, dow""".stripMargin

  // -------------------------------------------------------------- q251

  /** Seasonal anomaly days (q251): the composition the q239 profile
    * exists for — divide each day's volume by its weekday factor
    * (deseasonalize), then flag days beyond a 3×MAD robust fence. The
    * deseasonalized ratio c·fd/fn is ONE fixed IEEE expression over
    * exact integers, micro-quantized immediately (the quantize-then-sum
    * discipline), and the median/MAD fence is pure integer arithmetic
    * on doubled/quadrupled rank extracts (med2 = sum of the two middle
    * ranks, mad4 = doubled MAD of doubled deviations) so the flag
    * 2·dev2 > 3·mad4 never touches a float. All windows run on the
    * daily rollup — days×types rows, data-volume-independent. */
  val seasonalAnomaly: Q = (s, dir) => {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = daily.groupBy("event_type")
      .agg(sum("c").as("s_all"), count(lit(1)).as("n_all"))
    val dw = daily.withColumn("dow", weekday(col("d")))
      .groupBy("event_type", "dow")
      .agg(sum("c").as("s_dow"), count(lit(1)).as("n_dow"))
    val des = daily.withColumn("dow", weekday(col("d")))
      .join(broadcast(dw), Seq("event_type", "dow"))
      .join(broadcast(tot), "event_type")
      .withColumn("rm",
        round((col("c") * col("n_dow") * col("s_all")).cast("double") /
          (col("s_dow") * col("n_all")).cast("double") * 1e6).cast("long"))
      .localCheckpoint(true)
    val byT = Window.partitionBy("event_type")
    val w1 = byT.orderBy("rm", "d")
    val ranked = des
      .withColumn("rnk", row_number().over(w1).cast("long"))
      .withColumn("n", count(lit(1)).over(byT))
    val med = ranked.groupBy("event_type")
      .agg((max(when(col("rnk") === expr("(n + 1) DIV 2"), col("rm"))) +
        max(when(col("rnk") === expr("(n + 2) DIV 2"), col("rm"))))
        .as("med2"))
    val dev = ranked.join(broadcast(med), "event_type")
      .withColumn("dev2", abs(lit(2) * col("rm") - col("med2")))
    val w2 = byT.orderBy("dev2", "d")
    val ranked2 = dev.withColumn("rnk2", row_number().over(w2).cast("long"))
    val mad = ranked2.groupBy("event_type")
      .agg((max(when(col("rnk2") === expr("(n + 1) DIV 2"), col("dev2"))) +
        max(when(col("rnk2") === expr("(n + 2) DIV 2"), col("dev2"))))
        .as("mad4"))
    ranked2.join(broadcast(mad), "event_type")
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd")
        .as("day"), col("c"),
        round(col("rm").cast("double") / 1e6, 4).as("deseasonalized"),
        (lit(2) * col("dev2") > lit(3) * col("mad4")).as("anomaly"))
      .orderBy("event_type", "day")
  }

  val seasonalAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, sum(c)::BIGINT AS s_all,
      |    count(*)::BIGINT AS n_all
      |  FROM daily GROUP BY 1),
      |dw AS (
      |  SELECT event_type, (isodow(d) - 1)::INTEGER AS dow,
      |    sum(c)::BIGINT AS s_dow, count(*)::BIGINT AS n_dow
      |  FROM daily GROUP BY 1, 2),
      |des AS (
      |  SELECT daily.event_type, daily.d, daily.c,
      |    round((daily.c * dw.n_dow * tot.s_all)::DOUBLE /
      |      ((dw.s_dow * tot.n_all)::DOUBLE) * 1e6)::BIGINT AS rm
      |  FROM daily
      |  JOIN dw ON dw.event_type = daily.event_type
      |    AND dw.dow = (isodow(daily.d) - 1)::INTEGER
      |  JOIN tot ON tot.event_type = daily.event_type),
      |ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type ORDER BY rm, d)::BIGINT
      |      AS rnk,
      |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n
      |  FROM des),
      |med AS (
      |  SELECT event_type,
      |    max(CASE WHEN rnk = (n + 1) // 2 THEN rm END) +
      |    max(CASE WHEN rnk = (n + 2) // 2 THEN rm END) AS med2
      |  FROM ranked GROUP BY 1),
      |dev AS (
      |  SELECT r.*, abs(2 * r.rm - m.med2) AS dev2
      |  FROM ranked r JOIN med m USING (event_type)),
      |r2 AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY dev2, d)::BIGINT AS rnk2
      |  FROM dev),
      |mad AS (
      |  SELECT event_type,
      |    max(CASE WHEN rnk2 = (n + 1) // 2 THEN dev2 END) +
      |    max(CASE WHEN rnk2 = (n + 2) // 2 THEN dev2 END) AS mad4
      |  FROM r2 GROUP BY 1)
      |SELECT r2.event_type, strftime(r2.d, '%Y-%m-%d') AS day, r2.c,
      |  round(r2.rm::DOUBLE / 1e6, 4) AS deseasonalized,
      |  2 * r2.dev2 > 3 * ma.mad4 AS anomaly
      |FROM r2 JOIN mad ma USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q253

  /** Top session paths (q253): the most common ordered event-type
    * journeys within q61's 30-minute sessions — the free-form "sankey"
    * complement of q80's fixed funnel and q125's 1-step transition
    * matrix. The path string is assembled by an ORDERED collect over
    * the session window (deterministic — a bare collect_list's order is
    * not), counted, and top-10 cut with a path tie-break. Sessions are
    * user-keyed windows; the path aggregate shuffles one row per
    * session. */
  val topPaths: Q = (s, dir) => {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val marked = Tables.t(s, dir, "events")
      .withColumn("prev", lag("ts", 1).over(wOrd))
      .withColumn("brk",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    val paths = marked
      .withColumn("path", array_join(collect_list("event_type").over(
        wSess.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)), ">"))
      .withColumn("rn", row_number().over(wSess))
      .filter(col("rn") === 1)
      .select("path")
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(10)
  }

  val topPathsSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id)) > 1800000000
      |    THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked),
      |paths AS (
      |  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM sess GROUP BY user_id, sid)
      |SELECT path, count(*)::BIGINT AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path ASC LIMIT 10""".stripMargin

  // -------------------------------------------------------------- q254

  /** Theil–Sen robust trend (q254): per event type, the median of all
    * pairwise day-slopes of the daily series — the robust alternative
    * to q217's OLS trend (one wild day moves OLS, not the pairwise
    * median; the estimator behind robust telemetry trend lines). The
    * pair stage is quadratic IN DAYS — a bounded time-spine, never the
    * corpus (the q223 bounded-domain rule; 30 days → 435 pairs) — and
    * each slope Δc/Δd is micro-quantized by its single division before
    * the integer doubled-median extract, so nothing order-sensitive
    * survives. */
  val theilSenTrend: Q = (s, dir) => {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dn", datediff(col("d"), lit("2024-01-01").cast("date"))
        .cast("long"))
      .localCheckpoint(true)
    val pairs = daily.as("x").join(daily.as("y"), "event_type")
      .filter(col("x.dn") < col("y.dn"))
      .select(col("event_type"),
        round((col("y.c") - col("x.c")).cast("double") /
          (col("y.dn") - col("x.dn")).cast("double") * 1e6).cast("long")
          .as("sm"),
        col("x.dn").as("da"), col("y.dn").as("db"))
    val w = Window.partitionBy("event_type").orderBy("sm", "da", "db")
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max("n").as("n_pairs"),
        (max(when(col("rnk") === expr("(n + 1) DIV 2"), col("sm"))) +
          max(when(col("rnk") === expr("(n + 2) DIV 2"), col("sm"))))
          .as("med2"))
      .select(col("event_type"), col("n_pairs"),
        round(col("med2").cast("double") / 2e6, 4).as("slope_per_day"))
      .orderBy("event_type")
  }

  val theilSenTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS c,
      |    (ts::DATE - DATE '2024-01-01')::BIGINT AS dn
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT x.event_type,
      |    round((y.c - x.c)::DOUBLE / ((y.dn - x.dn)::DOUBLE) * 1e6)::BIGINT
      |      AS sm,
      |    x.dn AS da, y.dn AS db
      |  FROM daily x JOIN daily y
      |    ON x.event_type = y.event_type AND x.dn < y.dn),
      |ranked AS (
      |  SELECT event_type, sm,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY sm, da, db)::BIGINT AS rnk,
      |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n
      |  FROM pairs)
      |SELECT event_type, max(n)::BIGINT AS n_pairs,
      |  round((max(CASE WHEN rnk = (n + 1) // 2 THEN sm END) +
      |         max(CASE WHEN rnk = (n + 2) // 2 THEN sm END))::DOUBLE
      |        / 2e6, 4) AS slope_per_day
      |FROM ranked GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q279

  /** One-sided CUSUM mean-shift detector (q279): per event type, the
    * cumulative-sum control chart S_i = max(0, S_{i−1} + (x_i − μ))
    * over the daily count series, reporting the peak excursion, the
    * number of alarm days (S > 3μ), and the first alarm's day index —
    * the sequential complement to q174's pointwise spike test (CUSUM
    * accumulates small persistent shifts a per-day test misses). All
    * arithmetic is exact-integer: the recursion carries S·n_days so the
    * mean never becomes a float (S·nd ← max(0, S·nd + c_i·nd − Σc)),
    * and the 3μ threshold compares S·nd > 3·Σc. The recursion runs on
    * the bounded per-type daily spine — Spark folds it with a
    * higher-order `aggregate` over the sorted day array, the oracle
    * replays it as a recursive CTE; data-scale work is one daily count
    * aggregate. */
  val cusumShift: Q = (s, dir) => {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val per = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("c")))).as("ds"),
        sum("c").as("tot"), count(lit(1)).as("nd"))
      .withColumn("ss", expr(
        "aggregate(ds, CAST(array() AS ARRAY<BIGINT>), (acc, x) -> " +
        "concat(acc, array(greatest(0L, " +
        "IF(size(acc) = 0, 0L, element_at(acc, size(acc))) " +
        "+ x.c * nd - tot))))"))
    per.select(col("event_type"), col("nd"), col("tot"),
        posexplode(col("ss")))
      .groupBy("event_type", "nd", "tot")
      .agg(max("col").as("cusum_max"),
        sum(when(col("col") > lit(3) * col("tot"), 1L).otherwise(0L))
          .as("n_alarm"),
        min(when(col("col") > lit(3) * col("tot"),
          (col("pos") + 1).cast("long"))).as("fa"))
      .select(col("event_type"), col("nd"), col("tot"), col("cusum_max"),
        col("n_alarm"), coalesce(col("fa"), lit(0L)).as("first_alarm"))
      .orderBy("event_type")
  }

  val cusumShiftSql: String =
    """WITH RECURSIVE daily AS MATERIALIZED (
      |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |idx AS MATERIALIZED (
      |  SELECT event_type, c,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d)::BIGINT AS i
      |  FROM daily),
      |t AS MATERIALIZED (
      |  SELECT event_type, sum(c)::BIGINT AS tot, count(*)::BIGINT AS nd
      |  FROM daily GROUP BY 1),
      |rec AS (
      |  SELECT event_type, 0::BIGINT AS i, 0::BIGINT AS sv FROM t
      |  UNION ALL
      |  SELECT r.event_type, r.i + 1,
      |    greatest(0, r.sv + x.c * t.nd - t.tot)
      |  FROM rec r
      |  JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
      |  JOIN t ON t.event_type = r.event_type)
      |SELECT s.event_type, t.nd, t.tot,
      |  max(sv)::BIGINT AS cusum_max,
      |  sum(CASE WHEN sv > 3 * t.tot THEN 1 ELSE 0 END)::BIGINT AS n_alarm,
      |  coalesce(min(CASE WHEN sv > 3 * t.tot THEN i END), 0)::BIGINT
      |    AS first_alarm
      |FROM (SELECT event_type, i, sv FROM rec WHERE i > 0) s
      |JOIN t ON t.event_type = s.event_type
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q283

  /** Kaplan–Meier user-lifetime survival (q283): the retention curve —
    * per distinct active-lifetime t (days between a user's first and
    * last event), the at-risk count, the churn count (last event more
    * than 7 days before the corpus horizon = an observed "death";
    * anything later is right-censored), and the LOG survival in exact
    * micro-nats: each factor ln((n_i−d_i)/n_i) is quantized before the
    * cumulative sum (the q278/q282 discipline), so the curve is an
    * order-free integer aggregation — no exp/product float chains, and
    * consumers exponentiate at read time. The lifetime spine is
    * bounded by the observation window's day count; data-scale work is
    * one per-user min/max aggregate. An absorbed step (n_risk = d,
    * survival exactly 0) yields a NULL log — flagged, not fudged. */
  val kaplanMeier: Q = (s, dir) => {
    val perUser = Tables.t(s, dir, "events")
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_d"),
        max(to_date(col("ts"))).as("last_d"))
    val endD = Tables.t(s, dir, "events")
      .agg(max(to_date(col("ts"))).as("end_d"))
    val cnt = perUser.crossJoin(broadcast(endD))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("t"),
        (datediff(col("end_d"), col("last_d")) > 7).as("churned"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_t"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cnt.agg(sum("n_t").as("nn"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("cum", sum("n_t").over(w))
      .withColumn("n_risk", col("nn") - col("cum") + col("n_t"))
      .withColumn("ls6", expr(
        "CASE WHEN d = 0 THEN 0L WHEN n_risk > d THEN " +
        "CAST(round(ln(CAST(n_risk - d AS DOUBLE) / " +
        "CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT) ELSE NULL END"))
      .withColumn("log_surv_micro", sum("ls6").over(w))
      .select(col("t"), col("n_risk"), col("d").as("n_churn"),
        when(col("ls6").isNull, lit(null)).otherwise(col("log_surv_micro"))
          .as("log_surv_micro"))
      .orderBy("t")
  }

  val kaplanMeierSql: String =
    """WITH pu AS (
      |  SELECT user_id, min(ts::DATE) AS first_d, max(ts::DATE) AS last_d
      |  FROM events GROUP BY 1),
      |e AS (SELECT max(ts::DATE) AS end_d FROM events),
      |life AS (
      |  SELECT (last_d - first_d)::BIGINT AS t,
      |    (end_d - last_d) > 7 AS churned
      |  FROM pu CROSS JOIN e),
      |cnt AS (
      |  SELECT t, count(*)::BIGINT AS n_t,
      |    sum(CASE WHEN churned THEN 1 ELSE 0 END)::BIGINT AS d
      |  FROM life GROUP BY 1),
      |t2 AS (SELECT sum(n_t)::BIGINT AS nn FROM cnt),
      |k AS (
      |  SELECT t, n_t, d,
      |    (nn - sum(n_t) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + n_t)
      |      ::BIGINT AS n_risk
      |  FROM cnt CROSS JOIN t2),
      |ls AS (
      |  SELECT t, n_risk, d,
      |    CASE WHEN d = 0 THEN 0
      |         WHEN n_risk > d THEN round(ln((n_risk - d)::DOUBLE /
      |           n_risk::DOUBLE) * 1e6)::BIGINT
      |         ELSE NULL END AS ls6
      |  FROM k)
      |SELECT t, n_risk, d AS n_churn,
      |  (CASE WHEN ls6 IS NULL THEN NULL ELSE
      |    sum(ls6) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) END)
      |    ::BIGINT AS log_surv_micro
      |FROM ls ORDER BY t""".stripMargin

  // -------------------------------------------------------------- q294

  /** Inter-arrival burstiness (q294): per event type, the squared
    * coefficient of variation of inter-arrival gaps — CV² ≈ 1 is
    * Poisson traffic, CV² ≫ 1 is bursty, CV² ≪ 1 is a scheduler's
    * heartbeat. The keyed lag runs per event type; gaps floor to whole
    * seconds (identical integral division both engines), and
    * CV² = (nΣg² − (Σg)²)/(Σg)² is a half-away 4-dp quotient of exact
    * DECIMAL(38) moments — no float variance chain. The exact mean gap
    * rides along at 2 dp. */
  val interArrivalCv: Q = (s, dir) => {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    Tables.t(s, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag("ts", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) - unix_micros(prev)) DIV 1000000").as("g"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("g").as("sg"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * g")).as("sg2"))
      .filter(col("sg") > 0)
      .withColumn("mean_gap2",
        expr("(sg * 200 + n) DIV (2 * n)").cast("double") / 100.0)
      .withColumn("cv2_4", expr(
        "((CAST(n AS DECIMAL(38,0)) * sg2 - CAST(sg AS DECIMAL(38,0)) * sg)" +
        " * 20000 + CAST(sg AS DECIMAL(38,0)) * sg) DIV " +
        "(2 * CAST(sg AS DECIMAL(38,0)) * sg)").cast("double") / 10000.0)
      .select(col("event_type"), col("n"), col("mean_gap2"), col("cv2_4"))
      .orderBy("event_type")
  }

  val interArrivalCvSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id))) // 1000000 AS g
      |  FROM events),
      |m AS (
      |  SELECT event_type, count(*)::BIGINT AS n, sum(g)::BIGINT AS sg,
      |    sum(g::HUGEINT * g)::HUGEINT AS sg2
      |  FROM g WHERE g IS NOT NULL GROUP BY 1)
      |SELECT event_type, n,
      |  ((sg * 200 + n) // (2 * n))::DOUBLE / 100.0 AS mean_gap2,
      |  (((n::HUGEINT * sg2 - sg::HUGEINT * sg) * 20000
      |    + sg::HUGEINT * sg) //
      |   (2 * sg::HUGEINT * sg))::DOUBLE / 10000.0 AS cv2_4
      |FROM m WHERE sg > 0 ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q279_cusum_shift" -> cusumShift,
    "q283_kaplan_meier" -> kaplanMeier,
    "q294_interarrival_cv" -> interArrivalCv,
    "q219_ewma_smooth" -> ewmaSmooth,
    "q254_theilsen_trend" -> theilSenTrend,
    "q253_top_paths" -> topPaths,
    "q251_seasonal_anomaly" -> seasonalAnomaly,
    "q237_ccf_leadlag" -> ccfLeadLag,
    "q238_index_rebase" -> indexRebase,
    "q239_dow_seasonality" -> dowSeasonality,
    "q66_salted_join" -> saltedJoin,
    "q63_range_join" -> rangeJoin,
    "q64_interval_join" -> intervalJoinBatch,
    "q65_approx_percentiles" -> approxPercentiles,
    "q61_sessionize_batch" -> sessionizeBatch,
    "q214_time_weighted" -> timeWeightedAvg,
    "q60_asof_join" -> asofJoin,
    "q58_array_funcs" -> arrayFuncs,
    "q54_percentiles" -> percentiles,
    "q55_predicates" -> predicates,
    "q41_window_tumbling" -> windowTumbling,
    "q42_json_extract" -> jsonExtract,
    "q43_explode_token_freq" -> explodeTokenFreq,
    "q44_udf_udaf" -> udfUdaf,
    "q45_multimodal_meta" -> multimodalMeta,
    "q46_scalar_subquery" -> scalarSubquery,
    "q47_in_subquery" -> inSubquery,
    "q48_pivot" -> pivot,
    "q49_approx_distinct" -> approxDistinct,
  )

  val oracleSql: Map[String, String] = Map(
    "q219_ewma_smooth" -> ewmaSmoothSql,
    "q251_seasonal_anomaly" -> seasonalAnomalySql,
    "q279_cusum_shift" -> cusumShiftSql,
    "q283_kaplan_meier" -> kaplanMeierSql,
    "q294_interarrival_cv" -> interArrivalCvSql,
    "q253_top_paths" -> topPathsSql,
    "q254_theilsen_trend" -> theilSenTrendSql,
    "q237_ccf_leadlag" -> ccfLeadLagSql,
    "q238_index_rebase" -> indexRebaseSql,
    "q239_dow_seasonality" -> dowSeasonalitySql,
    "q66_salted_join" -> saltedJoinSql,
    "q63_range_join" -> rangeJoinSql,
    "q64_interval_join" -> intervalJoinBatchSql,
    "q65_approx_percentiles" -> approxPercentilesSql,
    "q61_sessionize_batch" -> sessionizeBatchSql,
    "q214_time_weighted" -> timeWeightedAvgSql,
    "q60_asof_join" -> asofJoinSql,
    "q58_array_funcs" -> arrayFuncsSql,
    "q54_percentiles" -> percentilesSql,
    "q55_predicates" -> predicatesSql,
    "q41_window_tumbling" -> windowTumblingSql,
    "q42_json_extract" -> jsonExtractSql,
    "q43_explode_token_freq" -> explodeTokenFreqSql,
    "q44_udf_udaf" -> udfUdafSql,
    "q45_multimodal_meta" -> multimodalMetaSql,
    "q46_scalar_subquery" -> scalarSubquerySql,
    "q47_in_subquery" -> inSubquerySql,
    "q48_pivot" -> pivotSql,
    "q49_approx_distinct" -> approxDistinctSql,
  )
}
