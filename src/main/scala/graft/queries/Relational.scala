package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory (SURVEY.md §2.2–§2.8).
  *
  * The reference has only partition-pruned, column-projected scans with a
  * limit (SURVEY §2.2) — joins/aggs/windows/sorts/set-ops are explicitly
  * ABSENT there and form this engine's built-in surface, expressed with
  * `org.apache.spark.sql.functions` so Catalyst plans them (pushdown,
  * partial aggregation, broadcast joins, whole-stage codegen).
  *
  * Scale notes (100 TB design stance):
  *  - every aggregate is a map-side-partial hash aggregate (Catalyst default);
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast
  *    explicitly so fact-table joins never shuffle the big side;
  *  - the only full shuffles are on aggregate keys, which are low-cardinality;
  *  - final ORDER BY on small (aggregated) outputs only — never a global sort
  *    of a fact table except where the query's semantics demand it (q01/q02
  *    keep the sort *after* projection so only the projected columns move).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  // ---------------------------------------------------------------- scans

  /** S1/O2: full-table scan with column projection pushed to parquet. */
  val scanProjection: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_partkey", "l_quantity")

  val scanProjectionSql: String =
    """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
      |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin

  /** §2.2 row-level predicate (absent in reference; Catalyst pushes the
    * shipdate/discount/quantity conjunction into the parquet scan). */
  val filterPredicate: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val filterPredicateSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** §2.6 top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject — a
    * per-partition top-k then a k-row merge on the driver; no global sort. */
  val topK: Q = (s, dir) =>
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** `hivetail --limit N` parity (reference tailer/TailerCmd.java:251-261):
    * bounded tail of a table, with timestamp formatting at second precision
    * (stable across parquet ns/us readers). */
  val tailLimit: Q = (s, dir) =>
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy("event_id")
      .limit(50)

  val tailLimitSql: String =
    """SELECT event_id, user_id, event_type, value,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM events ORDER BY event_id LIMIT 50""".stripMargin

  // ----------------------------------------------------------- aggregates

  /** §2.4 grouped aggregation (TPC-H Q1 shape): partial+final hash agg,
    * 6-group output — the shuffle moves only 6 rows per map task. */
  val aggPricingSummary: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggPricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** §2.4 COUNT(DISTINCT …) — Catalyst expands to a two-stage distinct
    * aggregate; stays one shuffle per distinct key set. */
  val aggCountDistinct: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val aggCountDistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** §2.4 ROLLUP (hierarchical subtotals). */
  val aggRollup: Q = (s, dir) =>
    t(s, dir, "customer")
      .rollup("c_mktsegment")
      .agg(round(sum("c_acctbal"), 2).as("total_bal"), count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment").asc_nulls_first)

  val aggRollupSql: String =
    """SELECT c_mktsegment, round(sum(c_acctbal), 2) AS total_bal, count(*) AS n
      |FROM customer GROUP BY ROLLUP (c_mktsegment)
      |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin

  /** §2.4 CUBE over two dims. */
  val aggCube: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** §2.4 GROUPING SETS via SQL (the canonical Spark surface for it). */
  val aggGroupingSets: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    // exact-cents sum (the q217 integer-moment discipline): a raw
    // double SUM over millions of rows is addition-order-sensitive in
    // its last ulp, which surfaced as a 0.01 hash mismatch at the sf1
    // oracle point; round each price to cents, sum as BIGINT — exact
    // and order-independent in both engines at every scale
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  round(sum(cast(round(o_totalprice * 100) AS BIGINT)) / cast(100 AS DOUBLE), 2) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val aggGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n,
      |  round(sum(round(o_totalprice * 100)::BIGINT) / 100.0, 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** HiveStats parity (reference common/HiveStats.java:90-94): additive
    * table stats — row count + total raw size, metastore-free. */
  val tableStats: Q = (s, dir) =>
    t(s, dir, "documents")
      .agg(count(lit(1)).as("num_rows"), sum("n_chars").as("raw_size"))

  val tableStatsSql: String =
    "SELECT count(*) AS num_rows, sum(n_chars)::BIGINT AS raw_size FROM documents"

  // ---------------------------------------------------------------- joins

  /** §2.3 inner equi-join chain with broadcast dims: revenue by nation.
    * customer/nation broadcast (small), lineitem⋈orders shuffles on
    * orderkey only. */
  val joinInnerRevenue: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  val joinInnerRevenueSql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** §2.3 left outer join: every customer with order count (0 preserved). */
  val joinLeftOuter: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
      .orderBy("c_custkey")
  }

  val joinLeftOuterSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |       round(coalesce(sum(o_totalprice), 0), 2) AS spend
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** §2.3 right outer join: supplier counts per nation with every nation
    * preserved (the symmetric complement of joinLeftOuter). */
  val joinRightOuter: Q = (s, dir) => {
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    su.join(n, su("s_nationkey") === n("n_nationkey"), "right_outer")
      .groupBy("n_nationkey", "n_name")
      .agg(count(col("s_suppkey")).as("n_supp"),
        round(coalesce(sum("s_acctbal"), lit(0.0)), 2).as("total_bal"))
      .orderBy("n_nationkey")
  }

  val joinRightOuterSql: String =
    """SELECT n_nationkey, n_name, count(s_suppkey) AS n_supp,
      |       round(coalesce(sum(s_acctbal), 0), 2) AS total_bal
      |FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin

  /** §2.3 full outer join of two aggregates (customers vs suppliers per
    * nation) — aggregate-before-join keeps both sides tiny. */
  val joinFullOuter: Q = (s, dir) => {
    val c = t(s, dir, "customer").groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    val su = t(s, dir, "supplier").groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(su, c("c_nationkey") === su("s_nationkey"), "full_outer")
      .select(coalesce(c("c_nationkey"), su("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  val joinFullOuterSql: String =
    """SELECT coalesce(c.k, s.k) AS nationkey,
      |       coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |ON c.k = s.k ORDER BY nationkey""".stripMargin

  /** §2.3 left semi join (EXISTS): customers having a >200k order. */
  val joinSemi: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      |ORDER BY c_custkey""".stripMargin

  /** §2.3 left anti join (NOT EXISTS): customers with no URGENT order. */
  val joinAnti: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")
      .orderBy("c_custkey")
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** §2.3 cross join (tiny dims only — BroadcastNestedLoopJoin). */
  val joinCross: Q = (s, dir) => {
    val r1 = t(s, dir, "region").select(col("r_name").as("a"))
    val r2 = t(s, dir, "region").select(col("r_name").as("b"))
    r1.crossJoin(broadcast(r2)).orderBy("a", "b")
  }

  val joinCrossSql: String =
    """SELECT r1.r_name AS a, r2.r_name AS b
      |FROM region r1 CROSS JOIN region r2 ORDER BY a, b""".stripMargin

  /** §2.3 theta join: equi key + non-equi residual (late shipments >60d
    * after order date); residual evaluates post-probe, no NLJ. */
  val joinTheta: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("late_lines"))
      .orderBy("o_orderpriority")
  }

  val joinThetaSql: String =
    """SELECT o_orderpriority, count(*) AS late_lines
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- windows

  /** §2.5 ranking window: top-3 orders per customer by price. */
  val windowRank: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC)::INTEGER AS rk
      |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** §2.5 running aggregate: cumulative spend per customer over time.
    * Frame order is identical in both engines so double accumulation is
    * bit-stable; rounded anyway. */
  val windowRunningSum: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val windowRunningSumSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      |FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey""".stripMargin

  /** §2.5 lag/lead: inter-event gap per user in seconds. */
  val windowLagLead: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
    t(s, dir, "events")
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        lag("event_id", 1).over(w).as("prev_event"),
        lead("event_id", 1).over(w).as("next_event"))
      .orderBy("user_id", "event_id")
  }

  val windowLagLeadSql: String =
    """SELECT user_id, event_id,
      |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS prev_event,
      |  lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS next_event
      |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin

  /** §2.5 moving average over a bounded row frame. */
  val windowMovingAvg: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
      .rowsBetween(-2, 0)
    t(s, dir, "events")
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        round(avg("value").over(w), 4).as("mavg3"))
      .orderBy("user_id", "event_id")
  }

  val windowMovingAvgSql: String =
    """SELECT user_id, event_id,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY event_id ASC
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3
      |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------------- set ops

  /** §2.7 UNION ALL + DISTINCT union of nation keys used by customers vs
    * suppliers. */
  val setUnion: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
    val su = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
    c.union(su).distinct().orderBy("k")
  }

  val setUnionSql: String =
    """SELECT DISTINCT k FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL SELECT s_nationkey AS k FROM supplier) ORDER BY k""".stripMargin

  /** §2.7 INTERSECT. */
  val setIntersect: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
    val su = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
    c.intersect(su).orderBy("k")
  }

  val setIntersectSql: String =
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin

  /** §2.7 EXCEPT: parts only ever shipped in small quantities. */
  val setExcept: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val all = li.select(col("l_partkey").as("k"))
    val big = li.filter(col("l_quantity") > 40).select(col("l_partkey").as("k"))
    all.except(big).orderBy("k")
  }

  val setExceptSql: String =
    """SELECT l_partkey AS k FROM lineitem
      |EXCEPT SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 40
      |ORDER BY k""".stripMargin

  // -------------------------------------------------------- scalar functions

  /** §2.8 string function battery (reference has only byte-slice parsers —
    * BytesParser.java:152-298; the function library itself is our surface). */
  val scalarString: Q = (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        substring(col("p_brand"), 7, 2).as("brand_id"),
        concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
        ltrim(rtrim(col("p_name"))).as("trimmed"))
      .transform(graft.Presentation.sort(_, "p_partkey"))

  val scalarStringSql: String =
    """SELECT p_partkey, upper(p_name) AS uname, length(p_name)::INTEGER AS name_len,
      |  substring(p_brand, 7, 2) AS brand_id,
      |  concat_ws('|', p_type, p_brand) AS type_brand,
      |  ltrim(rtrim(p_name)) AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin

  /** §2.8 date/time functions over the order timeline. */
  val scalarDate: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qtr_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"))
      .transform(graft.Presentation.sort(_, "o_orderkey"))

  val scalarDateSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate)::INTEGER AS yr, month(o_orderdate)::INTEGER AS mo,
      |  dayofmonth(o_orderdate)::INTEGER AS dom,
      |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start,
      |  datediff('day', o_orderdate::DATE, DATE '2002-01-01')::INTEGER AS days_to_2002
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** §2.8 math functions (rounded — libm ulp differences across engines). */
  val scalarMath: Q = (s, dir) =>
    t(s, dir, "supplier")
      .select(col("s_suppkey"),
        round(abs(col("s_acctbal")), 2).as("abs_bal"),
        round(sqrt(abs(col("s_acctbal"))), 6).as("sqrt_bal"),
        round(log(abs(col("s_acctbal")) + 1), 6).as("ln_bal"),
        floor(col("s_acctbal")).as("floor_bal"),
        ceil(col("s_acctbal")).as("ceil_bal"),
        pmod(col("s_suppkey"), lit(7)).as("key_mod7"))
      .orderBy("s_suppkey")

  val scalarMathSql: String =
    """SELECT s_suppkey,
      |  round(abs(s_acctbal), 2) AS abs_bal,
      |  round(sqrt(abs(s_acctbal)), 6) AS sqrt_bal,
      |  round(ln(abs(s_acctbal) + 1), 6) AS ln_bal,
      |  CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
      |  CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
      |  s_suppkey % 7 AS key_mod7
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** §2.8 conditional + cast battery; widening casts mirror the reference's
    * checkAndUpgrade semantics (common/HiveType.java:249) — INT→BIGINT→DOUBLE
    * widen losslessly. */
  val scalarCaseCast: Q = (s, dir) =>
    t(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "debtor")
          .when(col("c_acctbal") < 5000, "regular")
          .otherwise("premium").as("tier"),
        col("c_nationkey").cast("long").as("nation_long"),
        col("c_acctbal").cast("int").as("bal_int"),
        col("c_custkey").cast("double").as("key_dbl"),
        col("c_custkey").cast("string").as("key_str"))
      .transform(graft.Presentation.sort(_, "c_custkey"))

  val scalarCaseCastSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'debtor'
      |       WHEN c_acctbal < 5000 THEN 'regular'
      |       ELSE 'premium' END AS tier,
      |  c_nationkey::BIGINT AS nation_long,
      |  CAST(trunc(c_acctbal) AS INTEGER) AS bal_int,
      |  c_custkey::DOUBLE AS key_dbl,
      |  c_custkey::VARCHAR AS key_str
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------- write path

  /** S11/S15 write path driven through the correctness gate: aggregate →
    * Engine.write (two-phase commit, _SUCCESS) → Engine.read → result.
    * The oracle recomputes the aggregate directly, so a corrupted
    * round-trip (lost rows, type drift) hash-mismatches. */
  val writeRoundtrip: Q = (s, dir) => {
    // fixed per-process scratch dir, wiped at every invocation: repeated
    // verify/bench runs reuse one directory instead of leaking tempdirs
    val wh = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-wh-q29")
    if (java.nio.file.Files.exists(wh)) {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    val e = new graft.api.Engine(s, wh.toString)
    val agg = t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    e.write(graft.api.TableSpec("order_summary"), agg)
    e.read(graft.api.TableSpec("order_summary")).orderBy("o_orderstatus")
  }

  val writeRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------- classic query shapes

  /** TPC-H Q3 shape (shipping priority): 3-way join, filtered both sides,
    * broadcast customer dim, grouped revenue, top-10. */
  val tpchQ3: Q = (s, dir) => {
    val cutoff = lit("1997-06-01").cast("timestamp")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q10 shape (returned-item reporting): which customers returned
    * the most revenue in a quarter — fact⋈fact on orderkey, dims
    * broadcast, top-20 by revenue. Same plan discipline as Q3: the
    * lineitem side never broadcasts, ranking is TakeOrderedAndProject.
    *
    * Revenue is summed AND rounded in exact integer arithmetic (prices
    * and discounts carry 2 decimals, so ep·100 and disc·100 are
    * integers): a plain double sum's result depends on shuffle merge
    * order, and the exact sums routinely land on .xx5 cents where the
    * two engines' decimal round() of a double disagree — so half-up
    * happens as `(sum + 50) div 100` on the integer sum and the final
    * /100 division of identical integers yields identical doubles with
    * no further rounding. Fits a BIGINT through ~sf100 (DECIMAL is the
    * escape hatch beyond). */
  val tpchQ10: Q = (s, dir) => {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val cents = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(cents).as("rc"))
      .withColumn("revenue", expr("CAST((rc + 50) DIV 100 AS DOUBLE) / 100"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val tpchQ10Sql: String =
    """SELECT c_custkey, c_name,
      |  ((sum(round(l_extendedprice * 100)::BIGINT *
      |        (100 - round(l_discount * 100)::BIGINT))::BIGINT + 50) // 100)::DOUBLE
      |    / 100 AS revenue,
      |  c_acctbal, n_name
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  val tpchQ3Sql: String =
    """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-01'
      |  AND l_shipdate > TIMESTAMP '1997-06-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** TPC-H Q5 shape (local supplier volume): 6-way join through region →
    * nation → customer → orders → lineitem → supplier with the
    * same-nation constraint; dims broadcast, facts shuffle on join keys
    * only. */
  val tpchQ5: Q = (s, dir) => {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1997)
    val l = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(su, l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
        su("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val tpchQ5Sql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
      |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): HAVING over a grouped
    * subquery feeding a semi-join, then a re-aggregation — exercises
    * HAVING, IN-subquery decorrelation, and multi-key grouping. */
  val tpchQ18: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val bigOrders = li.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 150) // HAVING
      .select("l_orderkey")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(bigOrders, o("o_orderkey") === bigOrders("l_orderkey"), "left_semi")
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy("c_custkey", "o_orderkey", "o_totalprice")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .select(col("c_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("total_qty"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .limit(20)
  }

  val tpchQ18Sql: String =
    """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price,
      |       round(sum(l_quantity), 2) AS total_qty
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      |GROUP BY c_custkey, o_orderkey, o_totalprice
      |ORDER BY price DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** TPC-H Q7 shape (volume shipping): 6-way join with a symmetric
    * nation-pair predicate and per-year conditional aggregation; both
    * nation legs broadcast, facts shuffle on join keys only. */
  val tpchQ7: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
    val su = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n1 = t(s, dir, "nation").select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), su("s_nationkey") === col("nk1"))
      .join(broadcast(n2), c("c_nationkey") === col("nk2"))
      .filter((col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_3") ||
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_2"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val tpchQ7Sql: String =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |             year(l_shipdate)::INTEGER AS l_year,
      |             l_extendedprice * (1 - l_discount) AS volume
      |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |      WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
      |          OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2'))
      |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q51_tpch_q3" -> tpchQ3,
    "q52_tpch_q5" -> tpchQ5,
    "q57_tpch_q18" -> tpchQ18,
    "q69_tpch_q7" -> tpchQ7,
    "q83_tpch_q10" -> tpchQ10,
    "q29_write_roundtrip" -> writeRoundtrip,
    "q01_scan_projection" -> scanProjection,
    "q02_filter_predicate" -> filterPredicate,
    "q03_topk" -> topK,
    "q04_tail_limit" -> tailLimit,
    "q05_agg_pricing_summary" -> aggPricingSummary,
    "q06_agg_count_distinct" -> aggCountDistinct,
    "q07_agg_rollup" -> aggRollup,
    "q08_agg_cube" -> aggCube,
    "q09_agg_grouping_sets" -> aggGroupingSets,
    "q10_table_stats" -> tableStats,
    "q11_join_inner_revenue" -> joinInnerRevenue,
    "q12_join_left_outer" -> joinLeftOuter,
    "q62_join_right_outer" -> joinRightOuter,
    "q13_join_full_outer" -> joinFullOuter,
    "q14_join_semi" -> joinSemi,
    "q15_join_anti" -> joinAnti,
    "q16_join_cross" -> joinCross,
    "q17_join_theta" -> joinTheta,
    "q18_window_rank" -> windowRank,
    "q19_window_running_sum" -> windowRunningSum,
    "q20_window_lag_lead" -> windowLagLead,
    "q21_window_moving_avg" -> windowMovingAvg,
    "q22_set_union" -> setUnion,
    "q23_set_intersect" -> setIntersect,
    "q24_set_except" -> setExcept,
    "q25_scalar_string" -> scalarString,
    "q26_scalar_date" -> scalarDate,
    "q27_scalar_math" -> scalarMath,
    "q28_scalar_case_cast" -> scalarCaseCast,
  )

  val oracleSql: Map[String, String] = Map(
    "q51_tpch_q3" -> tpchQ3Sql,
    "q52_tpch_q5" -> tpchQ5Sql,
    "q57_tpch_q18" -> tpchQ18Sql,
    "q69_tpch_q7" -> tpchQ7Sql,
    "q83_tpch_q10" -> tpchQ10Sql,
    "q29_write_roundtrip" -> writeRoundtripSql,
    "q01_scan_projection" -> scanProjectionSql,
    "q02_filter_predicate" -> filterPredicateSql,
    "q03_topk" -> topKSql,
    "q04_tail_limit" -> tailLimitSql,
    "q05_agg_pricing_summary" -> aggPricingSummarySql,
    "q06_agg_count_distinct" -> aggCountDistinctSql,
    "q07_agg_rollup" -> aggRollupSql,
    "q08_agg_cube" -> aggCubeSql,
    "q09_agg_grouping_sets" -> aggGroupingSetsSql,
    "q10_table_stats" -> tableStatsSql,
    "q11_join_inner_revenue" -> joinInnerRevenueSql,
    "q12_join_left_outer" -> joinLeftOuterSql,
    "q62_join_right_outer" -> joinRightOuterSql,
    "q13_join_full_outer" -> joinFullOuterSql,
    "q14_join_semi" -> joinSemiSql,
    "q15_join_anti" -> joinAntiSql,
    "q16_join_cross" -> joinCrossSql,
    "q17_join_theta" -> joinThetaSql,
    "q18_window_rank" -> windowRankSql,
    "q19_window_running_sum" -> windowRunningSumSql,
    "q20_window_lag_lead" -> windowLagLeadSql,
    "q21_window_moving_avg" -> windowMovingAvgSql,
    "q22_set_union" -> setUnionSql,
    "q23_set_intersect" -> setIntersectSql,
    "q24_set_except" -> setExceptSql,
    "q25_scalar_string" -> scalarStringSql,
    "q26_scalar_date" -> scalarDateSql,
    "q27_scalar_math" -> scalarMathSql,
    "q28_scalar_case_cast" -> scalarCaseCastSql,
  )
}
