package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** The remaining nine TPC-H shapes (Q6, Q8, Q9, Q11, Q12, Q13, Q15,
  * Q17, Q20) — with q51/q52/q57/q69/q83/q95/q129–q133 this completes
  * all 22 classic shapes. Where the synthetic schema lacks a TPC-H
  * table or column (no partsupp, no l_commitdate/l_receiptdate/
  * l_shipmode, no p_container/ps_supplycost), the shape keeps its join/
  * subquery STRUCTURE — that is what exercises the planner — over the
  * columns that exist; each adaptation is documented on the query.
  *
  * No reference analog — hive-io stops at table I/O
  * (hive-io-exp-core/src/main/java/com/facebook/hiveio/input/HiveInput.java:66).
  *
  * Determinism discipline (see [[Advanced]]): money stays in exact
  * integer hundredths-of-cents (`round(ep*100)::BIGINT * (100 −
  * round(disc*100)::BIGINT)`), quantities are integral longs,
  * threshold comparisons cross-multiply instead of divide, and any
  * double emitted is ONE division of identical integers in both
  * engines. */
object TpchTail {

  private def t = Tables.t _

  /** Exact revenue hundredths-of-cents for one lineitem row. */
  private val lineHc =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  private val LineHcSql =
    "round(l_extendedprice * 100)::BIGINT * (100 - round(l_discount * 100)::BIGINT)"

  // -------------------------------------------------------------- q160

  /** TPC-H Q6 (forecasting revenue change): single-scan filter +
    * aggregate — the canonical pushdown probe. Discount band compared
    * in integer percent (round(disc·100) ∈ [5,7]) so no double literal
    * equality is involved; revenue = Σ ep·disc in exact
    * hundredths-of-cents with the double emitted by one division. */
  val tpchQ6: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997 &&
        round(col("l_discount") * 100).cast("long").between(5L, 7L) &&
        col("l_quantity") < 24)
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round(col("l_discount") * 100).cast("long")).as("revenue_hc"))
      .select(col("revenue_hc"),
        (col("revenue_hc").cast("double") / 10000).as("revenue"))
  }

  val tpchQ6Sql: String =
    """SELECT sum(round(l_extendedprice * 100)::BIGINT *
      |           round(l_discount * 100)::BIGINT)::BIGINT AS revenue_hc,
      |       (sum(round(l_extendedprice * 100)::BIGINT *
      |            round(l_discount * 100)::BIGINT)::BIGINT)::DOUBLE / 10000
      |         AS revenue
      |FROM lineitem
      |WHERE year(l_shipdate) = 1997
      |  AND round(l_discount * 100)::BIGINT BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  // -------------------------------------------------------------- q161

  /** TPC-H Q8 (national market share): the 8-way join — STANDARD-type
    * parts sold into AMERICA-region customers, per order year, with the
    * share of volume supplied by NATION_3 suppliers. Numerator and
    * denominator are exact integer volumes; the share is one division
    * of those integers (identical op order both engines). All five
    * dimension legs broadcast; the two facts shuffle once each. */
  val tpchQ8: Q = (s, dir) => {
    val r = t(s, dir, "region").filter(col("r_name") === "AMERICA")
    val nc = t(s, dir, "nation")
    val ns = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val p = t(s, dir, "part").filter(col("p_type") === "STANDARD")
    val sup = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).between(1996, 1997))
    val l = t(s, dir, "lineitem")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(nc), c("c_nationkey") === nc("n_nationkey"))
      .join(broadcast(r), nc("n_regionkey") === r("r_regionkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(ns), sup("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_3", lineHc)
          .otherwise(lit(0L))).as("nation_hc"),
        sum(lineHc).as("total_hc"))
      .select(col("o_year"), col("nation_hc"), col("total_hc"),
        (col("nation_hc").cast("double") / col("total_hc")).as("mkt_share"))
      .orderBy("o_year")
  }

  val tpchQ8Sql: String =
    s"""SELECT year(o_orderdate)::INT AS o_year,
       |  sum(CASE WHEN sn.n_name = 'NATION_3' THEN $LineHcSql
       |           ELSE 0 END)::BIGINT AS nation_hc,
       |  sum($LineHcSql)::BIGINT AS total_hc,
       |  (sum(CASE WHEN sn.n_name = 'NATION_3' THEN $LineHcSql
       |            ELSE 0 END)::BIGINT)::DOUBLE
       |    / (sum($LineHcSql)::BIGINT) AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation nc ON c_nationkey = nc.n_nationkey
       |JOIN region ON nc.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
       |  AND year(o_orderdate) BETWEEN 1996 AND 1997
       |GROUP BY 1 ORDER BY o_year""".stripMargin

  // -------------------------------------------------------------- q162

  /** TPC-H Q9 (product-type profit, adapted: no partsupp, so supply
    * cost is the part's retail price): per supplier nation and order
    * year over PROMO parts, profit = Σ (ep·(1−disc) − retail·qty), all
    * in exact hundredths-of-cents (retail·qty·100 aligns cents to the
    * hc scale; quantities are integral). */
  val tpchQ9: Q = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val amountHc = lineHc -
      round(col("p_retailprice") * 100).cast("long") *
        round(col("l_quantity")).cast("long") * lit(100L)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amountHc).as("profit_hc"))
      .select(col("nation"), col("o_year"), col("profit_hc"),
        (col("profit_hc").cast("double") / 10000).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val tpchQ9Sql: String =
    s"""SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       |  sum($LineHcSql - round(p_retailprice * 100)::BIGINT *
       |      round(l_quantity)::BIGINT * 100)::BIGINT AS profit_hc,
       |  (sum($LineHcSql - round(p_retailprice * 100)::BIGINT *
       |       round(l_quantity)::BIGINT * 100)::BIGINT)::DOUBLE / 10000
       |    AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_type = 'PROMO'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // -------------------------------------------------------------- q163

  /** TPC-H Q11 (important stock, adapted: no partsupp, so "value" is
    * 1997 shipped revenue per part): parts whose value exceeds TWICE
    * the average part's value — the HAVING-over-global-scalar shape.
    * Q11's fixed-fraction cut (0.0001/SF) is deliberately replaced by
    * an average-relative one so the query stays meaningful at every
    * scale factor; the comparison cross-multiplies exact integers
    * (value·n_parts > 2·total), never a fraction. */
  val tpchQ11: Q = (s, dir) => {
    val perPart = t(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .groupBy(col("l_partkey").as("part_key"))
      .agg(sum(lineHc).as("value_hc"))
    val total = perPart.agg(sum("value_hc").as("total_hc"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(total))
      .filter(col("value_hc") * col("n_parts") > col("total_hc") * 2)
      .select("part_key", "value_hc")
      .orderBy(col("value_hc").desc, col("part_key").asc)
  }

  val tpchQ11Sql: String =
    s"""WITH pp AS (
       |  SELECT l_partkey AS part_key, sum($LineHcSql)::BIGINT AS value_hc
       |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1)
       |SELECT part_key, value_hc FROM pp
       |WHERE value_hc * (SELECT count(*)::BIGINT FROM pp) >
       |      (SELECT sum(value_hc)::BIGINT FROM pp) * 2
       |ORDER BY value_hc DESC, part_key ASC""".stripMargin

  // -------------------------------------------------------------- q164

  /** TPC-H Q12 (shipping-mode priority audit, adapted: no l_shipmode /
    * l_commitdate, so the classifier is shipping LATENESS — shipped
    * more than 90 days after the order date): per lateness class,
    * how many high-priority (1-URGENT / 2-HIGH) vs lower-priority line
    * items. Same shape: fact⋈fact equi-join + CASE aggregation. */
  val tpchQ12: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(when(datediff(col("l_shipdate"), col("o_orderdate")) > 90,
        "late").otherwise("ontime").as("ship_class"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_class")
  }

  val tpchQ12Sql: String =
    """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
      |            THEN 'late' ELSE 'ontime' END AS ship_class,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY ship_class""".stripMargin

  // -------------------------------------------------------------- q165

  /** TPC-H Q13 (customer order-count distribution): LEFT join so
    * customers with no qualifying orders appear as count 0, then the
    * distribution of counts — the double-grouped histogram shape. The
    * order filter stands in for Q13's comment NOT LIKE (no o_comment
    * column): exclude 1-URGENT orders. */
  val tpchQ13: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val tpchQ13Sql: String =
    """SELECT c_count, count(*)::BIGINT AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -------------------------------------------------------------- q166

  /** TPC-H Q15 (top supplier): revenue per supplier over a quarter,
    * then the supplier(s) achieving the MAX — the view + scalar-max
    * shape. Revenue is exact integer hc, so the max-equality join is
    * safe (no double comparison anywhere). */
  val tpchQ15: Q = (s, dir) => {
    val perSupp = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(lineHc).as("total_hc"))
    val best = perSupp.agg(max("total_hc").as("best_hc"))
    val sup = t(s, dir, "supplier")
    perSupp.join(broadcast(best), col("total_hc") === col("best_hc"))
      .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_hc"))
      .orderBy("s_suppkey")
  }

  val tpchQ15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, sum($LineHcSql)::BIGINT AS total_hc
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_hc
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_hc = (SELECT max(total_hc) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // -------------------------------------------------------------- q167

  /** TPC-H Q17 (small-quantity-order revenue): lines of small-size
    * Brand#3 parts whose quantity is under 20% of that part's average
    * quantity — the correlated-average shape, decorrelated to a
    * per-part aggregate join with the comparison cross-multiplied in
    * integers (5·qty·cnt < Σqty ⟺ qty < 0.2·avg; quantities are
    * integral). The per-part stats aggregate the FULL lineitem, as in
    * the spec's correlated subquery. */
  val tpchQ17: Q = (s, dir) => {
    val p = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
    val l = t(s, dir, "lineitem")
    val stats = l.groupBy(col("l_partkey").as("sp_key"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(stats, l("l_partkey") === col("sp_key"))
      .filter(round(col("l_quantity")).cast("long") * 5 * col("cnt") <
        col("sum_qty"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("total_cents"),
        count(lit(1)).as("n_lines"))
  }

  val tpchQ17Sql: String =
    """WITH stats AS (
      |  SELECT l_partkey AS sp_key, count(*)::BIGINT AS cnt,
      |         sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS total_cents,
      |       count(*)::BIGINT AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN stats ON l_partkey = sp_key
      |WHERE p_brand = 'Brand#3' AND p_size <= 10
      |  AND round(l_quantity)::BIGINT * 5 * cnt < sum_qty""".stripMargin

  // -------------------------------------------------------------- q168

  /** TPC-H Q20 (potential part promotion, adapted: no partsupp, so the
    * "excess availability" test is shipped volume): suppliers in the
    * NATION_1x group who shipped more than 55 units of some mid-size
    * part in 1997 — the nested IN-with-aggregate shape (agg subquery →
    * semi join → dim filter). */
  val tpchQ20: Q = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_size").between(10, 20))
    val heavy = t(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
      .filter(col("qty") > 55)
      .select("l_suppkey").distinct()
    val n = t(s, dir, "nation").filter(col("n_name").startsWith("NATION_1"))
    val sup = t(s, dir, "supplier")
    sup.join(heavy, sup("s_suppkey") === heavy("l_suppkey"), "left_semi")
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  val tpchQ20Sql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE year(l_shipdate) = 1997 AND p_size BETWEEN 10 AND 20
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(round(l_quantity)::BIGINT) > 55)
      |AND s_nationkey IN (
      |  SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')
      |ORDER BY s_suppkey""".stripMargin

  // ----------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q160_tpch_q6" -> tpchQ6,
    "q161_tpch_q8" -> tpchQ8,
    "q162_tpch_q9" -> tpchQ9,
    "q163_tpch_q11" -> tpchQ11,
    "q164_tpch_q12" -> tpchQ12,
    "q165_tpch_q13" -> tpchQ13,
    "q166_tpch_q15" -> tpchQ15,
    "q167_tpch_q17" -> tpchQ17,
    "q168_tpch_q20" -> tpchQ20,
  )

  val oracleSql: Map[String, String] = Map(
    "q160_tpch_q6" -> tpchQ6Sql,
    "q161_tpch_q8" -> tpchQ8Sql,
    "q162_tpch_q9" -> tpchQ9Sql,
    "q163_tpch_q11" -> tpchQ11Sql,
    "q164_tpch_q12" -> tpchQ12Sql,
    "q165_tpch_q13" -> tpchQ13Sql,
    "q166_tpch_q15" -> tpchQ15Sql,
    "q167_tpch_q17" -> tpchQ17Sql,
    "q168_tpch_q20" -> tpchQ20Sql,
  )
}
