package graft.queries

import graft.{Q, Tables}
import graft.llm.{SetSimilarity, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 additions: the classic TPC-H shapes still missing from the
  * relational surface (correlated min / conditional-agg ratio /
  * disjunctive join predicates / multi-EXISTS / decorrelated-aggregate
  * comparison), the typed Dataset API surface (KeyValueGroupedDataset
  * mapGroups), the generator battery (posexplode/stack), the exact
  * prefix-filter set-similarity join ([[graft.llm.SetSimilarity]] — the
  * exact scale path next to q32's MinHash-LSH), an integer contingency
  * lift table, an integer-exact trailing-window anomaly flag, a
  * two-stage ANN rerank cascade, and the as-of-with-tolerance join.
  *
  * No reference analog for any of these — hive-io stops at table I/O
  * (hive-io-exp-core/src/main/java/com/facebook/hiveio/input/HiveInput.java:66);
  * they are part of this engine's declared query surface (SURVEY §2.3–
  * §2.8 extensions). Determinism discipline matches [[Analytics]]:
  * exact integer sums (cents / hundredths-of-cents), integer
  * cross-multiplied threshold comparisons instead of divisions, double
  * math only as one final step with identical op order in both engines,
  * ranking only over rounded values with id tie-breaks, and a stable
  * final ORDER BY.
  */
object Advanced {

  private def t = Tables.t _

  // -------------------------------------------------------------- q129

  /** Correlated-min subquery (TPC-H Q2 shape, adapted to this schema:
    * no partsupp table, so "supply cost" is the lineitem extended
    * price): for mid-size parts, the EUROPE suppliers that achieved the
    * minimum observed price. The min is over exact cents, and the
    * equality join back against the per-part min is the decorrelated
    * form Catalyst would produce for the correlated subquery. */
  val mincostSupplier: Q = (s, dir) => {
    val eu = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("l_partkey"), col("s_name"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val m = eu.groupBy("l_partkey").agg(min("cents").as("min_cents"))
    eu.join(m, Seq("l_partkey"))
      .filter(col("cents") === col("min_cents"))
      .join(broadcast(t(s, dir, "part").filter(col("p_size").between(10, 12))),
        col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "s_name", "min_cents")
      .distinct()
      .orderBy("p_partkey", "s_name")
  }

  val mincostSupplierSql: String =
    """WITH eu AS (
      |  SELECT l.l_partkey, s.s_name,
      |         round(l.l_extendedprice * 100)::BIGINT AS cents
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'),
      |m AS (SELECT l_partkey, min(cents) AS min_cents FROM eu GROUP BY 1)
      |SELECT DISTINCT p.p_partkey, p.p_name, eu.s_name, m.min_cents
      |FROM eu JOIN m ON eu.l_partkey = m.l_partkey AND eu.cents = m.min_cents
      |JOIN part p ON p.p_partkey = eu.l_partkey AND p.p_size BETWEEN 10 AND 12
      |ORDER BY p_partkey, s_name""".stripMargin

  // -------------------------------------------------------------- q130

  /** Conditional-aggregate ratio (TPC-H Q14, promo revenue share) per
    * ship month. Revenue in hundredths of cents — exact BIGINT — and the
    * share is one double division of those exact integers. */
  val promoShare: Q = (s, dir) => {
    val rev = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"))
      .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).as("promo_rc"),
        sum(rev).as("total_rc"))
      .withColumn("promo_share",
        round(col("promo_rc").cast("double") / col("total_rc").cast("double"), 6))
      .orderBy("ym")
  }

  val promoShareSql: String =
    """WITH l AS (
      |  SELECT (year(l_shipdate) * 100 + month(l_shipdate))::INT AS ym,
      |    round(l_extendedprice * 100)::BIGINT *
      |      (100 - round(l_discount * 100)::BIGINT) AS rev,
      |    p.p_type
      |  FROM lineitem JOIN part p ON l_partkey = p.p_partkey)
      |SELECT ym,
      |  sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT AS promo_rc,
      |  sum(rev)::BIGINT AS total_rc,
      |  round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::DOUBLE /
      |        sum(rev)::DOUBLE, 6) AS promo_share
      |FROM l GROUP BY ym ORDER BY ym""".stripMargin

  // -------------------------------------------------------------- q131

  /** Disjunctive multi-attribute join predicates (TPC-H Q19 shape):
    * three OR-ed brand/size/quantity bands evaluated inside the join.
    * One broadcast hash join on partkey with the disjunction as a
    * residual filter — not three scans. */
  val disjunctiveJoin: Q = (s, dir) => {
    val rev = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    val bands =
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#15" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 50))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey") && bands)
      .agg(count(lit(1)).as("n_items"), sum(rev).as("revenue_rc"))
  }

  val disjunctiveJoinSql: String =
    """SELECT count(*)::BIGINT AS n_items,
      |  sum(round(l_extendedprice * 100)::BIGINT *
      |      (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_rc
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  // -------------------------------------------------------------- q132

  /** Waiting-supplier analysis (TPC-H Q21 shape, "late" = shipped more
    * than 45 days after the order date on a finished order): suppliers
    * who were the SOLE late supplier on a multi-supplier order. The
    * engine runs the decorrelated aggregate form (per-(order, supplier)
    * late flags → per-order counts — two keyed shuffles, no self-join
    * explosion); the DuckDB oracle states it as the textbook
    * EXISTS / NOT EXISTS correlated query, so the rewrite's equivalence
    * is itself what gets verified. */
  val waitingSupplier: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = t(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
    val perSupp = l.groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 45 DAYS"), 1).otherwise(0)).as("late"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum("late").as("nl"))
    perSupp.filter(col("late") === 1)
      .join(perOrder.filter(col("ns") > 1 && col("nl") === 1), "l_orderkey")
      .groupBy("l_suppkey").agg(count(lit(1)).as("waiting_orders"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "waiting_orders")
      .orderBy(col("waiting_orders").desc, col("s_name"))
      .limit(10)
  }

  val waitingSupplierSql: String =
    """WITH lo AS (
      |  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F')
      |SELECT s.s_name, count(DISTINCT l1.l_orderkey)::BIGINT AS waiting_orders
      |FROM lo l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
      |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 45 DAY
      |  AND EXISTS (SELECT 1 FROM lo l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lo l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l3.o_orderdate + INTERVAL 45 DAY)
      |GROUP BY s.s_name
      |ORDER BY waiting_orders DESC, s_name LIMIT 10""".stripMargin

  // -------------------------------------------------------------- q133

  /** Lapsed high-balance customers (TPC-H Q22 shape, adapted: no phone
    * country codes in this schema, and every customer has SOME order —
    * so "inactive" means no order since 2000-01-01). "Above average
    * balance" is the integer cross-multiplication cents*cnt > total —
    * no double average anywhere, so the comparison is exact. */
  val lapsedHighBalance: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
      round(col("c_acctbal") * 100).cast("long").as("cents"))
    val stats = c.filter(col("cents") > 0)
      .agg(sum("cents").as("tot"), count(lit(1)).as("cnt"))
    val active = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    c.join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(stats))
      .filter(col("cents") * col("cnt") > col("tot"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("bal_cents"))
      .orderBy("n_name")
  }

  val lapsedHighBalanceSql: String =
    """WITH c AS (SELECT c_custkey, c_nationkey,
      |                  round(c_acctbal * 100)::BIGINT AS cents FROM customer),
      |s AS (SELECT sum(cents) AS tot, count(*) AS cnt FROM c WHERE cents > 0)
      |SELECT n.n_name, count(*)::BIGINT AS n_cust,
      |       sum(c.cents)::BIGINT AS bal_cents
      |FROM c, s
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.cents * s.cnt > s.tot
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY n.n_name ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------- q134

  /** Typed Dataset surface (SURVEY §2.10 row→bean path, taken further):
    * KeyValueGroupedDataset.mapGroups with hand-rolled per-group state —
    * the "custom per-group imperative logic" escape hatch. The group
    * iterator streams (no per-group materialization), so a group larger
    * than memory still works; the oracle proves the typed path agrees
    * with the declarative GROUP BY it replaces. */
  val typedGroupStats: Q = (s, dir) => {
    import s.implicits._
    val ds = t(s, dir, "customer")
      .select(col("c_nationkey").cast("int"),
        round(col("c_acctbal") * 100).cast("long"))
      .as[(Int, Long)]
    ds.groupByKey(_._1)
      .mapGroups { (k, it) =>
        var n = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var sm = 0L
        it.foreach { case (_, c) =>
          n += 1; if (c < mn) mn = c; if (c > mx) mx = c; sm += c
        }
        (k, n, mn, mx, sm)
      }
      .toDF("n_nationkey", "n_cust", "min_cents", "max_cents", "sum_cents")
      .orderBy("n_nationkey")
  }

  val typedGroupStatsSql: String =
    """SELECT c_nationkey AS n_nationkey, count(*)::BIGINT AS n_cust,
      |  min(round(c_acctbal * 100)::BIGINT) AS min_cents,
      |  max(round(c_acctbal * 100)::BIGINT) AS max_cents,
      |  sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS sum_cents
      |FROM customer GROUP BY 1 ORDER BY n_nationkey""".stripMargin

  // -------------------------------------------------------------- q135

  /** Generator battery: posexplode (ordinal-preserving explode) over the
    * first three tokens of each document, plus stack (key-value unpivot
    * generator) over two metadata columns, unioned into one long table.
    * All map-side; the only exchange is the presentation sort. */
  val generators: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      posexplode(slice(TextOps.tokens(col("text")), 1, 3)))
      .select(col("doc_id"), lit("tok").as("kind"),
        col("pos").cast("int").as("pos"), col("col").as("val"))
    val meta = docs
      .selectExpr("doc_id", "stack(2, 'lang', lang, 'source', source) AS (kind, val)")
      .select(col("doc_id"), col("kind"), lit(-1).as("pos"), col("val"))
    toks.unionByName(meta).orderBy("doc_id", "kind", "pos")
  }

  val generatorsSql: String =
    s"""WITH t AS (SELECT doc_id, ${Fragments.ToksSql} AS toks FROM documents)
       |SELECT doc_id, 'tok' AS kind, (g.i - 1)::INT AS pos,
       |       toks[g.i::INT] AS val
       |FROM t CROSS JOIN generate_series(1, 3) g(i) WHERE g.i <= len(toks)
       |UNION ALL SELECT doc_id, 'lang', -1, lang FROM documents
       |UNION ALL SELECT doc_id, 'source', -1, source FROM documents
       |ORDER BY doc_id, kind, pos""".stripMargin

  // -------------------------------------------------------------- q136

  /** Exact set-similarity self-join (prefix filtering) over word
    * 3-shingle sets at Jaccard >= 4/5 — the same shingle space as q32's
    * MinHash-LSH but EXACT: [[graft.llm.SetSimilarity]] prunes with
    * rarest-token prefixes instead of probabilistic bands, and the
    * oracle recomputes the truth from full intersections. Counts are
    * exact integers; no similarity doubles are emitted at all. */
  val setsimJoin: Q = (s, dir) => {
    val sh = t(s, dir, "documents").select(col("doc_id").as("id"),
      TextOps.wordShingles(col("text"), 3).as("toks"))
    SetSimilarity.selfJoinPairs(sh, num = 4, den = 5)
      .orderBy("doc_a", "doc_b")
  }

  val setsimJoinSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
       |           for i in range(1, len(toks)-1)]) AS shingles
       |  FROM (SELECT doc_id, ${Fragments.ToksSql} AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |tk AS (SELECT doc_id, unnest(shingles) AS tok FROM sh
       |       WHERE len(shingles) > 0),
       |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
       |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |       FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter::INT AS inter,
       |       (sa.n + sb.n - inter)::INT AS uni
       |FROM iv JOIN sz sa ON iv.doc_a = sa.doc_id
       |        JOIN sz sb ON iv.doc_b = sb.doc_id
       |WHERE inter * 5 >= (sa.n + sb.n - inter) * 4
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------- q137

  /** Contingency/lift table in exact integers: observed cell counts of
    * (priority × status) against the independence expectation, compared
    * by cross-multiplication (n·obs vs row·col) so no expected-count
    * division ever happens. The windows run over the 15-row aggregate,
    * not the fact table. */
  val contingency: Q = (s, dir) => {
    val cells = t(s, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("obs"))
    cells
      .withColumn("row_tot",
        sum("obs").over(Window.partitionBy("o_orderpriority")))
      .withColumn("col_tot",
        sum("obs").over(Window.partitionBy("o_orderstatus")))
      .withColumn("n", sum("obs").over(Window.partitionBy()))
      .withColumn("over_rep",
        col("n") * col("obs") > col("row_tot") * col("col_tot"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  val contingencySql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS obs
      |  FROM orders GROUP BY 1, 2),
      |w AS (
      |  SELECT o_orderpriority, o_orderstatus, obs,
      |    (sum(obs) OVER (PARTITION BY o_orderpriority))::BIGINT AS row_tot,
      |    (sum(obs) OVER (PARTITION BY o_orderstatus))::BIGINT AS col_tot,
      |    (sum(obs) OVER ())::BIGINT AS n
      |  FROM cells)
      |SELECT o_orderpriority, o_orderstatus, obs, row_tot, col_tot, n,
      |       n * obs > row_tot * col_tot AS over_rep
      |FROM w ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  // -------------------------------------------------------------- q138

  /** Trailing-window anomaly flags, exact: an order is anomalous when
    * its price is more than 3 trailing standard deviations from the
    * trailing-5-order mean. (n·x − Σ)² > 9·(n·Σx² − Σ²) is the 3σ test
    * cleared of every division and square root, so the flag is a pure
    * BIGINT comparison — bit-identical in any engine. */
  val windowAnomaly: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-5, -1)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("s1", sum("cents").over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
      .withColumn("anomaly",
        col("trail_n") >= 3 &&
          (col("trail_n") * col("cents") - col("s1")) *
            (col("trail_n") * col("cents") - col("s1")) >
          lit(9L) * (col("trail_n") * col("s2") - col("s1") * col("s1")))
      .select("o_orderkey", "cents", "trail_n", "anomaly")
      .transform(graft.Presentation.sort(_, "o_orderkey"))
  }

  val windowAnomalySql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
      |                  round(o_totalprice * 100)::BIGINT AS cents FROM orders),
      |w AS (
      |  SELECT o_orderkey, cents,
      |    count(*) OVER tw AS trail_n,
      |    sum(cents) OVER tw AS s1,
      |    sum(cents * cents) OVER tw AS s2
      |  FROM o
      |  WINDOW tw AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
      |SELECT o_orderkey, cents, trail_n::BIGINT AS trail_n,
      |  (trail_n >= 3 AND
      |   (trail_n * cents - s1) * (trail_n * cents - s1) >
      |   9 * (trail_n * s2 - s1 * s1)) AS anomaly
      |FROM w ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- q139

  /** Two-stage retrieval cascade (the production ANN serving pattern):
    * a cheap coarse score — dot product on the first 16 of 64 dims —
    * prunes the corpus to 50 candidates per query, then the exact
    * full-dimension dot product reranks to the final top-10. Both ranks
    * order by ROUNDED scores with id tie-breaks (the q34 discipline), so
    * candidate sets and ranks are engine-portable. Corpus is scanned
    * once against broadcast queries — no shuffle before the top-k. */
  val rerankCascade: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("cv"))
    val coarse = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cs", round(graft.functions.VectorOps.dotProduct(
        slice(col("qv"), 1, 16), slice(col("cv"), 1, 16)), 4))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("cs").desc, col("neighbor_id").asc)
    val kept = coarse.withColumn("crk", row_number().over(w1))
      .filter(col("crk") <= 50)
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("fs").desc, col("neighbor_id").asc)
    kept.withColumn("fs", round(graft.functions.VectorOps.dotProduct(
        col("qv"), col("cv")), 4))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= 10)
      .select("query_id", "neighbor_id", "fs", "rk")
      .orderBy("query_id", "rk")
  }

  val rerankCascadeSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      |      FROM embeddings),
      |coarse AS (
      |  SELECT query_id, neighbor_id, qv, cv,
      |         round(list_dot_product(qv[1:16], cv[1:16]), 4) AS cs
      |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
      |kept AS (
      |  SELECT * FROM coarse
      |  QUALIFY row_number() OVER (PARTITION BY query_id
      |                             ORDER BY cs DESC, neighbor_id ASC) <= 50),
      |fin AS (SELECT query_id, neighbor_id,
      |               round(list_dot_product(qv, cv), 4) AS fs FROM kept)
      |SELECT query_id, neighbor_id, fs,
      |  (row_number() OVER (PARTITION BY query_id
      |                      ORDER BY fs DESC, neighbor_id ASC))::INTEGER AS rk
      |FROM fin
      |QUALIFY rk <= 10 ORDER BY query_id, rk""".stripMargin

  // -------------------------------------------------------------- q140

  /** As-of join with tolerance ([[graft.operators.AsOf.joinWithin]]):
    * each click matched to the user's most recent prior view, but only
    * if it happened within the last hour — older matches are nulled,
    * the click row survives (pandas merge_asof(tolerance=...) / kdb wj
    * semantics). Oracle: DuckDB native ASOF LEFT JOIN + the same
    * millisecond-floor tolerance test. */
  val asofTolerance: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    graft.operators.AsOf.joinWithin(clicks, views, key = "user_id",
        leftTs = "ts", rightTs = "ts", tolMillis = 3600L * 1000,
        rightCols = Seq("view_id"), rightTieBreak = "view_id")
      .select(col("event_id"), col("user_id"), col("view_id"))
      .orderBy("event_id")
  }

  val asofToleranceSql: String =
    """SELECT c.event_id, c.user_id,
      |  CASE WHEN v.ts IS NOT NULL
      |        AND epoch_ms(c.ts) - epoch_ms(v.ts) <= 3600000
      |       THEN v.view_id END AS view_id
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS view_id FROM events
      |                WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin

  // -------------------------------------------------------------- q141

  /** Relational Count-Min sketch (Cormode & Muthukrishnan 2005): the
    * sketch IS a (depth, bucket) → count table — built with one
    * map-combinable groupBy, merged by addition, O(d·w) rows total no
    * matter the corpus size. Estimates for the top-20 exact tokens come
    * from a broadcast join against the sketch; the CMS overestimate
    * guarantee (est >= exact, always) is emitted as a checkable boolean.
    * Hashes are md5-derived (the [[Fragments.splitBucket]] trick) so the
    * oracle replays the sketch bit-for-bit. */
  val countMin: Q = (s, dir) => {
    val depth = 4
    val width = 1024
    def bucket(d: Int, tok: org.apache.spark.sql.Column) =
      Fragments.hashBucket(concat(lit(d.toString), lit(":"), tok), width)
    def fanout(d: Int, tok: org.apache.spark.sql.Column) =
      struct(lit(d).as("d"), bucket(d, tok).as("b"))
    val toks = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
    // one pass over the tokens: each occurrence fans out to its d
    // (depth, bucket) cells map-side, then one map-combinable groupBy
    val sk = toks
      .select(explode(array((0 until depth).map(fanout(_, col("tok"))): _*)).as("db"))
      .select(col("db.d").as("d"), col("db.b").as("b"))
      .groupBy("d", "b").agg(count(lit(1)).as("c"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val top = exact.orderBy(col("exact").desc, col("tok").asc).limit(20)
    // same one-pass fan-out for the probes: the top-20 aggregate+sort
    // evaluates once, not once per depth
    val probes = top
      .select(col("tok"), col("exact"),
        explode(array((0 until depth).map(fanout(_, col("tok"))): _*)).as("db"))
      .select(col("tok"), col("exact"),
        col("db.d").as("d"), col("db.b").as("b"))
    probes.join(broadcast(sk), Seq("d", "b"))
      .groupBy("tok", "exact").agg(min("c").as("cms_est"))
      .withColumn("never_under", col("cms_est") >= col("exact"))
      .orderBy(col("exact").desc, col("tok").asc)
  }

  val countMinSql: String = {
    def bucketSql(tokExpr: String) =
      Fragments.hashBucketSql(s"d.d::VARCHAR || ':' || $tokExpr", 1024)
    s"""WITH toks AS (SELECT unnest(${Fragments.ToksSql}) AS tok FROM documents),
       |d AS (SELECT unnest([0, 1, 2, 3]) AS d),
       |sk AS (
       |  SELECT d.d, ${bucketSql("tok")} AS b, count(*)::BIGINT AS c
       |  FROM toks CROSS JOIN d GROUP BY 1, 2),
       |exact AS (SELECT tok, count(*)::BIGINT AS exact FROM toks GROUP BY 1
       |          ORDER BY exact DESC, tok ASC LIMIT 20),
       |probe AS (
       |  SELECT exact.tok, exact.exact, d.d, ${bucketSql("exact.tok")} AS b
       |  FROM exact CROSS JOIN d)
       |SELECT p.tok, p.exact, min(sk.c)::BIGINT AS cms_est,
       |       min(sk.c) >= p.exact AS never_under
       |FROM probe p JOIN sk ON p.d = sk.d AND p.b = sk.b
       |GROUP BY 1, 2 ORDER BY exact DESC, tok ASC""".stripMargin
  }

  // -------------------------------------------------------------- q142

  /** Per-group winsorization at explicit integer order statistics: the
    * p05/p95 cut points are the ceil(n/20)-th and ceil(19n/20)-th
    * smallest cents values — rank arithmetic, not quantile functions, so
    * both engines pick the IDENTICAL element with no interpolation
    * doubles anywhere. Clipped sums stay exact BIGINTs. */
  val winsorize: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long").as("cents"))
    val wseg = Window.partitionBy("c_mktsegment")
    val wrank = wseg.orderBy(col("cents").asc)
    val ranked = c
      .withColumn("rk", row_number().over(wrank))
      .withColumn("n", count(lit(1)).over(wseg))
      .withColumn("lo_rk", ((col("n") + 19) / 20).cast("long"))
      .withColumn("hi_rk", ((col("n") * 19 + 19) / 20).cast("long"))
    val cuts = ranked
      .groupBy("c_mktsegment")
      .agg(max(when(col("rk") === col("lo_rk"), col("cents"))).as("lo"),
        max(when(col("rk") === col("hi_rk"), col("cents"))).as("hi"))
    c.join(broadcast(cuts), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        max("lo").as("lo_cents"), max("hi").as("hi_cents"),
        sum(greatest(col("lo"), least(col("cents"), col("hi")))).as("clipped_sum"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).as("n_clipped"))
      .orderBy("c_mktsegment")
  }

  val winsorizeSql: String =
    """WITH c AS (SELECT c_mktsegment,
      |                  round(c_acctbal * 100)::BIGINT AS cents FROM customer),
      |r AS (
      |  SELECT c_mktsegment, cents,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents ASC) AS rk,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM c),
      |cuts AS (
      |  SELECT c_mktsegment,
      |    max(CASE WHEN rk = (n + 19) // 20 THEN cents END) AS lo,
      |    max(CASE WHEN rk = (n * 19 + 19) // 20 THEN cents END) AS hi
      |  FROM r GROUP BY 1)
      |SELECT c.c_mktsegment, count(*)::BIGINT AS n,
      |  max(cuts.lo)::BIGINT AS lo_cents, max(cuts.hi)::BIGINT AS hi_cents,
      |  sum(greatest(cuts.lo, least(c.cents, cuts.hi)))::BIGINT AS clipped_sum,
      |  sum(CASE WHEN c.cents < cuts.lo OR c.cents > cuts.hi
      |           THEN 1 ELSE 0 END)::BIGINT AS n_clipped
      |FROM c JOIN cuts USING (c_mktsegment)
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------------------- q143

  /** Inverted-index build (keyword-search complement to the ANN index
    * [[graft.llm.AnnIndex]]): per token, document frequency, total term
    * frequency, and a HEAD-CAPPED posting list (first 8 doc ids). The
    * cap is applied with a per-token rank BEFORE any list is collected,
    * so no executor ever materializes a stopword's full posting list —
    * the classic unbounded-collect trap at 100 TB. Only tokens with
    * df >= 5 are emitted (index pruning). */
  val invertedIndex: Q = (s, dir) => {
    val pairs = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val stats = pairs.groupBy("tok")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .filter(col("df") >= 5)
    val head = pairs.select("tok", "doc_id").distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("tok").orderBy(col("doc_id").asc)))
      .filter(col("rk") <= 8)
      .groupBy("tok")
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id")))).as("head"))
    stats.join(head, "tok")
      .select("tok", "df", "tf", "head")
      .orderBy("tok")
  }

  val invertedIndexSql: String =
    s"""WITH pairs AS (
       |  SELECT doc_id, unnest(${Fragments.ToksSql}) AS tok FROM documents),
       |stats AS (
       |  SELECT tok, count(*)::BIGINT AS tf,
       |         count(DISTINCT doc_id)::BIGINT AS df
       |  FROM pairs GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5),
       |ranked AS (
       |  SELECT DISTINCT tok, doc_id FROM pairs),
       |head AS (
       |  SELECT tok, array_to_string(list_sort(list(doc_id)), ',') AS head
       |  FROM (SELECT tok, doc_id,
       |          row_number() OVER (PARTITION BY tok ORDER BY doc_id ASC) AS rk
       |        FROM ranked) WHERE rk <= 8 GROUP BY tok)
       |SELECT s.tok, s.df, s.tf, h.head
       |FROM stats s JOIN head h ON s.tok = h.tok
       |ORDER BY s.tok""".stripMargin

  // -------------------------------------------------------------- q144

  /** Data-quality audit suite (the pipeline admission gate a 100 TB
    * ingest runs before anything else): referential integrity (orphan
    * facts), primary-key uniqueness, null checks, and domain-range
    * checks, each ONE aggregate pass over its table, emitted as a long
    * (rule, violations) table. Anti-joins use the keyed-shuffle plan
    * Spark picks for large-large; every count is map-combinable. */
  val dqAudit: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    def one(rule: String, d: org.apache.spark.sql.DataFrame) =
      d.agg(count(lit(1)).as("violations")).withColumn("rule", lit(rule))
    val checks = Seq(
      one("lineitem_orphan_order",
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")),
      one("orders_orphan_customer",
        o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")),
      one("lineitem_null_quantity", li.filter(col("l_quantity").isNull)),
      one("lineitem_quantity_range",
        li.filter(!col("l_quantity").between(1, 50))),
      one("orders_dup_pk",
        o.groupBy("o_orderkey").agg(count(lit(1)).as("k"))
          .filter(col("k") > 1)),
      one("customer_null_name", c.filter(col("c_name").isNull)),
      one("orders_bad_status",
        o.filter(!col("o_orderstatus").isin("F", "O", "P"))))
    checks.reduce(_.unionByName(_))
      .select("rule", "violations")
      .orderBy("rule")
  }

  val dqAuditSql: String =
    """SELECT 'lineitem_orphan_order' AS rule, count(*)::BIGINT AS violations
      |FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'orders_orphan_customer', count(*)::BIGINT FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem_null_quantity', count(*)::BIGINT FROM lineitem
      |WHERE l_quantity IS NULL
      |UNION ALL
      |SELECT 'lineitem_quantity_range', count(*)::BIGINT FROM lineitem
      |WHERE NOT (l_quantity BETWEEN 1 AND 50)
      |UNION ALL
      |SELECT 'orders_dup_pk', count(*)::BIGINT FROM
      |  (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'customer_null_name', count(*)::BIGINT FROM customer
      |WHERE c_name IS NULL
      |UNION ALL
      |SELECT 'orders_bad_status', count(*)::BIGINT FROM orders
      |WHERE o_orderstatus NOT IN ('F', 'O', 'P')
      |ORDER BY rule""".stripMargin

  // -------------------------------------------------------------- q145

  /** Bitwise-aggregate battery (compact categorical presence encoding —
    * the "feature bitmap" pattern): each customer's order-priority usage
    * folds into one 5-bit mask via bit_or, then the mask distribution is
    * profiled with bit_count. Two map-combinable aggregations; the mask
    * domain (2⁵) bounds the second shuffle no matter the scale. */
  val bitmaskAgg: Q = (s, dir) => {
    val masks = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("pbit", expr(
        "shiftleft(1, cast(substring(o_orderpriority, 1, 1) AS INT) - 1)"))
      .groupBy("o_custkey")
      .agg(expr("bit_or(pbit)").cast("int").as("mask"))
    masks.groupBy("mask")
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("n_priorities", expr("bit_count(mask)").cast("int"))
      .select("mask", "n_priorities", "n_customers")
      .orderBy("mask")
  }

  val bitmaskAggSql: String =
    """WITH m AS (
      |  SELECT o_custkey,
      |    bit_or(1 << (substr(o_orderpriority, 1, 1)::INT - 1))::INT AS mask
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |SELECT mask, bit_count(mask)::INT AS n_priorities,
      |       count(*)::BIGINT AS n_customers
      |FROM m GROUP BY mask ORDER BY mask""".stripMargin

  // -------------------------------------------------------------- q146

  /** Session co-occurrence mining: which event types happen together in
    * the same session (30-minute-gap sessionization, q61's islands
    * logic), counted as unordered type pairs across sessions. The pair
    * join runs on (user, session) keys over the DISTINCT per-session
    * type sets — at most |types|² rows per session, never event×event. */
  val sessionPairs: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = t(s, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum("brk").over(run))
      .select("user_id", "session_id", "event_type").distinct()
    st.as("a").join(st.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_id") === col("b.session_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("type_a", "type_b")
  }

  val sessionPairsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR datediff('second', lag(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM s),
      |st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       count(*)::BIGINT AS n_sessions
      |FROM st a JOIN st b
      |  ON a.user_id = b.user_id AND a.session_id = b.session_id
      | AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin

  // -------------------------------------------------------------- q147

  /** q60's as-of query through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]] — custom LogicalPlan + SparkStrategy
    * + SparkPlan, the (c)-tier extension point): per-side hash cluster +
    * sort, one forward merge per partition, O(1) merge state. Same
    * DuckDB ASOF LEFT JOIN oracle as q60, so the custom operator is
    * held to the exact same truth as the composition it replaces. */
  val asofMerge: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    graft.operators.AsOf.joinMerge(clicks, purchases, key = "user_id",
        leftTs = "ts", rightKey = "p_user", rightTs = "p_ts",
        rightTieBreak = "purchase_id")
      .select("event_id", "user_id", "purchase_id", "purchase_value")
      .orderBy("event_id")
  }

  val asofMergeSql: String =
    """SELECT c.event_id, c.user_id, p.purchase_id, p.purchase_value
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id,
      |                       value AS purchase_value
      |                FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  // -------------------------------------------------------------- q148

  /** Multiset set operations (EXCEPT ALL / INTERSECT ALL — §2.7's
    * bag-semantics half, q22–q24 cover the DISTINCT half): the priority
    * multiset of finished orders minus/intersected-with that of open
    * orders, then folded to per-priority cardinalities. Spark plans both
    * as one aggregate computing per-side counts + a generate replaying
    * min/difference counts — no row-by-row anti-join. */
  val setOpsAll: Q = (s, dir) => {
    val f = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority").as("pri"))
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_orderpriority").as("pri"))
    val ex = f.exceptAll(o).groupBy("pri")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val in = f.intersectAll(o).groupBy("pri")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ex.unionByName(in).select("op", "pri", "n").orderBy("op", "pri")
  }

  val setOpsAllSql: String =
    """WITH f AS (SELECT o_orderpriority AS pri FROM orders
      |           WHERE o_orderstatus = 'F'),
      |o AS (SELECT o_orderpriority AS pri FROM orders
      |      WHERE o_orderstatus = 'O'),
      |ex AS (SELECT pri FROM f EXCEPT ALL SELECT pri FROM o),
      |io AS (SELECT pri FROM f INTERSECT ALL SELECT pri FROM o)
      |SELECT 'except_all' AS op, pri, count(*)::BIGINT AS n FROM ex GROUP BY 2
      |UNION ALL
      |SELECT 'intersect_all', pri, count(*)::BIGINT FROM io GROUP BY 2
      |ORDER BY op, pri""".stripMargin

  // -------------------------------------------------------------- q149

  /** Relational division ("for all" queries): customers who placed
    * orders in EVERY priority class. The engine runs the
    * division-by-counting form (one keyed count-distinct vs the divisor
    * cardinality — two map-combinable aggregates); the oracle runs the
    * textbook double-negated NOT EXISTS, so the classic rewrite is
    * verified, like q132's. */
  val relationalDivision: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val nPri = o.select(countDistinct("o_orderpriority").as("np"))
    o.groupBy("o_custkey")
      .agg(countDistinct("o_orderpriority").as("k"))
      .crossJoin(broadcast(nPri))
      .filter(col("k") === col("np"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val relationalDivisionSql: String =
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderpriority = p.o_orderpriority))
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q150

  /** Value-window battery (first_value / last_value / nth_value over the
    * FULL frame): each customer's first, latest, and third order price,
    * one row per customer via rank-1 selection. The frame is explicit
    * (unbounded both ways) because last_value's default frame ends at
    * the current row — the classic silent-wrong-answer trap. */
  val valueWindows: Q = (s, dir) => {
    val ord = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("first_cents", first("cents").over(full))
      .withColumn("last_cents", last("cents").over(full))
      .withColumn("third_cents", nth_value(col("cents"), 3).over(full))
      .withColumn("rk", row_number().over(ord))
      .filter(col("rk") === 1)
      .select("o_custkey", "first_cents", "last_cents", "third_cents")
      .transform(graft.Presentation.sort(_, "o_custkey"))
  }

  val valueWindowsSql: String =
    """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey,
      |                  round(o_totalprice * 100)::BIGINT AS cents FROM orders),
      |w AS (
      |  SELECT o_custkey,
      |    first_value(cents) OVER fw AS first_cents,
      |    last_value(cents) OVER fw AS last_cents,
      |    nth_value(cents, 3) OVER fw AS third_cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate ASC, o_orderkey ASC) AS rk
      |  FROM o
      |  WINDOW fw AS (PARTITION BY o_custkey
      |                ORDER BY o_orderdate ASC, o_orderkey ASC
      |                ROWS BETWEEN UNBOUNDED PRECEDING
      |                         AND UNBOUNDED FOLLOWING))
      |SELECT o_custkey, first_cents, last_cents, third_cents
      |FROM w WHERE rk = 1 ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------- q151

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): null keys
    * match EACH OTHER, unlike `=`. Spark still plans a hash join
    * (EqualNullSafe is a valid equi-key), so the null bucket behaves
    * like any other key — no fallback to nested-loop. Null keys are
    * derived deterministically (every 7th customer's nation nulled). */
  val nullsafeJoin: Q = (s, dir) => {
    val c = t(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("int"))
          .otherwise(col("c_nationkey")).as("k"))
    val n = t(s, dir, "nation")
      .select(when(col("n_nationkey") === 0, lit(null).cast("int"))
        .otherwise(col("n_nationkey")).as("k"), col("n_name"))
    c.join(n, c("k") <=> n("k"))
      .groupBy(when(n("k").isNull, lit("NULL_BUCKET"))
        .otherwise(n("n_name")).as("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("n_name")
  }

  val nullsafeJoinSql: String =
    """WITH c AS (SELECT c_custkey,
      |             CASE WHEN c_custkey % 7 = 0 THEN NULL
      |                  ELSE c_nationkey END AS k FROM customer),
      |n AS (SELECT CASE WHEN n_nationkey = 0 THEN NULL
      |             ELSE n_nationkey END AS k, n_name FROM nation)
      |SELECT CASE WHEN n.k IS NULL THEN 'NULL_BUCKET'
      |            ELSE n.n_name END AS n_name,
      |       count(*)::BIGINT AS n_cust
      |FROM c JOIN n ON c.k IS NOT DISTINCT FROM n.k
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------- q152

  /** GROUPING() markers over a rollup: the function that tells a
    * super-aggregate NULL from a data NULL — q07's rollup surface
    * completed with the identification half. grouping_id() gives the
    * composite level as one integer. */
  val groupingId: Q = (s, dir) => {
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        grouping("o_orderstatus").cast("int").as("g_status"),
        grouping("o_orderpriority").cast("int").as("g_priority"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("g_status"), col("g_priority"), col("gid"), col("n"))
      .orderBy("gid", "status", "priority")
  }

  val groupingIdSql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |       coalesce(o_orderpriority, '(all)') AS priority,
      |       GROUPING(o_orderstatus)::INT AS g_status,
      |       GROUPING(o_orderpriority)::INT AS g_priority,
      |       GROUPING(o_orderstatus, o_orderpriority)::INT AS gid,
      |       count(*)::BIGINT AS n
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  // -------------------------------------------------------------- q153

  /** Keyset-free pagination (ORDER BY … LIMIT … OFFSET): page 3 of the
    * customers by descending balance. Spark plans offset+limit as one
    * driver-merged top-(offset+limit) — fine for UI-page offsets; deep
    * offsets should switch to keyset predicates (WHERE k > last_seen),
    * which is the scan-pruned plan. */
  val pagination: Q = (s, dir) => {
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      .orderBy(col("bal_cents").desc, col("c_custkey").asc)
      .offset(40)
      .limit(20)
  }

  val paginationSql: String =
    """SELECT c_custkey, c_name, round(c_acctbal * 100)::BIGINT AS bal_cents
      |FROM customer
      |ORDER BY bal_cents DESC, c_custkey ASC
      |LIMIT 20 OFFSET 40""".stripMargin

  // -------------------------------------------------------------- q154

  /** Date-spine zero-fill (the canonical BI gap-fill): a generated
    * calendar spine left-joins the daily order counts so quiet days
    * appear as explicit zeros. The spine is sequence() over the
    * observed [min, max] — one scalar agg + per-row explode, no
    * calendar table needed; the join is broadcast (the spine is tiny
    * relative to facts at any scale). One month window keeps the output
    * reviewable. */
  val dateSpine: Q = (s, dir) => {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-03-01").cast("timestamp"))
      .select(col("o_orderdate").cast("date").as("day"))
    val daily = o.groupBy("day").agg(count(lit(1)).as("n_orders"))
    val spine = o.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    spine.join(daily, Seq("day"), "left_outer")
      .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  val dateSpineSql: String =
    """WITH o AS (SELECT o_orderdate::DATE AS day FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |             AND o_orderdate < TIMESTAMP '1996-03-01'),
      |daily AS (SELECT day, count(*)::BIGINT AS n_orders FROM o GROUP BY 1),
      |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM o),
      |spine AS (SELECT unnest(generate_series(lo, hi,
      |                        INTERVAL 1 DAY))::DATE AS day FROM bounds)
      |SELECT s.day, coalesce(d.n_orders, 0)::BIGINT AS n_orders
      |FROM spine s LEFT JOIN daily d ON s.day = d.day
      |ORDER BY s.day""".stripMargin

  // -------------------------------------------------------------- q155

  /** Typed joinWith (§2.10 typed surface, the join half next to q134's
    * mapGroups): a Dataset-to-Dataset inner join that yields TUPLES of
    * the two case-class sides rather than a flattened row — the
    * type-safe join API. Planned as the same broadcast hash join as the
    * untyped form; the oracle proves tuple construction loses nothing. */
  val typedJoinWith: Q = (s, dir) => {
    import s.implicits._
    val custs = t(s, dir, "customer")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("int"),
        round(col("c_acctbal") * 100).cast("long"))
      .as[(Long, Int, Long)]
    val nations = t(s, dir, "nation")
      .select(col("n_nationkey").cast("int"), col("n_name")).as[(Int, String)]
    custs.joinWith(broadcast(nations), custs("c_nationkey") === nations("n_nationkey"))
      .map { case ((ck, _, cents), (_, nname)) => (ck, nname, cents) }
      .toDF("c_custkey", "n_name", "bal_cents")
      .filter(col("bal_cents") > 990000L)
      .orderBy("c_custkey")
  }

  val typedJoinWithSql: String =
    """SELECT c.c_custkey, n.n_name,
      |       round(c.c_acctbal * 100)::BIGINT AS bal_cents
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE round(c.c_acctbal * 100)::BIGINT > 990000
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q156

  /** Schema-evolution union (unionByName with allowMissingColumns — the
    * query-side twin of `WriteSpec.allowNewColumns`): two entity frames
    * with PARTIALLY overlapping columns union into the name-aligned
    * superset, absent columns null-filled. DuckDB's UNION ALL BY NAME is
    * the oracle twin, so the null-fill semantics are cross-checked. */
  val unionByNameEvolved: Q = (s, dir) => {
    val custs = t(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        lit("customer").as("kind"))
    val supps = t(s, dir, "supplier")
      .select(col("s_suppkey").as("id"), lit("supplier").as("kind"),
        round(col("s_acctbal") * 100).cast("long").as("bal_cents"))
    custs.unionByName(supps, allowMissingColumns = true)
      .orderBy("kind", "id")
  }

  val unionByNameEvolvedSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey AS id, c_name AS name, 'customer' AS kind
      |  FROM customer
      |  UNION ALL BY NAME
      |  SELECT s_suppkey AS id, 'supplier' AS kind,
      |         round(s_acctbal * 100)::BIGINT AS bal_cents
      |  FROM supplier)
      |ORDER BY kind, id""".stripMargin

  // -------------------------------------------------------------- q157

  /** Conditional distinct counts (count(DISTINCT CASE WHEN …)): per
    * order month, total distinct buyers next to the distinct buyers of
    * each priority tier — three distinct aggregates over one scan, the
    * expand + regroup plan. The CASE's ELSE NULL is what scopes each
    * distinct set. */
  val conditionalDistinct: Q = (s, dir) => {
    t(s, dir, "orders")
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      .agg(countDistinct(col("o_custkey")).as("buyers"),
        countDistinct(when(col("o_orderpriority") === "1-URGENT",
          col("o_custkey"))).as("urgent_buyers"),
        countDistinct(when(round(col("o_totalprice") * 100).cast("long") > 20000000L,
          col("o_custkey"))).as("big_buyers"))
      .orderBy("ym")
  }

  val conditionalDistinctSql: String =
    """SELECT (year(o_orderdate) * 100 + month(o_orderdate))::INT AS ym,
      |  count(DISTINCT o_custkey)::BIGINT AS buyers,
      |  count(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
      |                      THEN o_custkey END)::BIGINT AS urgent_buyers,
      |  count(DISTINCT CASE WHEN round(o_totalprice * 100)::BIGINT > 20000000
      |                      THEN o_custkey END)::BIGINT AS big_buyers
      |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin

  // -------------------------------------------------------------- q158

  /** Cumulative distinct users by day — the running-distinct shape that
    * a naive `count(DISTINCT) OVER (ORDER BY day)` cannot express
    * scalably. Standard rewrite: each user collapses to a first-seen
    * day (one keyed agg), daily new-user counts aggregate over that,
    * and a running sum over the tiny day series yields the cumulative
    * curve — O(users + days) rows shuffled, never (days × users). */
  val cumulativeDistinct: Q = (s, dir) => {
    val firstSeen = Tables.t(s, dir, "events")
      .groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("day"))
    firstSeen.groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users",
        sum("new_users").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  val cumulativeDistinctSql: String =
    """WITH fs AS (SELECT user_id, min(ts::DATE) AS day
      |            FROM events GROUP BY 1),
      |daily AS (SELECT day, count(*)::BIGINT AS new_users FROM fs GROUP BY 1)
      |SELECT day, new_users,
      |  (sum(new_users) OVER (ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
      |    AS cum_users
      |FROM daily ORDER BY day""".stripMargin

  // -------------------------------------------------------------- q159

  /** Keyset pagination — the SCALE path that q153's LIMIT/OFFSET form
    * documents but cannot be: the page after cursor (last_bal, last_id)
    * is `WHERE bal < last OR (bal = last AND id > last_id) ORDER BY bal
    * DESC, id LIMIT n`. The cursor predicate is on RAW columns, so it
    * reaches the parquet scan as a pushed filter (row groups above the
    * cursor are skipped entirely) and the plan is TakeOrderedAndProject
    * with NO offset — at a deep page the offset form materializes
    * offset+n rows on the driver, the keyset form always exactly n.
    * The cursor is a fixed literal (as a real paging API would receive
    * it from the previous response); tie-break id keeps it total. */
  val keysetPagination: Q = (s, dir) => {
    t(s, dir, "customer")
      .filter(col("c_acctbal") < 9900.0 ||
        (col("c_acctbal") === 9900.0 && col("c_custkey") > 0))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
  }

  val keysetPaginationSql: String =
    """SELECT c_custkey, c_name, round(c_acctbal * 100)::BIGINT AS bal_cents
      |FROM customer
      |WHERE c_acctbal < 9900.0 OR (c_acctbal = 9900.0 AND c_custkey > 0)
      |ORDER BY c_acctbal DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  // -------------------------------------------------------------- q213

  /** Pareto frontier (skyline) of orders over (o_orderdate, o_totalprice),
    * both maximized: an order survives iff no other order is at least as
    * late AND at least as expensive with one dimension strict — the
    * multi-criteria selection operator (Börzsönyi et al., ICDE '01
    * "The Skyline Operator"). The 2-D skyline needs NO dominance
    * self-join: group to the distinct-date spine keeping each date's max
    * price, one running-max window over dates descending (a row is
    * dominated exactly when some strictly-later date reaches its price),
    * then a broadcast join back picks the surviving rows. The spine is
    * calendar-bounded, so the window input stays O(dates) at any corpus
    * size; d>2 skylines decompose the same way (per-partition local
    * skyline, then skyline-of-skylines — skyline(∪Sᵢ) = skyline(∪
    * skyline(Sᵢ))). Prices compare/output as exact cents. */
  val paretoFrontier: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val grp = o.groupBy("o_orderdate").agg(max("o_totalprice").as("maxp"))
    val w = Window.orderBy(col("o_orderdate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = grp.withColumn("rm", max("maxp").over(w))
      .filter(col("rm").isNull || col("maxp") > col("rm"))
      .select(col("o_orderdate"), col("maxp"))
    o.join(broadcast(front), Seq("o_orderdate"))
      .filter(col("o_totalprice") === col("maxp"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .orderBy(col("o_date").desc, col("o_orderkey"))
  }

  val paretoFrontierSql: String =
    """WITH grp AS (
      |  SELECT o_orderdate, max(o_totalprice) AS maxp FROM orders GROUP BY 1),
      |front AS (
      |  SELECT o_orderdate, maxp,
      |    max(maxp) OVER (ORDER BY o_orderdate DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
      |  FROM grp)
      |SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
      |  round(o.o_totalprice * 100)::BIGINT AS price_cents
      |FROM orders o JOIN front f
      |  ON o.o_orderdate = f.o_orderdate AND o.o_totalprice = f.maxp
      |WHERE f.rm IS NULL OR f.maxp > f.rm
      |ORDER BY o_date DESC, o.o_orderkey""".stripMargin

  // -------------------------------------------------------------- q220

  /** Trailing-window distinct (q220): distinct active users over each
    * observed day's trailing 7-day window — the rolling-cardinality
    * shape Spark's window functions cannot express (no DISTINCT inside
    * a frame). Instead of a per-day self-join (O(days²) probes) each
    * distinct (day, user) pair is EXPLODED onto the ≤7 future days it
    * covers and the answer is one hash count-distinct per covered day —
    * the cover fan-out is a constant ×7, map-side, and the distinct
    * aggregation shuffles on the day key, so the plan is two keyed
    * shuffles at any scale (swap countDistinct for approx HLL when the
    * per-day user set itself is huge). A semi-join against observed
    * days drops cover rows that run past the series end. */
  val rollingDistinct: Q = (s, dir) => {
    // eager localCheckpoint: consumed by the day spine AND the cover
    // explode — unchecked, each branch re-runs the scan + distinct
    val pairs = Tables.t(s, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .localCheckpoint(true)
    val days = pairs.select(col("d").as("d2")).distinct()
    pairs
      .select(explode(sequence(col("d"), date_add(col("d"), 6))).as("d2"),
        col("user_id"))
      .join(days, Seq("d2"), "left_semi")
      .groupBy("d2")
      .agg(countDistinct("user_id").as("u7"), count(lit(1)).as("n_pairs"))
      .select(date_format(col("d2"), "yyyy-MM-dd").as("day"), col("u7"),
        col("n_pairs"))
      .orderBy("day")
  }

  val rollingDistinctSql: String =
    """WITH p AS (SELECT DISTINCT ts::DATE AS d, user_id FROM events),
      |days AS (SELECT DISTINCT d FROM p)
      |SELECT strftime(days.d, '%Y-%m-%d') AS day,
      |  count(DISTINCT p.user_id)::BIGINT AS u7,
      |  count(*)::BIGINT AS n_pairs
      |FROM days JOIN p ON p.d BETWEEN days.d - 6 AND days.d
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q231

  /** Brand association rules (q231): support / confidence / lift for
    * every co-ordered brand pair — market-basket mining over the order
    * "baskets", the transactional sibling of q137's contingency lift
    * and q186's text collocations. The basket table is the DISTINCT
    * (order, brand) projection, so the pair stage is an ORDER-KEYED
    * self-join with fan-out bounded by (brands-per-order)² — never an
    * all-pairs product — and brand marginals are a 25-row broadcast.
    * Counts are exact BIGINTs; confidence and lift are one fixed IEEE
    * division each over those integers, rounded at 6 dp. */
  // -------------------------------------------------------------- q292

  /** Frequent triple itemsets (q292): the A-priori level after q231's
    * pairs — brand triples co-purchased in ≥ 2 orders, with the
    * three-way lift P(abc)/(P(a)P(b)P(c)) = support·N²/(n_a·n_b·n_c)
    * as a half-away 4-dp integer quotient of exact counts. The double
    * self-join keys on the order id, so fan-out is C(k,3) per order —
    * bounded by basket size (≤ C(|brands|,3) distinct outputs), never
    * corpus-quadratic; marginals broadcast. Top-20 by support with a
    * full lexical tiebreak. */
  val tripleItemsets: Q = (s, dir) => {
    // IterFrame keyed on o — see assocRules: the width guard plus
    // exchange-free double self-join for the triple fan-out
    val baskets = graft.common.IterFrame.keyed(
      Tables.t(s, dir, "lineitem")
        .join(Tables.t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct(),
      col("o"))
    val marg = baskets.groupBy("b").agg(count(lit(1)).as("nb"))
    val tot = baskets.agg(countDistinct("o").as("nn"))
    baskets.as("x").join(baskets.as("y"), "o")
      .filter(col("x.b") < col("y.b"))
      .join(baskets.as("z"), "o")
      .filter(col("y.b") < col("z.b"))
      .groupBy(col("x.b").as("ba"), col("y.b").as("bb"),
        col("z.b").as("bc"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .join(broadcast(marg.select(col("b").as("ba"), col("nb").as("na"))), "ba")
      .join(broadcast(marg.select(col("b").as("bb"), col("nb").as("nb2"))), "bb")
      .join(broadcast(marg.select(col("b").as("bc"), col("nb").as("nc"))), "bc")
      .crossJoin(broadcast(tot))
      // DECIMAL(38) everywhere: support·nn²·2e4 can pass BIGINT at
      // scale, and so can the marginal products na·nb2·nc (~2^21 each
      // suffices to wrap BIGINT silently in non-ANSI Spark while the
      // DuckDB twin errors loudly) — widen na before BOTH products so
      // the whole quotient stays in wide decimal
      .withColumn("lift3", expr(
        "(CAST(support AS DECIMAL(38,0)) * nn * nn * 20000 + " +
        "(CAST(na AS DECIMAL(38,0)) * nb2 * nc)) DIV " +
        "(2 * CAST(na AS DECIMAL(38,0)) * nb2 * nc)").cast("double") / 10000.0)
      .select(col("ba"), col("bb"), col("bc"), col("support"), col("lift3"))
      .orderBy(col("support").desc, col("ba"), col("bb"), col("bc"))
      .limit(20)
  }

  val tripleItemsetsSql: String =
    """WITH baskets AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |marg AS (SELECT b, count(*)::BIGINT AS nb FROM baskets GROUP BY 1),
      |tot AS (SELECT count(DISTINCT o)::BIGINT AS nn FROM baskets),
      |tri AS (
      |  SELECT x.b AS ba, y.b AS bb, z.b AS bc, count(*)::BIGINT AS support
      |  FROM baskets x
      |  JOIN baskets y ON x.o = y.o AND x.b < y.b
      |  JOIN baskets z ON y.o = z.o AND y.b < z.b
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
      |SELECT ba, bb, bc, support,
      |  ((support::HUGEINT * nn * nn * 20000 + (ma.nb * mb.nb * mc.nb)) //
      |   (2 * ma.nb * mb.nb * mc.nb))::DOUBLE / 10000.0 AS lift3
      |FROM tri
      |JOIN marg ma ON ma.b = ba
      |JOIN marg mb ON mb.b = bb
      |JOIN marg mc ON mc.b = bc
      |CROSS JOIN tot
      |ORDER BY support DESC, ba, bb, bc LIMIT 20""".stripMargin

  val assocRules: Q = (s, dir) => {
    // the basket table feeds marginals, the grand total, and both
    // self-join sides — one scan+join, not four. Materialized through
    // the IterFrame width guard KEYED ON o (round-11: the sf10 probe
    // caught the bare-checkpoint version AQE-coalesced at 100×, its
    // basket self-join fanning out near-single-threaded — the same
    // class as the q116 loop); keying on o also hands both self-join
    // sides the same HashPartitioning, so the pair stage adds no
    // exchange at all
    val baskets = graft.common.IterFrame.keyed(
      Tables.t(s, dir, "lineitem")
        .join(Tables.t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct(),
      col("o"))
    val marg = baskets.groupBy("b").agg(count(lit(1)).as("nb"))
    val tot = baskets.agg(countDistinct("o").as("nn"))
    baskets.as("x").join(baskets.as("y"), "o")
      .filter(col("x.b") < col("y.b"))
      .groupBy(col("x.b").as("brand_a"), col("y.b").as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(marg.select(col("b").as("brand_a"),
        col("nb").as("n_a"))), "brand_a")
      .join(broadcast(marg.select(col("b").as("brand_b"),
        col("nb").as("n_b"))), "brand_b")
      .crossJoin(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("conf"),
        round(col("n_ab").cast("double") * col("nn").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  val assocRulesSql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |marg AS (SELECT b, count(*)::BIGINT AS nb FROM baskets GROUP BY 1),
      |tot AS (SELECT count(DISTINCT o)::BIGINT AS nn FROM baskets),
      |pairs AS (
      |  SELECT x.b AS brand_a, y.b AS brand_b, count(*)::BIGINT AS n_ab
      |  FROM baskets x JOIN baskets y ON x.o = y.o AND x.b < y.b
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, n_ab,
      |  round(n_ab::DOUBLE / ma.nb::DOUBLE, 6) AS conf,
      |  round(n_ab::DOUBLE * nn::DOUBLE / (ma.nb::DOUBLE * mb.nb::DOUBLE), 6)
      |    AS lift
      |FROM pairs
      |JOIN marg ma ON ma.b = brand_a
      |JOIN marg mb ON mb.b = brand_b
      |CROSS JOIN tot
      |ORDER BY brand_a, brand_b""".stripMargin

  // ----------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q220_rolling_distinct" -> rollingDistinct,
    "q231_assoc_rules" -> assocRules,
    "q292_triple_itemsets" -> tripleItemsets,
    "q129_mincost_supplier" -> mincostSupplier,
    "q130_promo_share" -> promoShare,
    "q131_disjunctive_join" -> disjunctiveJoin,
    "q132_waiting_supplier" -> waitingSupplier,
    "q133_lapsed_high_balance" -> lapsedHighBalance,
    "q134_typed_group_stats" -> typedGroupStats,
    "q135_generators" -> generators,
    "q136_setsim_join" -> setsimJoin,
    "q137_contingency" -> contingency,
    "q138_window_anomaly" -> windowAnomaly,
    "q139_rerank_cascade" -> rerankCascade,
    "q140_asof_tolerance" -> asofTolerance,
    "q141_countmin_sketch" -> countMin,
    "q142_winsorize" -> winsorize,
    "q143_inverted_index" -> invertedIndex,
    "q144_dq_audit" -> dqAudit,
    "q145_bitmask_agg" -> bitmaskAgg,
    "q146_session_pairs" -> sessionPairs,
    "q147_asof_merge" -> asofMerge,
    "q148_set_ops_all" -> setOpsAll,
    "q149_relational_division" -> relationalDivision,
    "q150_value_windows" -> valueWindows,
    "q151_nullsafe_join" -> nullsafeJoin,
    "q152_grouping_id" -> groupingId,
    "q153_pagination" -> pagination,
    "q154_date_spine" -> dateSpine,
    "q155_typed_joinwith" -> typedJoinWith,
    "q156_union_by_name" -> unionByNameEvolved,
    "q157_conditional_distinct" -> conditionalDistinct,
    "q158_cumulative_distinct" -> cumulativeDistinct,
    "q159_keyset_pagination" -> keysetPagination,
    "q213_pareto_frontier" -> paretoFrontier,
  )

  val oracleSql: Map[String, String] = Map(
    "q220_rolling_distinct" -> rollingDistinctSql,
    "q231_assoc_rules" -> assocRulesSql,
    "q292_triple_itemsets" -> tripleItemsetsSql,
    "q129_mincost_supplier" -> mincostSupplierSql,
    "q130_promo_share" -> promoShareSql,
    "q131_disjunctive_join" -> disjunctiveJoinSql,
    "q132_waiting_supplier" -> waitingSupplierSql,
    "q133_lapsed_high_balance" -> lapsedHighBalanceSql,
    "q134_typed_group_stats" -> typedGroupStatsSql,
    "q135_generators" -> generatorsSql,
    "q136_setsim_join" -> setsimJoinSql,
    "q137_contingency" -> contingencySql,
    "q138_window_anomaly" -> windowAnomalySql,
    "q139_rerank_cascade" -> rerankCascadeSql,
    "q140_asof_tolerance" -> asofToleranceSql,
    "q141_countmin_sketch" -> countMinSql,
    "q142_winsorize" -> winsorizeSql,
    "q143_inverted_index" -> invertedIndexSql,
    "q144_dq_audit" -> dqAuditSql,
    "q145_bitmask_agg" -> bitmaskAggSql,
    "q146_session_pairs" -> sessionPairsSql,
    "q147_asof_merge" -> asofMergeSql,
    "q148_set_ops_all" -> setOpsAllSql,
    "q149_relational_division" -> relationalDivisionSql,
    "q150_value_windows" -> valueWindowsSql,
    "q151_nullsafe_join" -> nullsafeJoinSql,
    "q152_grouping_id" -> groupingIdSql,
    "q153_pagination" -> paginationSql,
    "q154_date_spine" -> dateSpineSql,
    "q155_typed_joinwith" -> typedJoinWithSql,
    "q156_union_by_name" -> unionByNameEvolvedSql,
    "q157_conditional_distinct" -> conditionalDistinctSql,
    "q158_cumulative_distinct" -> cumulativeDistinctSql,
    "q159_keyset_pagination" -> keysetPaginationSql,
    "q213_pareto_frontier" -> paretoFrontierSql,
  )
}
