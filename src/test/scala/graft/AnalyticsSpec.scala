package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextOps

/** Ground-truth specs for the round-5 analytics operators
  * (queries/Analytics.scala). Value-level parity with DuckDB is driven
  * by the oracle gate; here we pin semantic invariants against local
  * brute force plus the plan shapes that keep the operators scale-safe. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docTokens: Map[Long, Seq[String]] =
    Tables.t(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap

  test("chunk_sliding matches brute-force windows (size 64, stride 32)") {
    val got = graft.queries.Analytics.chunkSliding(spark, sf)
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    val expect = docTokens.view.mapValues { toks =>
      (0 to math.max(toks.size - 1, 0) by 32).map { st =>
        val chunk = toks.slice(st, st + 64)
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (chunk.size, digest)
      }
    }.toMap
    assert(got === expect)
  }

  test("chunk_sliding covers every token and never shuffles the corpus") {
    // coverage: last chunk of each doc reaches the final token
    val last = graft.queries.Analytics.chunkSliding(spark, sf)
      .groupBy("doc_id").agg(max(col("chunk_idx") * 32 + col("n_tok")).as("end"))
      .as[(Long, Int)].collect().toMap
    docTokens.foreach { case (id, toks) =>
      assert(last(id) === toks.size, s"doc $id chunks must end at ${toks.size}")
    }
    val plan = graft.queries.Analytics.chunkSliding(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "chunking is map-side; only the presentation sort may exchange")
  }

  test("doc_frequency matches brute-force document frequencies") {
    val toks = docTokens
    val nd = toks.size
    val expect = toks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).filter(_._2 * 2 >= nd).toMap
    val got = graft.queries.Analytics.docFrequency(spark, sf)
      .select("tok", "df").as[(String, Long)].collect().toMap
    assert(got.view.mapValues(_.toInt).toMap === expect)
  }

  test("incremental_dedup admits exactly the unseen-fingerprint batch docs") {
    val fps = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", array_sort(array_distinct(TextOps.tokens(col("text"))))))
          .as("fp"))
      .as[(Long, String, String)].collect()
    val base = fps.filter(_._2 != "src19").map(_._3).toSet
    val expect = fps.filter(_._2 == "src19").groupBy(_._3).toSeq
      .collect { case (fp, ds) if !base.contains(fp) => ds.map(_._1).min }
      .sorted
    val got = graft.queries.Analytics.incrementalDedup(spark, sf)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === expect)
    // and some batch docs are actually rejected at the sf0.01 gate scale,
    // proving the anti-join fires (sf0.001 may legitimately admit all)
    val batchN = fps.count(_._2 == "src19")
    assert(got.size <= batchN)
  }

  test("hll_sketch_union estimate stays inside the 5% envelope") {
    val rows = graft.queries.Analytics.hllSketchUnion(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._3),
      s"HLL estimate drifted >5% from exact: ${rows.mkString(",")}")
  }

  test("dist_moments matches direct double computation within 1e-6") {
    val xs = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), round(col("l_quantity")).cast("long").as("x"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = graft.queries.Analytics.distMoments(spark, sf)
      .select("l_returnflag", "skew_qty", "kurt_qty")
      .as[(String, Double, Double)].collect()
      .map { case (f, sk, ku) => f -> (sk, ku) }.toMap
    xs.foreach { case (flag, v) =>
      val n = v.size.toDouble
      val mean = v.sum / n
      val m2 = v.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = v.map(x => (x - mean) * (x - mean) * (x - mean)).sum / n
      val m4 = v.map(x => (x - mean) * (x - mean) * (x - mean) * (x - mean)).sum / n
      val (gs, gk) = got(flag)
      assert(math.abs(gs - m3 / (m2 * math.sqrt(m2))) < 1e-6, s"skew($flag)")
      assert(math.abs(gk - (m4 / (m2 * m2) - 3.0)) < 1e-6, s"kurt($flag)")
    }
  }

  test("datetime_battery fields are internally consistent") {
    val rows = graft.queries.Analytics.datetimeBattery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (yr, qtr, mo) = (r.getAs[Int]("yr"), r.getAs[Int]("qtr"), r.getAs[Int]("mo"))
      assert(qtr === (mo - 1) / 3 + 1)
      assert((0 to 6).contains(r.getAs[Int]("dow_mon0")))
      assert(r.getAs[Int]("months_to_end") === (1998 * 12 + 8) - (yr * 12 + mo))
      val me = r.getAs[java.sql.Date]("month_end").toLocalDate
      assert(me.getDayOfMonth === me.lengthOfMonth, "month_end is the last day")
    }
  }

  test("regex battery extraction agrees with JSON parsing of props") {
    val rows = graft.queries.Analytics.regexBattery(spark, sf)
      .withColumn("k_json", get_json_object(col("props"), "$.k").cast("int"))
      .select("k_num", "k_json", "n_num").as[(Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (kNum, kJson, nNum) =>
      assert(kNum === kJson); assert(nNum === 1)
    }
  }

  test("mode_median mode is the true argmax count with min-key ties") {
    val ks = Tables.t(spark, sf, "events")
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int"))
      .as[(String, Int)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).groupBy(identity).view.mapValues(_.size).toMap).toMap
    val got = graft.queries.Analytics.modeMedian(spark, sf)
      .select("event_type", "mode_k", "mode_n").as[(String, Int, Long)].collect()
    got.foreach { case (t, k, n) =>
      val counts = ks(t)
      val maxN = counts.values.max
      assert(n === maxN, s"mode_n($t)")
      assert(k === counts.filter(_._2 == maxN).keys.min, s"tie-break($t)")
    }
  }

  test("misra-gries candidates are a superset of true heavy hitters on a skewed stream") {
    import org.apache.spark.sql.functions.udaf
    // vocabulary (400) ≫ capacity (16): the decrement/merge paths genuinely
    // fire. Zipf-ish skew: item i appears 40000/(i+1) times (deterministic).
    val stream = (0 until 400).flatMap(i => Seq.fill(40000 / (i + 1))(s"w$i"))
    val ds = spark.createDataset(stream).repartition(7) // force multi-buffer merge
    val k = 16
    val mg = udaf(graft.functions.MisraGries(k))
    val cand = ds.toDF("tok")
      .agg(mg(col("tok")).as("m"))
      .select(explode(map_keys(col("m"))).as("t")).as[String].collect().toSet
    assert(cand.size <= k, s"at most $k counters survive")
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size)
    val mustSurvive = exact.collect {
      case (t, c) if c.toLong * (k + 1) > n => t
    }.toSet
    assert(mustSurvive.nonEmpty, "fixture must contain true heavy hitters")
    assert(mustSurvive.subsetOf(cand),
      s"missing guaranteed heavy hitters: ${mustSurvive -- cand}")
  }

  test("heavy_hitters equals exact 1%-support counts and broadcasts candidates") {
    val toks = docTokens.values.flatten.toSeq
    val total = toks.size
    val expect = toks.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 * 100 >= total).toMap
    val got = graft.queries.Analytics.heavyHitters(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got.view.mapValues(_.toInt).toMap === expect)
    val plan = graft.queries.Analytics.heavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "candidate rescue must broadcast, not shuffle the token stream")
  }

  test("char_diversity matches brute-force histograms and stays in codegen") {
    val got = graft.queries.Analytics.charDiversity(spark, sf)
      .as[(Long, Int, Int, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val norm = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), TextOps.normalized(col("text")).as("s"))
      .as[(Long, String)].collect()
    norm.filter(_._2.nonEmpty).foreach { case (id, s) =>
      val counts = s.toSeq.groupBy(identity).view.mapValues(_.size).toMap
      val n = s.length.toDouble
      val sumSq = counts.values.map(c => c.toLong * c.toLong).sum
      val (nc, dc, gini, top) = got(id)
      assert(nc === s.length); assert(dc === counts.size)
      assert(math.abs(gini - (1.0 - sumSq / (n * n))) < 1e-6, s"gini($id)")
      assert(math.abs(top - counts.values.max / n) < 1e-6, s"top($id)")
    }
    val plan = graft.queries.Analytics.charDiversity(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "kernel formulation must not explode+shuffle character rows")
  }

  test("recursive CTE ancestor chains match closed-form binary-tree depth") {
    val rows = graft.queries.Analytics.recursiveCte(spark, sf)
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, nAnc, depth) =>
      val expectDepth =
        if (k == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(k) // floor(log2)+1
      assert(depth === expectDepth, s"depth($k)")
      assert(nAnc === depth + 1, s"chain length($k)")
    }
  }

  test("lateral top-n per region matches window-rank brute force") {
    val bals = Tables.t(spark, sf, "nation")
      .join(Tables.t(spark, sf, "customer"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey", "n_name")
      .agg(sum(round(col("c_acctbal") * 100).cast("long")).as("bal"))
      .as[(Long, String, Long)].collect()
    val expect = bals.groupBy(_._1).view.mapValues(
      _.sortBy(r => (-r._3, r._2)).take(2).map(r => (r._2, r._3)).toSeq).toMap
    val got = graft.queries.Analytics.lateralTopN(spark, sf)
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    assert(got === expect)
  }

  test("lateral top-n decorrelates to a rank pushdown, not per-group re-execution") {
    val plan = graft.queries.Analytics.lateralTopN(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "the correlated LIMIT must plan as a WindowGroupLimit rank pushdown")
  }

  test("null battery columns are mutually consistent") {
    val rows = graft.queries.Analytics.nullBattery(spark, sf).collect()
    assert(rows.nonEmpty)
    var sawNull = false
    rows.foreach { r =>
      val noOrders = r.getAs[Boolean]("no_orders")
      sawNull |= noOrders
      assert(r.getAs[Boolean]("nullsafe_eq_null") === noOrders)
      assert((r.getAs[Long]("tot_or_neg1") == -1L) === noOrders)
      assert(r.isNullAt(r.fieldIndex("tot_plus1")) === noOrders,
        "arithmetic must propagate NULL exactly for order-less customers")
      assert(r.getAs[String]("order_flag") === (if (noOrders) "none" else "has"))
    }
    assert(sawNull, "fixture must include customers without orders")
  }

  test("higher-order battery matches scalar brute force and stays map-side") {
    val q = graft.queries.Analytics.higherOrder(spark, sf)
    val vecs = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val got = q.as[(Long, Int, Double, Boolean, Boolean, Double, Double)]
      .collect()
    assert(got.length === vecs.size)
    got.foreach { case (id, nPos, l2sq, anyGt, allLt, maxE, dotRev) =>
      val v = vecs(id).map(_.toDouble)
      assert(nPos === v.count(_ > 0))
      assert(math.abs(l2sq - v.map(x => x * x).sum) < 1e-6)
      assert(anyGt === v.exists(_ > 0.5))
      assert(allLt === v.forall(x => math.abs(x) < 1.0))
      assert(math.abs(maxE - v.max) < 1e-6)
      assert(math.abs(dotRev - v.zip(v.reverse).map { case (a, b) => a * b }.sum) < 1e-6)
    }
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "lambda battery is per-row work; only the presentation sort may exchange")
  }

  test("jaro-winkler kernel matches textbook values, symmetry, and bounds") {
    import graft.functions.JaroWinklerKernel.{similarity => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // classic published examples (Winkler 1990 convention, boost>0.7)
    assert(math.abs(jw(u("MARTHA"), u("MARHTA")) - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw(u("DWAYNE"), u("DUANE")) - 0.84) < 1e-12)
    assert(math.abs(jw(u("DIXON"), u("DICKSONX")) - 0.8133333333333332) < 1e-12)
    assert(jw(u("abc"), u("abc")) === 1.0)
    assert(jw(u("abc"), u("xyz")) === 0.0)
    assert(jw(u(""), u("abc")) === 0.0)
    assert(jw(u(""), u("")) === 0.0, "DuckDB parity: jaro('','') is 0")
    // symmetry + bounds over fixture name pairs
    val names = Tables.t(spark, sf, "customer")
      .select("c_name").as[String].take(30)
    for (a <- names; b <- names) {
      val s1 = jw(u(a), u(b)); val s2 = jw(u(b), u(a))
      assert(s1 === s2, s"symmetry($a,$b)")
      assert(s1 >= 0.0 && s1 <= 1.0)
    }
    // probe-set query: broadcast plan, no corpus shuffle
    val plan = graft.queries.Analytics.fuzzyJw(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "probe set must broadcast")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("scd2 intervals chain contiguously with exactly one current row per key") {
    val rows = graft.queries.Analytics.scd2(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(_.getAs[Long]("o_custkey"))
    byKey.foreach { case (k, rs) =>
      assert(rs.count(_.getAs[Boolean]("is_current")) === 1,
        s"custkey $k must have exactly one open interval")
      val sorted = rs.sortBy(r =>
        r.getAs[java.time.LocalDateTime]("valid_from").toString)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ===
            b.getAs[java.time.LocalDateTime]("valid_from"),
            s"intervals must chain for custkey $k")
        case _ =>
      }
      // consecutive intervals always change the tracked attribute
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("prio") !== b.getAs[String]("prio"))
        case _ =>
      }
    }
  }

  test("event transitions row-normalize and conserve the transition count") {
    val rows = graft.queries.Analytics.eventTransitions(spark, sf)
      .as[(String, String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"P(next|$prev) sums to 1")
    }
    val ev = Tables.t(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === nEvents - nUsers,
      "each user contributes exactly (events - 1) transitions")
  }

  test("bigram LM top-3 matches brute-force conditional counts") {
    val bigrams = docTokens.values.flatMap(t => t.zip(t.drop(1))).toSeq
    val counts = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val expect = counts.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.toSeq.map { case ((_, nxt), c) => (nxt, c) }
        .sortBy { case (nxt, c) => (-c, nxt) }.take(3)
    }
    val got = graft.queries.Analytics.bigramLm(spark, sf)
      .as[(String, String, Long, Double, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._5).map(r => (r._2, r._3.toInt)).toSeq).toMap
    assert(got === expect.toMap.view.mapValues(_.toSeq).toMap)
  }

  test("sweep line conserves mass: curve never negative, ends at zero, peak matches brute force") {
    val rows = graft.queries.Analytics.sweepLine(spark, sf)
      .select("net", "in_flight").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "concurrency can never be negative")
    assert(rows.last._2 === 0L, "every opened interval must close")
    assert(rows.map(_._1).sum === 0L, "deltas must conserve")
    // peak equals brute-force max concurrency over interval endpoints
    val iv = Tables.t(spark, sf, "orders").as("o")
      .join(Tables.t(spark, sf, "lineitem").as("l"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .groupBy(col("o.o_orderkey"), col("o.o_orderdate").cast("date").as("od"))
      .agg(max(col("l.l_shipdate").cast("date")).as("cd"))
      .select(col("od").cast("string"),
        greatest(col("cd"), col("od")).cast("string"))
      .as[(String, String)].collect()
    val brute = iv.map { case (od, _) =>
      iv.count { case (o2, c2) => o2 <= od && od < c2 }
    }.max
    assert(rows.map(_._2).max === brute)
  }

  test("ratio-to-report shares sum to 1 per region") {
    val rows = graft.queries.Analytics.ratioToReport(spark, sf)
      .select("r_name", "share_of_region").as[(String, Double)].collect()
    rows.groupBy(_._1).foreach { case (r, rs) =>
      assert(math.abs(rs.map(_._2).sum - 1.0) < 1e-4, s"shares($r) must sum to 1")
    }
  }

  test("pagerank is deterministic, covers all nodes, and conserves teleport floor") {
    val clicks = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long"))
      .as[(Long, Long)].collect().distinct
    val nNodes = clicks.map(_._1).distinct.size + clicks.map(_._2).distinct.size
    val r1 = graft.queries.Analytics.pagerank(spark, sf).as[(Long, Long)].collect()
    val r2 = graft.queries.Analytics.pagerank(spark, sf).as[(Long, Long)].collect()
    assert(r1.toSeq === r2.toSeq, "integer PageRank must be bit-identical across runs")
    assert(r1.length === nNodes)
    assert(r1.forall(_._2 >= 150000L), "every node keeps the teleport mass")
    // rank mass is bounded by the lossless-float total (div flooring only loses)
    assert(r1.map(_._2).sum <= nNodes * 1000000L)
  }

  test("collocations match brute-force windowed lift on the fixture") {
    val toks = docTokens
    val pos = toks.toSeq.flatMap { case (_, ts) => ts }
    val nTotal = pos.size.toLong
    val tokCnt = pos.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val pairs = toks.toSeq.flatMap { case (_, ts) =>
      for {
        i <- ts.indices
        j <- (i + 1) to math.min(i + 5, ts.size - 1)
        if ts(i) != ts(j)
      } yield {
        val (a, b) = (ts(i), ts(j))
        if (a < b) (a, b) else (b, a)
      }
    }
    val nPairs = pairs.size.toLong
    val pairCnt = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expected = pairCnt.filter(_._2 >= 10).map { case ((a, b), nab) =>
      val lift = BigDecimal(nab.toDouble * nTotal * nTotal / nPairs / tokCnt(a) / tokCnt(b))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, nab, lift)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(30)
    val got = graft.queries.Analytics.collocations(spark, sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === expected)
  }

  test("k-core: peeling depth, core membership, empty core, loud non-convergence") {
    def core(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 64): Map[Long, Int] =
      graft.operators.Graph.kCore(edges.toDF("a", "b"), k, maxRounds = maxRounds)
        .as[(Long, Int)].collect().toMap

    // triangle {1,2,3} with tail 3-4-5-6: the 2-core is the triangle;
    // the tail peels one node per round (6, then 5, then 4) — a genuine
    // 3-round fixpoint, pinned via the rounds introspection
    val tailed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(tailed, 2) === Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(graft.operators.Graph.lastKCoreRounds === 3)

    // its 3-core is empty (every node tops out at degree 2 once the
    // tail is gone)
    assert(core(tailed, 3) === Map.empty)

    // K4: 3-core keeps all four nodes at in-core degree 3; duplicates,
    // reversed edges, and self-loops canonicalize away
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) ++
      Seq((2L, 1L), (3L, 3L))
    assert(core(k4, 3) === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    assert(graft.operators.Graph.lastKCoreRounds === 0)

    // K4 with a pendant chain: the chain must not pull the core down
    val chained = k4 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    assert(core(chained, 3) === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))

    // a budget smaller than the peeling depth must fail loudly, not
    // return a non-fixpoint superset
    intercept[IllegalStateException](core(tailed, 2, maxRounds = 2))
  }

  test("triangle census matches hand counts on planted graphs") {
    def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) =
      graft.operators.Graph.triangleCensus(edges.toDF("a", "b"))
        .as[(Long, Long, Long, Long, Double)].collect().head

    // K4: 4 nodes, 6 edges, Σ C(3,2) = 12 wedges, 4 triangles, cc = 1
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(census(k4) === ((4L, 6L, 12L, 4L, 1.0)))

    // triangle {1,2,3} + pendant (3,4) + isolated edge (5,6):
    // degs 2,2,3,1,1,1 → wedges 1+1+3 = 5, one triangle, cc = 3/5
    val mixed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
    assert(census(mixed) === ((6L, 5L, 5L, 1L, 0.6)))

    // duplicates, reversed duplicates, and self-loops must canonicalize
    // away without changing any count
    val noisy = mixed ++ Seq((2L, 1L), (1L, 2L), (4L, 4L))
    assert(census(noisy) === ((6L, 5L, 5L, 1L, 0.6)))

    // a 5-cycle has wedges but zero triangles → cc = 0
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(census(c5) === ((5L, 5L, 5L, 0L, 0.0)))

    // an empty edge set must yield all-zero counts (not NULLs)
    assert(census(Seq.empty[(Long, Long)]) === ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("Benford audit boundary: totals below 1 are excluded, exactly 1 is included") {
    // the q204 domain guard (totals >= 1) exists because sub-1e-3
    // doubles render as scientific notation and negatives would break
    // the digit cast — this planted corpus sits ON that boundary:
    //   excluded: 0.0, 0.5, 0.9999999, 0.0005 (sci-notation form), -3.2
    //   included: 1.0, 1.5 (digit 1), 9.99 (digit 9)
    val totals = Seq(0.0, 0.5, 0.9999999, 0.0005, -3.2, 1.0, 1.5, 9.99)
      .toDF("total")
    val got = graft.queries.Analytics.benfordOn(totals, "total")
      .select("digit", "n", "observed", "expected", "abs_dev")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1, 2L, 0.6667, 0.3010, 0.3657),
      (9, 1L, 0.3333, 0.0458, 0.2875)))
  }

  test("Benford audit on an all-sub-1 corpus yields zero rows, not a division error") {
    val got = graft.queries.Analytics.benfordOn(
      Seq(0.0, 0.25, 0.9999).toDF("total"), "total").collect()
    assert(got.isEmpty)
  }
}
