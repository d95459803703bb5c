package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent replays for the corpus-diagnostics wave (q276–q279):
  * Heaps' fit, distinct-n, mutual information, and the CUSUM fold are
  * each recomputed sequentially on collected data with the SAME
  * quantization, so every assert is exact. (The DuckDB oracle is the
  * cross-engine gate; these pin the semantics.)
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def round4(v: Double) =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(v: Double) =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (doc_id, source, tokens) collected once via the shared tokenizer
    * (tokenization itself is oracle-verified through q38/q39 et al.;
    * these specs verify the counting on top of it). */
  private lazy val docToks: Array[(Long, String, Seq[String])] =
    Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        graft.llm.TextOps.tokens(col("text")).as("toks"))
      .as[(Long, String, Seq[String])].collect()

  test("q276 Heaps fit equals a sequential bucket replay") {
    val maxId = docToks.map(_._1).max
    // per-doc bucket, token volume, and per-token first bucket
    val firstB = scala.collection.mutable.Map[String, Long]()
    val vol = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val nv = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((id, _, toks) <- docToks.sortBy(_._1); t <- toks if t.nonEmpty) {
      val b = id * 50 / (maxId + 1)
      vol(b) += 1
      if (!firstB.contains(t) || firstB(t) > b) firstB(t) = b
    }
    firstB.values.foreach(b => nv(b) += 1)
    val bs = (vol.keySet ++ nv.keySet).toSeq.sorted
    var ct = 0L; var cv = 0L
    val pts = bs.map { b =>
      ct += vol(b); cv += nv(b)
      (math.round(math.log(ct.toDouble) * 1e6),
        math.round(math.log(cv.toDouble) * 1e6))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val got = graft.queries.Analytics.heapsFit(spark, sf)
      .as[(Long, Double)].collect().head
    assert(got._1 === n)
    assert(got._2 === round4(num / den))
    // sublinear vocabulary growth; the synthetic fixture draws from a
    // bounded vocab pool, so β sits at ~0 — exactly the "templated
    // text" signal the diagnostic exists to surface
    assert(got._2 >= 0.0 && got._2 < 1.0)
  }

  test("q277 distinct-n equals direct per-source recounting") {
    val expect = docToks.groupBy(_._2).map { case (src, docs) =>
      val unis = docs.flatMap(_._3).filter(_.nonEmpty)
      val bigs = docs.flatMap(d => d._3.sliding(2).filter(_.length == 2)
        .map(p => p(0) + " " + p(1)).toSeq)
      val (ut, ud) = (unis.length.toLong, unis.distinct.length.toLong)
      val (bt, bd) = (bigs.length.toLong, bigs.distinct.length.toLong)
      val d1 = (BigDecimal(ud) / BigDecimal(ut))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val d2 = if (bt == 0) None else Some((BigDecimal(bd) / BigDecimal(bt))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (src, ut, ud, bt, bd, d1, d2)
    }.toSet
    val got = graft.queries.LlmQueries.distinctN(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Option[Double])]
      .collect().toSet
    assert(got === expect)
  }

  test("q278 mutual information equals a quantized contingency replay") {
    val cells = Tables.t(spark, sf, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val nn = cells.map(_._3).sum
    val rl = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cs = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mi6s = cells.map { case (l, s0, c) =>
      c * math.round(math.log((c * nn).toDouble / (rl(l) * cs(s0)).toDouble) * 1e6)
    }.sum
    val hl6s = rl.values.map(r =>
      r * math.round(math.log(nn.toDouble / r.toDouble) * 1e6)).sum
    val hs6s = cs.values.map(c0 =>
      c0 * math.round(math.log(nn.toDouble / c0.toDouble) * 1e6)).sum
    val got = graft.queries.Analytics.mutualInfo(spark, sf)
      .as[(Int, Long, Double, Double)].collect().head
    assert(got._1 === cells.length)
    assert(got._2 === nn)
    assert(got._3 === round6(mi6s.toDouble / (nn.toDouble * 1e6)))
    assert(got._4 === round6(mi6s.toDouble /
      math.sqrt(hl6s.toDouble * hs6s.toDouble)))
    // MI is nonnegative up to micro-quantization slack
    assert(got._3 >= -1e-4)
    assert(got._4 <= 1.0 + 1e-4)
  }

  test("q280 vocab Jaccard equals brute-force set arithmetic") {
    val vocab = docToks.groupBy(_._2).view
      .mapValues(_.flatMap(_._3).filter(_.nonEmpty).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
    } yield {
      val uni = (vocab(a) | vocab(b)).size.toLong
      (a, b, vocab(a).size.toLong, vocab(b).size.toLong, inter,
        (BigDecimal(inter) / BigDecimal(uni))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    val got = graft.queries.Analytics.vocabJaccard(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(got === expect)
  }

  test("q281 Cramer's V equals a quantized chi-square replay") {
    val cells = Tables.t(spark, sf, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect()
    val nn = cells.map(_._3).sum
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val m = cells.map { case (s0, l, o) =>
      val e = rt(s0).toDouble * ct(l).toDouble / nn.toDouble
      val dd = o.toDouble - e
      math.round(dd * dd / e * 1e6)
    }.sum
    val k = math.min(rt.size - 1, ct.size - 1).toLong
    val got = graft.queries.Analytics.cramersV(spark, sf)
      .as[(Int, Int, Long, Double, Double)].collect().head
    assert((got._1, got._2, got._3) === ((rt.size, ct.size, nn)))
    assert(got._4 === round6(m.toDouble / 1e6))
    assert(got._5 === round6(
      math.sqrt(m.toDouble / 1e6 / (nn.toDouble * k.toDouble))))
    assert(got._5 >= 0.0 && got._5 <= 1.0 + 1e-6)
  }

  test("q282 transition entropies equal a sequential replay; gain >= 0") {
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val s0 = g.sortBy(x => (x._3, x._4)).map(_._2)
      s0.zip(s0.tail)
    }
    val cellCnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val np = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cn = trans.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = trans.length.toLong
    val hc6s = cellCnt.map { case ((p, _), c) =>
      c * math.round(math.log(np(p).toDouble / c.toDouble) * 1e6)
    }.sum
    val hn6s = cn.values.map(c =>
      c * math.round(math.log(nn.toDouble / c.toDouble) * 1e6)).sum
    val got = graft.queries.Analytics.transitionEntropy(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect().head
    assert(got._1 === cellCnt.size)
    assert(got._2 === nn)
    assert(got._3 === round6(hn6s.toDouble / (nn.toDouble * 1e6)))
    assert(got._4 === round6(hc6s.toDouble / (nn.toDouble * 1e6)))
    assert(got._5 === round6((hn6s - hc6s).toDouble / (nn.toDouble * 1e6)))
    // conditioning can only reduce entropy (up to micro-quant slack)
    assert(got._5 >= -1e-4)
  }

  test("q283 Kaplan-Meier equals a sequential life-table walk") {
    val pu = Tables.t(spark, sf, "events")
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("f"), max(to_date(col("ts"))).as("l"))
      .select(col("user_id"), datediff(col("l"), col("f")).cast("long"),
        col("l").cast("string"))
      .as[(Long, Long, String)].collect()
    val endD = pu.map(_._3).max
    def days(a: String, b: String) =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
    val lives = pu.map(r => (r._2, days(r._3, endD) > 7))
    val spine = lives.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = lives.length.toLong
    var cum = 0L
    val expect = spine.map { case (t, g) =>
      val d = g.count(_._2).toLong
      val nRisk = atRisk
      val ls6: Option[Long] =
        if (d == 0) Some(0L)
        else if (nRisk > d)
          Some(math.round(math.log((nRisk - d).toDouble / nRisk.toDouble) * 1e6))
        else None
      ls6.foreach(cum += _)
      atRisk -= g.length
      (t, nRisk, d, ls6.map(_ => cum))
    }
    val got = graft.queries.Extended.kaplanMeier(spark, sf)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got === expect)
    // survival only decays: the defined log values are non-increasing
    val defined = got.flatMap(_._4)
    assert(defined.zip(defined.tail).forall { case (a, b) => b <= a })
  }

  test("q284 Fano factors equal direct per-token moment replay") {
    val ndocs = docToks.length.toLong
    val perDoc = docToks.flatMap { case (id, _, toks) =>
      toks.filter(_.nonEmpty).groupBy(identity).map {
        case (t, g) => (t, g.size.toLong)
      }
    }
    val moments = perDoc.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2).sum, g.map(x => x._2 * x._2).sum)
    }.toMap
    val got = graft.queries.Analytics.fanoBurstiness(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.length === math.min(50, moments.size))
    // returned rows are the top tokens by count, in order
    val expTop = moments.toSeq.map { case (t, (tot, _)) => (t, tot) }
      .sortBy { case (t, tot) => (-tot, t) }.take(got.length)
    assert(got.map(r => (r._1, r._2)).toSeq === expTop)
    got.foreach { case (tok, tot, f4) =>
      val (_, s2) = moments(tok)
      val num = ndocs * s2 - tot * tot
      assert(f4 === (BigDecimal(num) / BigDecimal(ndocs * tot))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, tok)
      assert(f4 >= 0.0)
    }
  }

  test("q285 two-proportion z equals a direct replay") {
    val ud = Tables.t(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(col("user_id"), col("conv")).as[(Long, Long)].collect()
    val (a, b) = ud.partition(_._1 % 2 == 0)
    val (n1, x1) = (a.length.toLong, a.map(_._2).sum)
    val (n2, x2) = (b.length.toLong, b.map(_._2).sum)
    val got = graft.queries.Analytics.twoProportionZ(spark, sf)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert((got._1, got._2, got._3, got._4) === ((n1, x1, n2, x2)))
    if (x1 + x2 == 0 || x1 + x2 == n1 + n2) assert(got._5.isEmpty)
    else {
      val p = (x1 + x2).toDouble / (n1 + n2).toDouble
      val z = (x1.toDouble / n1.toDouble - x2.toDouble / n2.toDouble) /
        math.sqrt(p * (1.0 - p) * (1.0 / n1.toDouble + 1.0 / n2.toDouble))
      assert(got._5 === Some(round6(z)))
    }
  }

  test("q286 sample size equals the textbook formula on exact counts") {
    val ud = Tables.t(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(col("d").cast("string"), col("conv"))
      .as[(String, Long)].collect()
    val n = ud.length.toLong; val x = ud.map(_._2).sum
    val nDays = ud.map(_._1).distinct.length.toLong
    val p1 = x.toDouble / n.toDouble; val p2 = p1 * 1.1
    val zs = 1.959964 + 0.841621
    val nArm = math.ceil(zs * zs * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) /
      ((p2 - p1) * (p2 - p1))).toLong
    val got = graft.queries.Analytics.sampleSize(spark, sf)
      .as[(Long, Long, Double, Long, Long)].collect().head
    assert((got._1, got._2) === ((n, x)))
    assert(got._3 === (BigDecimal(x) / BigDecimal(n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._4 === nArm)
    assert(got._5 === (BigDecimal(nArm * nDays) / BigDecimal(n))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("q287 Hill estimator equals a sorted-tail replay") {
    val lens = Tables.t(spark, sf, "documents")
      .select(col("n_chars")).as[Long].collect().sorted.reverse
    assume(lens.length > 201)
    val ref = lens(200) // 201st largest value (multiset order-invariant)
    val s6 = lens.take(200)
      .map(x => math.round(math.log(x.toDouble / ref.toDouble) * 1e6)).sum
    val got = graft.queries.Analytics.hillTail(spark, sf)
      .as[(Int, Long, Double, Option[Double])].collect().head
    assert(got._1 === 200)
    assert(got._2 === ref)
    assert(got._3 === round6(s6.toDouble / (200.0 * 1e6)))
    if (s6 == 0) assert(got._4.isEmpty)
    else assert(got._4 === Some(BigDecimal(200.0 * 1e6 / s6.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("q288 readability equals exact rational arithmetic per doc") {
    val rows = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"),
        graft.llm.TextOps.tokens(col("text")).as("toks"))
      .as[(Long, String, Seq[String])].collect()
    val expect = rows.map { case (id, text, toks) =>
      val w = math.max(toks.count(_.nonEmpty), 1).toLong
      val sn = math.max("[.!?]+".r.findAllIn(text).length, 1).toLong
      val c = text.length.toLong
      val m = BigInt(206835) * sn * w - BigInt(1015) * w * w -
        BigInt(8460) * c * sn
      val den = BigInt(10) * sn * w
      val s2 = (BigDecimal(m) / BigDecimal(den))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val grade =
        if (s2 >= 9000) "very_easy" else if (s2 >= 7000) "easy"
        else if (s2 >= 5000) "standard" else if (s2 >= 3000) "difficult"
        else "very_difficult"
      (id, w, sn, s2.toDouble / 100.0, grade)
    }.toSet
    val got = graft.queries.LlmQueries.readability(spark, sf)
      .as[(Long, Long, Long, Double, String)].collect().toSet
    assert(got === expect)
  }

  test("q289 link prediction equals brute-force neighborhood arithmetic") {
    val items = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val pairCnt = items.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val edges = pairCnt.filter(_._2 >= 2).keySet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = adj.keys.toSeq
    val cands = (for {
      c <- nodes; ns = adj(c).toSeq.sorted
      i <- ns.indices; j <- i + 1 until ns.length
    } yield ((ns(i), ns(j)), c))
      .groupBy(_._1).filterNot(p => edges(p._1))
      .map { case ((a, b), g) =>
        val cn = g.length.toLong
        val aa6 = g.map { case (_, c) =>
          math.round(1e6 / math.log(adj(c).size.toDouble)) }.sum
        val uni = adj(a).size.toLong + adj(b).size.toLong - cn
        val j4 = (BigDecimal(cn) / BigDecimal(uni))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, cn, aa6, j4)
      }.toSeq
    val expect = cands.sortBy(r => (-r._4, r._1, r._2)).take(20)
    val got = graft.queries.Analytics.linkPrediction(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === expect)
  }

  test("q290 conversion latency equals sorted order statistics") {
    val lats = Tables.t(spark, sf, "events")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", to_date(col("ts"))))
        .cast("string").as("s"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .cast("string").as("p"))
      .as[(Long, Option[String], Option[String])].collect()
      .flatMap { case (_, s, p) =>
        for (a <- s; b <- p
             if !java.time.LocalDate.parse(b).isBefore(
               java.time.LocalDate.parse(a)))
          yield java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
      }.sorted
    assume(lats.nonEmpty)
    val n = lats.length.toLong
    def q(pct: Long) = lats(((n * pct + 99) / 100 - 1).toInt.max(0))
    val got = graft.queries.Analytics.conversionLatency(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((n, q(25), q(50), q(75), q(90))))
  }

  test("q291 PRF expansion is internally consistent and well-formed") {
    val qTerms = Set("vector", "spark", "customer")
    val nDocs = docToks.length.toLong
    val rows = graft.queries.LlmQueries.prfExpansion(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 5)
    // corpus df recomputed independently per returned term
    val dfTruth = rows.map { case (t, _, _, _) =>
      t -> docToks.count(_._3.contains(t)).toLong
    }.toMap
    rows.foreach { case (term, tfSel, df, score6) =>
      assert(!qTerms(term) && !graft.llm.TextOps.StopEn.contains(term))
      assert(df === dfTruth(term), term)
      assert(score6 ===
        tfSel * math.round(math.log(nDocs.toDouble / df.toDouble) * 1e6))
    }
    val scores = rows.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q292 triple itemsets equal brute-force basket enumeration") {
    val baskets = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .as[(Long, String)].collect()
    val nn = baskets.map(_._1).distinct.length.toLong
    val marg = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tri = baskets.groupBy(_._1).values.flatMap { g =>
      val bs = g.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.length;
           k <- j + 1 until bs.length) yield (bs(i), bs(j), bs(k))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toSeq
    val expect = tri.map { case ((a, b, c), sup) =>
      val den = BigInt(marg(a)) * marg(b) * marg(c)
      val l3 = ((BigInt(sup) * nn * nn * 20000 + den) / (2 * den)).toDouble / 10000.0
      (a, b, c, sup, l3)
    }.sortBy(r => (-r._4, r._1, r._2, r._3)).take(20)
    val got = graft.queries.Advanced.tripleItemsets(spark, sf)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(got === expect)
  }

  test("q293 hash-collision histogram equals an md5 replay") {
    val feats = docToks.flatMap { case (_, _, toks) =>
      val uni = toks.distinct.filter(_.nonEmpty)
      val big = toks.sliding(2).filter(_.length == 2)
        .map(p => p(0) + " " + p(1)).toSeq.distinct
      uni ++ big
    }.distinct
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 512
    }
    val loads = feats.groupBy(bucket).view.mapValues(_.size.toLong)
    val hist = loads.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val empty = 512L - loads.size
    val expect = (hist ++ (if (empty > 0) Map(0L -> empty) else Map.empty))
      .toSeq.sortBy(_._1)
    val got = graft.queries.Curation.hashCollisionAudit(spark, sf)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === expect)
    assert(got.map(r => r._1 * r._2).sum === feats.length.toLong)
    assert(got.map(_._2).sum === 512L)
  }

  test("q294 inter-arrival CV equals a sequential gap replay") {
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"))
      .as[(String, Long, Long)].collect()
    val expect = ev.groupBy(_._1).flatMap { case (et, g) =>
      val ts = g.sortBy(x => (x._2, x._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => (b - a) / 1000000L }
      val n = gaps.length.toLong
      val sg = gaps.sum
      val sg2 = gaps.map(x => BigInt(x) * x).sum
      if (sg <= 0) None
      else {
        val mean2 = (BigDecimal(sg) / BigDecimal(n))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        val num = BigInt(n) * sg2 - BigInt(sg) * sg
        val cv24 = (BigDecimal(num) / BigDecimal(BigInt(sg) * sg))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((et, n, mean2, cv24))
      }
    }.toSet
    val got = graft.queries.Extended.interArrivalCv(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got === expect)
  }

  private def md5hex(s0: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("q295 source leakage equals a bag-fingerprint set replay") {
    val bySrc = docToks.groupBy(_._2).view.mapValues(_.map { case (_, _, t) =>
      md5hex(t.distinct.sorted.mkString(" "))
    }.toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
      sh = (bySrc(a) & bySrc(b)).size.toLong if sh > 0
    } yield {
      val (na, nb) = (bySrc(a).size.toLong, bySrc(b).size.toLong)
      val c4 = (BigDecimal(sh) / BigDecimal(math.min(na, nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, na, nb, sh, c4)
    }).toSet
    val got = graft.queries.Curation.sourceLeakage(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(got === expect)
  }

  test("q296 PQ reconstruction error is well-formed") {
    val nVec = Tables.t(spark, sf, "embeddings").count()
    val got = graft.queries.LlmQueries.pqReconError(spark, sf)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 === nVec)
    // the 16 codebook vectors reconstruct themselves exactly
    assert(got._2 >= 16L)
    assert(got._3 >= 0.0 && got._3 <= got._4)
  }

  test("q297 lang confusion equals a recount of the q38 output") {
    val rows = graft.queries.LlmQueries.langId(spark, sf)
      .select("lang", "lang_pred").as[(String, String)].collect()
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val rowTot = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expect = cells.map { case ((l, p), n) =>
      (l, p, n, (BigDecimal(n) / BigDecimal(rowTot(l)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.queries.LlmQueries.langConfusion(spark, sf)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === expect)
  }

  test("q298 snapshot drift equals an exact integer-mean replay") {
    val d = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        round(graft.llm.TextOps.qualityScore(col("text")) * 1e4)
          .cast("long").as("qa"),
        round(graft.llm.TextOps.qualityScore(
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev")))
            .otherwise(col("text"))) * 1e4).cast("long").as("qb"),
        graft.queries.Fragments.splitBucket(col("doc_id")).as("bucket"))
      .as[(Long, String, Long, Long, Int)].collect()
    def mean4(xs: Seq[Long]): Option[Long] =
      if (xs.isEmpty) None
      else Some((BigDecimal(xs.sum) / BigDecimal(xs.length))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val expect = d.groupBy(_._2).map { case (src, g) =>
      val a = g.filter(_._5 < 90).map(_._3)
      val b = g.filter(_._5 >= 10).map(_._4)
      val (ma, mb) = (mean4(a), mean4(b))
      (src, a.length.toLong, b.length.toLong,
        ma.map(_.toDouble / 1e4), mb.map(_.toDouble / 1e4),
        for (x <- ma; y <- mb) yield (y - x).toDouble / 1e4)
    }.toSet
    val got = graft.queries.Curation.snapshotQualityDrift(spark, sf)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().toSet
    assert(got === expect)
  }

  test("q299 mixture ESS equals a quantized-weight replay") {
    val perSrc = docToks.groupBy(_._2).view
      .mapValues(_.map(_._3.length.toLong).sum).toMap
    val nn = perSrc.values.sum
    val w6 = perSrc.values.map(t =>
      math.round(math.sqrt(t.toDouble / nn.toDouble) * 1e6)).toSeq
    val s1 = w6.map(BigInt(_)).sum
    val s2 = w6.map(x => BigInt(x) * x).sum
    val ess4 = ((s1 * s1 * 20000 + s2) / (2 * s2)).toDouble / 10000.0
    val got = graft.queries.Curation.mixtureEss(spark, sf)
      .as[(Int, Double)].collect().head
    assert(got._1 === perSrc.size)
    assert(got._2 === ess4)
    assert(got._2 <= perSrc.size.toDouble + 1e-9)
  }

  test("q300 model-gate report equals a join of its verified parts") {
    val learned = graft.queries.Curation.learnedQuality(spark, sf)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val rule = graft.queries.LlmQueries.qualityScore(spark, sf)
      .select("doc_id", "quality").as[(Long, Double)].collect()
      .map { case (id, q) => id -> (q >= 0.3) }.toMap
    val lang = graft.queries.LlmQueries.langId(spark, sf)
      .select("doc_id", "hit").as[(Long, Boolean)].collect().toMap
    val read = graft.queries.LlmQueries.readability(spark, sf)
      .select("doc_id", "score2").as[(Long, Double)].collect()
      .map { case (id, s0) => id -> math.round(s0 * 100) }.toMap
    val ids = learned.keys.toSeq
    val nd = ids.length.toLong
    def frac6(k: Long) = (BigDecimal(k) / BigDecimal(nd))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ss2 = ids.map(read).sum
    val meanR = (BigDecimal(ss2) / BigDecimal(nd))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong.toDouble / 100.0
    val expect = Map(
      "gate_agreement_frac" -> frac6(ids.count(i => learned(i) == rule(i))),
      "langid_accuracy" -> frac6(ids.count(lang)),
      "learned_keep_frac" -> frac6(ids.count(learned)),
      "mean_readability2" -> meanR,
      "n_docs" -> nd.toDouble,
      "readability_std_plus_frac" -> frac6(ids.count(read(_) >= 5000L)))
    val got = graft.queries.Pipeline.modelGateReport(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(got === expect)
  }

  test("q279 CUSUM equals a plain sequential fold") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("d").cast("string"), col("c"))
      .as[(String, String, Long)].collect()
    val expect = daily.groupBy(_._1).map { case (et, g) =>
      val cs = g.sortBy(_._2).map(_._3)
      val tot = cs.sum; val nd = cs.length.toLong
      var sv = 0L; var mx = 0L; var nAlarm = 0L; var first = 0L
      for ((c, i) <- cs.zipWithIndex) {
        sv = math.max(0L, sv + c * nd - tot)
        mx = math.max(mx, sv)
        if (sv > 3 * tot) {
          nAlarm += 1
          if (first == 0L) first = i + 1L
        }
      }
      (et, nd, tot, mx, nAlarm, first)
    }.toSet
    val got = graft.queries.Extended.cusumShift(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expect)
  }
}
