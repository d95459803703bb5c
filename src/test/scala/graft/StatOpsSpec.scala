package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth specs for the statistics/normalization additions
  * (q217–q222): each operator is replayed sequentially on collected
  * data with an INDEPENDENT formulation (naive two-pass moments,
  * per-user fold, brute-force window sets, textbook chi-square,
  * rank-walk quantile mapping) and must agree exactly after the same
  * final rounding. (The DuckDB oracle is the cross-engine gate; these
  * pin the SEMANTICS.) */
class StatOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def round6(v: Double) =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round4(v: Double) =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------ q217

  test("q217 OLS matches a naive least-squares replay per group") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long"),
        round(col("l_extendedprice")).cast("long"))
      .as[(String, String, Long, Long)].collect()
    val expect = rows.groupBy(r => (r._1, r._2)).map { case ((rf, ls), g) =>
      val n = g.length.toDouble
      val xs = g.map(_._3.toDouble); val ys = g.map(_._4.toDouble)
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = g.map(r => r._3.toDouble * r._4.toDouble).sum
      val numXy = n * sxy - sx * sy
      val denX = n * sxx - sx * sx; val denY = n * syy - sy * sy
      val slope = numXy / denX
      (rf, ls, g.length.toLong, round6(slope),
        round4((sy - slope * sx) / n), round6(numXy * numXy / (denX * denY)))
    }.toSet
    // the naive replay sums doubles in collection order, so allow 1-ulp
    // slack at the 6-dp rounding boundary via exact string compare of
    // the integer-moment operator vs a BigDecimal-exact recomputation:
    // sums here are small enough (sf0.001) that double sums are exact
    val got = graft.queries.Analytics.olsGroup(spark, sf)
      .as[(String, String, Long, Double, Double, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q218

  test("q218 ACF matches a collected Pearson on the lagged daily series") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("d").cast("string"), col("c"))
      .as[(String, String, Long)].collect()
    val expect = daily.groupBy(_._1).flatMap { case (et, g) =>
      val series = g.sortBy(_._2).map(_._3.toDouble)
      Seq(1, 2).flatMap { k =>
        val pairs = series.drop(k).zip(series.dropRight(k))
        val n = pairs.length.toDouble
        if (pairs.isEmpty) None
        else {
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val num = n * sxy - sx * sy
          val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
          if (dx > 0 && dy > 0)
            Some((et, k, pairs.length.toLong,
              round6(num / (math.sqrt(dx) * math.sqrt(dy)))))
          else None
        }
      }
    }.toSet
    val got = graft.queries.Analytics.acfDaily(spark, sf)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q219

  test("q219 EWMA matches a sequential per-user 8-tap fold") {
    val evs = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")), round(col("value") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val expect = evs.groupBy(_._1).map { case (u, g) =>
      val cents = g.sortBy(r => (r._3, r._2)).map(_._4)
      val tail = cents.takeRight(8).reverse // lag0 first
      val num = tail.zipWithIndex.map { case (v, k) => v << (7 - k) }.sum
      val den = tail.indices.map(k => 1L << (7 - k)).sum
      (u, g.length.toLong, round4(num.toDouble / (den.toDouble * 100.0)))
    }.toSet
    val got = graft.queries.Extended.ewmaSmooth(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q220

  test("q220 trailing distinct matches brute-force per-day set unions") {
    val pairs = Tables.t(spark, sf, "events")
      .select(to_date(col("ts")).cast("string"), col("user_id"))
      .distinct().as[(String, Long)].collect()
    val byDay = pairs.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keySet.toSeq.sorted
    def minus(d: String, k: Int): String =
      java.time.LocalDate.parse(d).minusDays(k.toLong).toString
    val expect = days.map { d =>
      val win = (0 until 7).map(minus(d, _)).flatMap(byDay.get)
      (d, win.foldLeft(Set.empty[Long])(_ ++ _).size.toLong,
        win.map(_.size.toLong).sum)
    }.toSet
    val got = graft.queries.Advanced.rollingDistinct(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q221

  test("q221 chi-square matches the textbook statistic on the collected table") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("lang")).as[(String, String)].collect()
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = docs.length.toDouble
    val expect = cells.keySet.groupBy(_._1).map { case (src, ks) =>
      val micros = ks.toSeq.map { case (s0, l0) =>
        val e = rt(s0).toDouble * ct(l0).toDouble / nn
        val d = cells((s0, l0)).toDouble - e
        // HALF_UP (round half away from zero) like both engines' round()
        BigDecimal(d * d / e * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      (src, ks.size.toLong, round6(micros.sum.toDouble / 1e6))
    }.toSet
    val got = graft.queries.Analytics.chisqIndependence(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q223

  test("q223 KS matches a brute-force CDF-gap maximum") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val nn = docs.length.toLong
    val values = docs.map(_._2).distinct.sorted
    val expect = docs.groupBy(_._1).map { case (src, g) =>
      val n1 = g.length.toLong
      val inSrc = g.map(_._2)
      val mx = values.map { v =>
        val f1 = inSrc.count(_ <= v).toLong
        val fg = docs.count(_._2 <= v).toLong
        math.abs(f1 * (nn - n1) - (fg - f1) * n1)
      }.max
      (src, n1, round6(mx.toDouble / (n1 * (nn - n1)).toDouble))
    }.toSet
    val got = graft.queries.Analytics.ksAudit(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q224

  test("q224 MWU matches a rank-sum replay with tie correction") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val nn = docs.length.toLong
    val sortedAll = docs.map(_._2).sorted
    // doubled average rank per value (lo+hi over the tie group)
    val r2 = sortedAll.distinct.map { v =>
      val lo = sortedAll.indexWhere(_ == v) + 1L
      val hi = sortedAll.lastIndexWhere(_ == v) + 1L
      v -> (lo + hi)
    }.toMap
    val tsum = sortedAll.groupBy(identity).values
      .map { g => val t = g.length.toLong; t * t * t - t }.sum
    val expect = docs.groupBy(_._1).flatMap { case (src, g) =>
      val n1 = g.length.toLong; val n2 = nn - n1
      val r12 = g.map(r => r2(r._2)).sum
      val u1 = (2 * n1 * n2 + n1 * (n1 + 1) - r12).toDouble / 2.0
      val sigma2 = n1.toDouble * n2.toDouble / 12.0 * ((nn.toDouble + 1.0) -
        tsum.toDouble / (nn.toDouble * (nn.toDouble - 1.0)))
      if (sigma2 > 0)
        Some((src, n1, u1,
          round6((u1 - n1.toDouble * n2.toDouble / 2.0) / math.sqrt(sigma2))))
      else None
    }.toSet
    val got = graft.queries.Analytics.mwuAudit(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q225

  test("q225 Gini matches the sorted rank-formula replay") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
    val expect = docs.groupBy(_._1).flatMap { case (src, g) =>
      val xs = g.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.length.toLong; val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      if (sx > 0)
        Some((src, n,
          round6((2 * six - (n + 1) * sx).toDouble / (n * sx).toDouble)))
      else None
    }.toSet
    val got = graft.queries.Curation.giniBySource(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q226

  test("q226 winsorize matches a nearest-rank clip replay") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val expect = docs.groupBy(_._2).flatMap { case (src, g) =>
      val ordered = g.sortBy(r => (r._3, r._1)).map(_._3)
      val n = ordered.length
      val lo = ordered((n + 9) / 10 - 1)
      val hi = ordered((n * 9 + 9) / 10 - 1)
      g.toSeq.map(r => (r._1, src, r._3, math.min(math.max(r._3, lo), hi)))
    }.toSet
    val got = graft.queries.Curation.winsorize(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q227

  test("q227 Spearman matches Pearson-on-average-ranks replay") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        round(col("l_extendedprice")).cast("long"))
      .as[(String, Long, Long)].collect()
    def doubledRanks(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      sorted.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1L
        val hi = sorted.lastIndexWhere(_ == v) + 1L
        v -> (lo + hi)
      }.toMap
    }
    val expect = rows.groupBy(_._1).flatMap { case (rf, g) =>
      val rx = doubledRanks(g.map(_._2)); val ry = doubledRanks(g.map(_._3))
      val pairs = g.map(r => (rx(r._2).toDouble, ry(r._3).toDouble))
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (dx > 0 && dy > 0)
        Some((rf, pairs.length.toLong,
          round6(num / (math.sqrt(dx) * math.sqrt(dy)))))
      else None
    }.toSet
    val got = graft.queries.Curation.spearmanGroup(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q228

  test("q228 RFM grid matches a sequential quartile-cut replay") {
    val evs = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")),
        round(col("value") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val maxUs = evs.map(_._2).max
    val users = evs.groupBy(_._1).map { case (u, g) =>
      (u, (maxUs - g.map(_._2).max) / 3600000000L, g.length.toLong,
        g.map(_._3).sum / 100L)
    }.toSeq
    val n = users.length.toLong
    def cuts(vs: Seq[Long]): (Long, Long, Long) = {
      val sorted = vs.sorted
      def cut(q: Int): Long = {
        val k = (q * n + 3) / 4
        // smallest distinct value whose cumulative count reaches k
        sorted(k.toInt - 1)
      }
      (cut(1), cut(2), cut(3))
    }
    val (r1, r2, r3) = cuts(users.map(_._2))
    val (f1, f2, f3) = cuts(users.map(_._3))
    val (m1, m2, m3) = cuts(users.map(_._4))
    def b(v: Long, c1: Long, c2: Long, c3: Long): Int =
      1 + (if (v > c1) 1 else 0) + (if (v > c2) 1 else 0) +
        (if (v > c3) 1 else 0)
    val expect = users
      .groupBy(u => (b(u._2, r1, r2, r3), b(u._3, f1, f2, f3),
        b(u._4, m1, m2, m3)))
      .map { case ((rb, fb, mb), g) =>
        (rb, fb, mb, g.size.toLong, g.map(_._4).sum)
      }.toSet
    val got = graft.queries.Pipeline.rfmSegments(spark, sf)
      .as[(Int, Int, Int, Long, Long)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q229

  test("q229 source cosine matches collected term-count profiles") {
    val tf = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .flatMap { case (src, text) =>
        text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
          .filter(_.nonEmpty).map(t => (src, t))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = tf.groupBy(_._1._1).map { case (s0, m) =>
      s0 -> m.map { case ((_, t), c) => t -> c }
    }
    val sources = bySrc.keySet.toSeq.sorted
    val expect = (for {
      a <- sources; b <- sources if a < b
    } yield {
      val pa = bySrc(a); val pb = bySrc(b)
      val dot = pa.keysIterator.filter(pb.contains)
        .map(t => pa(t) * pb(t)).sum
      val na = math.sqrt(pa.values.map(c => (c * c).toDouble).sum)
      val nb2 = math.sqrt(pb.values.map(c => (c * c).toDouble).sum)
      (a, b, round6(dot.toDouble / (na * nb2)))
    }).toSet
    val got = graft.queries.LlmQueries.sourceProfileSim(spark, sf)
      .as[(String, String, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q230

  test("q230 audience overlap matches collected per-type user sets") {
    val p = Tables.t(spark, sf, "events")
      .select(col("event_type"), col("user_id"))
      .distinct().as[(String, Long)].collect()
    val sets = p.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keySet.toSeq.sorted
    val expect = (for {
      a <- types; b <- types if a < b
      inter = (sets(a) & sets(b)).size.toLong if inter > 0
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, inter,
      round6(inter.toDouble /
        (sets(a).size + sets(b).size - inter).toDouble))).toSet
    val got = graft.queries.Pipeline.audienceOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q231

  test("q231 association rules match collected basket counts") {
    val baskets = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .distinct().as[(Long, String)].collect()
    val byBrand = baskets.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    val nn = baskets.map(_._1).distinct.length.toLong
    val brands = byBrand.keySet.toSeq.sorted
    val expect = (for {
      a <- brands; b <- brands if a < b
      nab = (byBrand(a) & byBrand(b)).size.toLong if nab > 0
    } yield (a, b, nab,
      round6(nab.toDouble / byBrand(a).size.toDouble),
      round6(nab.toDouble * nn.toDouble /
        (byBrand(a).size.toDouble * byBrand(b).size.toDouble)))).toSet
    val got = graft.queries.Advanced.assocRules(spark, sf)
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q232

  private def h32(s0: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).take(4).map("%02x".format(_))
        .mkString, 16)

  test("q232 KMV estimate matches the k-smallest-hash replay") {
    val terms = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .flatMap { case (src, text) =>
        text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
          .filter(_.nonEmpty).map(t => (src, t))
      }.distinct
    val expect = terms.groupBy(_._1).map { case (src, g) =>
      val toks = g.map(_._2).distinct
      val hashes = toks.map(h32).distinct.sorted
      val est =
        if (hashes.length >= 64)
          BigDecimal(63.0 * 4294967296.0 / hashes(63).toDouble)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        else hashes.length.toDouble
      val rel = BigDecimal(math.abs(est - toks.length.toDouble) /
        toks.length.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, toks.length.toLong, hashes.length.toLong, est, rel)
    }.toSet
    val got = graft.queries.Analytics.kmvDistinct(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got === expect)
  }

  test("q232 KMV sketches merge associatively (k-min of union = k-min of pooled sketches)") {
    val terms = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .flatMap { case (src, text) =>
        text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
          .filter(_.nonEmpty).map(t => (src, t))
      }.distinct
    val bySrc = terms.groupBy(_._1).view
      .mapValues(_.map(t => h32(t._2)).distinct.sorted.take(64).toVector)
      .toMap
    val srcs = bySrc.keySet.toSeq.sorted
    for (Seq(a, b) <- srcs.combinations(2).take(10)) {
      val unionHashes = terms.filter(t => t._1 == a || t._1 == b)
        .map(t => h32(t._2)).distinct.sorted.take(64).toVector
      val pooled = (bySrc(a) ++ bySrc(b)).distinct.sorted.take(64).toVector
      assert(pooled === unionHashes, s"merge law broken for ($a, $b)")
    }
  }

  // ------------------------------------------------------------ q233

  test("q233 RRF matches a sequential fusion of the collected legs") {
    // legs re-derived with the same public leg definitions (each leg's
    // scoring is itself cross-engine pinned via q86/q233's oracle);
    // this test pins the FUSION: rank assignment, outer join, top-20
    val d = Tables.t(spark, sf, "documents")
    val e = Tables.t(spark, sf, "embeddings")
    val qTerms = d.filter(col("doc_id") === 0)
      .select(explode(array_distinct(graft.llm.TextOps.tokens(col("text"))))
        .as("term"))
    val lex = d.select(col("doc_id"),
      explode(array_distinct(graft.llm.TextOps.tokens(col("text"))))
        .as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .filter(col("doc_id") =!= 0)
      .as[(Long, Long)].collect()
      .sortBy(r => (-r._2, r._1)).take(50)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]]
      .head()
    val vec = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .withColumn("cos", round(graft.llm.Similarity.cosine(
        col("embedding"), typedLit(qv)), 4))
      .select(col("vec_id"), col("cos")).as[(Long, Double)].collect()
      .sortBy(r => (-r._2, r._1)).take(50)
    val rl = lex.zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rv = vec.zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expect = (rl.keySet ++ rv.keySet).toSeq.map { id =>
      val s0 = rl.get(id).map(r => 1.0 / (60 + r).toDouble).getOrElse(0.0) +
        rv.get(id).map(r => 1.0 / (60 + r).toDouble).getOrElse(0.0)
      (id, rl.get(id), rv.get(id),
        BigDecimal(s0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(r => (-r._4, r._1)).take(20).toSet
    val got = graft.queries.LlmQueries.rrfFusion(spark, sf)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q234

  test("q234 trimmed mean matches a sorted-slice replay") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val expect = docs.groupBy(_._2).flatMap { case (src, g) =>
      val xs = g.sortBy(r => (r._3, r._1)).map(_._3)
      val n = xs.length; val k = n / 10
      val kept = xs.slice(k, n - k)
      if (kept.isEmpty) None
      else Some((src, n.toLong, kept.length.toLong,
        round4(xs.sum.toDouble / n.toDouble),
        round4(kept.sum.toDouble / kept.length.toDouble)))
    }.toSet
    val got = graft.queries.Curation.trimmedMean(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q235

  test("q235 sketch-merge law holds on every source and replays sequentially") {
    val rows = graft.queries.Analytics.kmvMerge(spark, sf)
      .as[(String, Option[Double], Option[Double], Double, Double, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._6, s"${r._1}: merge law violated (${r._4} vs ${r._5})")
      assert(r._4 === r._5)
    }
    // independent replay of the whole-corpus estimate per source
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val expectWhole = docs.groupBy(_._1).map { case (src, g) =>
      val hashes = g.flatMap(d =>
        d._2.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
          .filter(_.nonEmpty)).distinct.map(h32).distinct.sorted
      val est = if (hashes.length >= 64)
        BigDecimal(63.0 * 4294967296.0 / hashes(63).toDouble)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      else hashes.length.toDouble
      src -> est
    }
    rows.foreach(r => assert(r._5 === expectWhole(r._1), r._1))
  }

  // ------------------------------------------------------------ q236

  test("q236 bootstrap CI matches a sequential hash-weighted replay") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    def weight(id: Long, b: Int): Long =
      if (b == 0) 1L
      else {
        val u = h32(s"${id}_$b").toDouble / 4294967296.0
        if (u < 0.36787944117144233) 0L
        else if (u < 0.7357588823428847) 1L
        else if (u < 0.9196986029286058) 2L else 3L
      }
    val expect = docs.groupBy(_._2).flatMap { case (src, g) =>
      val means = (0 to 32).flatMap { b =>
        val ws = g.map(d => (weight(d._1, b), d._3))
        val sw = ws.map(_._1).sum
        if (sw == 0) None
        else Some((b, ws.map(p => p._1 * p._2).sum.toDouble / sw.toDouble))
      }
      val full = means.find(_._1 == 0).map(_._2)
      val boots = means.filter(_._1 > 0).sortBy(m => (m._2, m._1)).map(_._2)
      val nr = boots.length
      if (full.isEmpty || nr == 0) None
      else Some((src, round4(full.get), nr.toLong,
        round4(boots((5 * nr + 99) / 100 - 1)),
        round4(boots((95 * nr + 99) / 100 - 1))))
    }.toSet
    val got = graft.queries.Pipeline.bootstrapCi(spark, sf)
      .as[(String, Double, Long, Double, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q237

  test("q237 CCF matches a collected lead-lag Pearson replay") {
    val daily = Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    def series(t: String) = daily.filter(_._1 == t)
      .map(r => java.time.LocalDate.parse(r._2) -> r._3).toMap
    val x = series("click"); val y = series("purchase")
    val expect = (-3 to 3).flatMap { k =>
      val pairs = x.toSeq.flatMap { case (d0, xv) =>
        y.get(d0.plusDays(k.toLong)).map(yv => (xv.toDouble, yv.toDouble))
      }
      val n = pairs.length.toDouble
      if (pairs.isEmpty) None
      else {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val num = n * sxy - sx * sy
        val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
        if (dx > 0 && dy > 0)
          Some((k, pairs.length.toLong,
            round6(num / (math.sqrt(dx) * math.sqrt(dy)))))
        else None
      }
    }.toSet
    val got = graft.queries.Extended.ccfLeadLag(spark, sf)
      .as[(Int, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q238

  test("q238 rebase indexes every series to its first day = 100") {
    val rows = graft.queries.Extended.indexRebase(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ordered = g.sortBy(_._2)
      assert(ordered.head._4 === 100.0)
      val c0 = ordered.head._3.toDouble
      ordered.foreach { r =>
        assert(r._4 === round4(BigDecimal(r._3.toDouble * 100.0 / c0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
  }

  // ------------------------------------------------------------ q239

  test("q239 seasonality factors weight-average to 1 per series") {
    // Σ (n_dow/n_all)·factor = 1 exactly by construction
    val got = graft.queries.Extended.dowSeasonality(spark, sf)
      .as[(String, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("d").cast("string"), col("c"))
      .as[(String, String, Long)].collect()
    got.groupBy(_._1).foreach { case (et, g) =>
      val days = daily.filter(_._1 == et)
      val nAll = days.length.toDouble; val sAll = days.map(_._3).sum.toDouble
      val mix = g.map(r => r._3.toDouble / nAll * r._4).sum
      assert(math.abs(mix - 1.0) < 1e-3, s"$et: $mix")
      // and each factor replays from the per-dow sums
      g.foreach { r =>
        val dws = days.filter(d =>
          java.time.LocalDate.parse(d._2).getDayOfWeek.getValue - 1 == r._2)
        val expect = round4(
          (dws.map(_._3).sum * days.length).toDouble /
            (dws.length * days.map(_._3).sum).toDouble)
        assert(r._4 === expect, s"$et dow ${r._2}")
      }
    }
  }

  // ------------------------------------------------------------ q240

  test("q240 silhouette matches a sequential centroid replay") {
    val vecs = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1e6).cast("long")))
      .as[(Long, Int, Seq[Long])].collect()
    val byLabel = vecs.groupBy(_._2)
    val cents = byLabel.view.mapValues { g =>
      val n = g.length.toLong
      val sums: Seq[Long] = g.map(_._3).toSeq.transpose.map(_.sum)
      (sums, n)
    }.toMap
    def dist(x: Seq[Long], l: Int): Double = {
      val (sums, n) = cents(l)
      val d2 = x.zip(sums).map { case (xi, si) =>
        val d = BigInt(xi * n - si); d * d
      }.sum
      math.sqrt(d2.toDouble) / (n.toDouble * 1e6)
    }
    val labels = cents.keySet
    val expect = vecs.groupBy(_._2).map { case (l, g) =>
      val micros = g.map { v =>
        val a = dist(v._3, l)
        val b = labels.filter(_ != l).map(dist(v._3, _)).min
        if (math.max(a, b) > 0)
          BigDecimal((b - a) / math.max(a, b) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else 0L
      }
      (l, g.length.toLong,
        round4(micros.sum.toDouble / (g.length.toDouble * 1e6)),
        micros.count(_ < 0).toLong)
    }.toSet
    val got = graft.queries.LlmQueries.silhouette(spark, sf)
      .as[(Int, Long, Double, Long)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q241

  test("q241 KMV Jaccard estimate matches a sketch replay; exact leg matches sets") {
    val terms = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .flatMap { case (src, text) =>
        text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
          .filter(_.nonEmpty).map(t => (src, t))
      }.distinct
    val termSets = terms.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sketches = termSets.view.mapValues(
      _.map(h32).toSeq.distinct.sorted.take(64)).toMap
    val srcs = termSets.keySet.toSeq.sorted
    val expect = (for { a <- srcs; b <- srcs if a < b } yield {
      val merged = (sketches(a) ++ sketches(b)).distinct.sorted.take(64)
      val m = merged.count(h => sketches(a).contains(h) &&
        sketches(b).contains(h))
      val ni = (termSets(a) & termSets(b)).size
      val jEst = round4(m.toDouble / merged.length.toDouble)
      val jEx = round4(ni.toDouble /
        (termSets(a).size + termSets(b).size - ni).toDouble)
      (a, b, merged.length.toLong, jEst, jEx, round4(math.abs(jEst - jEx)))
    }).toSet
    val got = graft.queries.Analytics.kmvJaccard(spark, sf)
      .as[(String, String, Long, Double, Double, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q242

  test("q242 personalized PageRank matches a sequential integer replay") {
    val clicks = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        (lit(-1L) - get_json_object(col("props"), "$.k").cast("long")))
      .distinct().as[(Long, Long)].collect()
    val edges = clicks ++ clicks.map(_.swap)
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keySet
    val seeds = nodes.filter(n => n >= 0 && n % 7 == 0)
    val tele = nodes.map(n =>
      n -> (if (seeds(n)) 150000L * nodes.size / seeds.size else 0L)).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((u, v) <- edges)
        contrib(v) += java.lang.Math.floorDiv(r(u) * 85, 100 * deg(u))
      r = nodes.map(n => n -> (contrib(n) + tele(n))).toMap
    }
    val got = graft.queries.Analytics.personalizedPagerank(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got === r)
    // seeds hold teleport mass; in a connected component non-seeds
    // still accumulate walk mass
    assert(seeds.forall(s0 => got(s0) >= tele(s0)))
  }

  // ------------------------------------------------------------ q243

  test("q243 bottom-k sample matches an md5-priority replay and is consistent under growth") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    def pri(id: Long): Int =
      (java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).take(4)
          .map("%02x".format(_)).mkString, 16) % 1000000).toInt
    val expect = docs.groupBy(_._2).flatMap { case (src, g) =>
      g.toSeq.map(d => (d._1, src, pri(d._1))).sortBy(r => (r._3, r._1))
        .take(10)
        .zipWithIndex.map { case ((id, s0, p), i) => (id, s0, p, i + 1) }
    }.toSet
    val got = graft.queries.Curation.bottomKSample(spark, sf)
      .as[(Long, String, Int, Int)].collect().toSet
    assert(got === expect)
    // consistency: dropping any doc NOT in the sample never changes it
    val sampled = expect.map(_._1)
    val victim = docs.map(_._1).filterNot(sampled).head
    val expect2 = docs.filter(_._1 != victim).groupBy(_._2)
      .flatMap { case (src, g) =>
        g.toSeq.map(d => (d._1, src, pri(d._1))).sortBy(r => (r._3, r._1))
          .take(10)
          .zipWithIndex.map { case ((id, s0, p), i) => (id, s0, p, i + 1) }
      }.toSet
    assert(expect2 === expect)
  }

  // ------------------------------------------------------------ q244/q245

  private def coEdges(): Seq[(Long, Long)] = {
    val items = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    items.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
  }

  test("q244 assortativity matches a collected degree-Pearson replay") {
    val und = coEdges().flatMap(e => Seq(e, e.swap))
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pairs = und.map { case (u, v) => (deg(u).toDouble, deg(v).toDouble) }
    val n = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy
    val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
    val expect = (pairs.length.toLong,
      round6(num / (math.sqrt(dx) * math.sqrt(dy))))
    val got = graft.queries.Analytics.assortativity(spark, sf)
      .as[(Long, Double)].collect()
    assert(got.toSeq === Seq(expect))
  }

  test("q245 component profile matches a BFS components replay") {
    val edges = coEdges()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    var unvisited = adj.keySet.toSet
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (unvisited.nonEmpty) {
      var frontier = Set(unvisited.head); var comp = Set.empty[Long]
      while (frontier.nonEmpty) {
        comp ++= frontier
        frontier = frontier.flatMap(adj).diff(comp)
      }
      sizes += comp.size.toLong
      unvisited = unvisited.diff(comp)
    }
    val nn = sizes.sum.toDouble; val mx = sizes.max.toDouble
    val gf = round4(mx / nn)
    val expect = sizes.groupBy(identity).map { case (sz, g) =>
      (sz, g.size.toLong, sizes.length.toLong, gf)
    }.toSet
    val got = graft.queries.Analytics.componentProfile(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q246

  test("q246 Zipf slope matches a collected log-log OLS replay") {
    val tf = Tables.t(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap(_.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy(r => (-r._2, r._1)).take(100)
    val pts = tf.zipWithIndex.map { case ((_, c), i) =>
      def q6(v: Double) = BigDecimal(v * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (q6(math.log((i + 1).toDouble)), q6(math.log(c.toDouble)))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1.toDouble).sum; val sy = pts.map(_._2.toDouble).sum
    val sxx = pts.map(p => p._1.toDouble * p._1.toDouble).sum
    val sxy = pts.map(p => p._1.toDouble * p._2.toDouble).sum
    val expect = (pts.length.toLong,
      round4((n * sxy - sx * sy) / (n * sxx - sx * sx)))
    val got = graft.queries.Analytics.zipfFit(spark, sf)
      .as[(Long, Double)].collect()
    assert(got.toSeq === Seq(expect))
    // the synthetic corpus is far flatter than natural text (measured
    // ≈ −0.18 at sf0.001 vs ≈ −1 for a real crawl) — which is exactly
    // the signal the operator exists to surface; only the sign is a
    // structural invariant (ranks sort by descending frequency)
    assert(expect._2 < 0.0, s"slope must be negative: ${expect._2}")
  }

  // ------------------------------------------------------------ q247

  test("q247 water-filling replays sequentially and sums exactly to the budget") {
    val caps = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(d =>
        d._2.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
          .length.toLong).sum).toMap
    val n = caps.size.toLong
    val b = caps.values.sum / 2
    val asc = caps.toSeq.sortBy(r => (r._2, r._1))
    // sequential water-fill: saturate while the smallest cap sits below
    // the level the remaining budget implies
    var cum = 0L; var k = 0L; var cumK = 0L
    asc.zipWithIndex.foreach { case ((_, c), i) =>
      cum += c
      if (c * (n - (i + 1)) <= b - cum) { k = i + 1; cumK = cum }
    }
    val lamN = b - cumK; val lamD = n - k
    val satSet = asc.take(k.toInt).map(_._1).toSet
    val unsatOrdered = caps.keySet.toSeq.sorted.filterNot(satSet)
    val expect = caps.map { case (src, c) =>
      val alloc =
        if (satSet(src)) c
        else lamN / lamD +
          (if (unsatOrdered.indexOf(src) + 1 <= lamN % lamD) 1L else 0L)
      (src, c, alloc, satSet(src))
    }.toSet
    val got = graft.queries.Curation.waterfill(spark, sf)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got === expect)
    assert(got.toSeq.map(_._3).sum === b, "allocations must sum to the budget")
    got.foreach(r => assert(r._3 <= r._2, s"alloc over cap: $r"))
  }

  // ------------------------------------------------------------ q248

  test("q248 effective tokens matches a representative-attribution replay") {
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) =>
        val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
        (id, src, norm.split(" ", -1).length.toLong, md5hex(norm))
      }
    val reps = docs.groupBy(_._4).view.mapValues(_.map(_._1).min).toMap
    val expect = docs.groupBy(_._2).map { case (src, g) =>
      val raw = g.map(_._3).sum
      val uniq = g.filter(d => reps(d._4) == d._1).map(_._3).sum
      (src, g.length.toLong, raw, uniq, round4(raw.toDouble / uniq.toDouble))
    }.toSet
    val got = graft.queries.Curation.effectiveTokens(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got === expect)
    got.foreach(r => assert(r._5 >= 1.0, s"inflation < 1: $r"))
  }

  // ------------------------------------------------------------ q249

  test("q249 split leakage reports the full pair grid with exact overlap counts") {
    val got = graft.queries.Curation.splitLeakage(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet ===
      Set(("test", "train"), ("test", "val"), ("train", "val")))
    // replay: md5 bucket split + fingerprint overlap
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, text) =>
        val b = java.lang.Long.parseLong(
          md5hex(id.toString).take(8), 16) % 100
        val split = if (b < 80) "train" else if (b < 90) "val" else "test"
        (id, split, md5hex(text.trim.toLowerCase.replaceAll("\\s+", " ")))
      }
    val bySplit = docs.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    got.foreach { case (a, b, nfp, nd) =>
      val shared = bySplit(a) & bySplit(b)
      assert(nfp === shared.size.toLong, s"($a,$b)")
      assert(nd === docs.count(d => d._2 == a && shared(d._3)).toLong,
        s"($a,$b) docs")
    }
  }

  // ------------------------------------------------------------ q250

  test("q250 joint histogram covers the corpus exactly once") {
    val got = graft.queries.Curation.jointHistogram(spark, sf)
      .as[(Int, Int, Long)].collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(got.map(_._3).sum === total, "cells must partition the corpus")
    assert(got.forall(r => r._1 >= 1 && r._1 <= 4 && r._2 >= 1 && r._2 <= 3))
    // quartile marginals: each length quartile holds ~n/4 (nearest-rank
    // cuts guarantee within one distinct-value run)
    val byLen = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(byLen.values.forall(v => v > 0))
  }

  // ------------------------------------------------------------ q251

  test("q251 seasonal anomaly matches a sequential deseasonalize+MAD replay") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val expect = daily.groupBy(_._1).flatMap { case (et, g) =>
      val days = g.toSeq
      val sAll = days.map(_._3).sum; val nAll = days.length.toLong
      def dow(d: String) =
        java.time.LocalDate.parse(d).getDayOfWeek.getValue - 1
      val byDow = days.groupBy(r => dow(r._2))
        .view.mapValues(v => (v.map(_._3).sum, v.length.toLong)).toMap
      val rm = days.map { case (_, d, c) =>
        val (sd, nd) = byDow(dow(d))
        (d, c, BigDecimal((c * nd * sAll).toDouble / (sd * nAll).toDouble
          * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
      val sorted = rm.map(_._3).sorted
      val n = sorted.length
      val med2 = sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)
      val dev2s = rm.map(r => math.abs(2 * r._3 - med2)).sorted
      val mad4 = dev2s((n + 1) / 2 - 1) + dev2s((n + 2) / 2 - 1)
      rm.map { case (d, c, r) =>
        (et, d, c, round4(r.toDouble / 1e6),
          2 * math.abs(2 * r - med2) > 3 * mad4)
      }
    }.toSet
    val got = graft.queries.Extended.seasonalAnomaly(spark, sf)
      .as[(String, String, Long, Double, Boolean)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q252

  test("q252 phrase search matches a sequential bigram scan") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      val hits = toks.indices.dropRight(1)
        .filter(i => toks(i) == "the" && toks(i + 1) == "data")
      if (hits.isEmpty) None
      else Some((id, hits.length.toLong, hits.min))
    }.toSet
    val got = graft.queries.LlmQueries.phraseSearch(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.nonEmpty && got === expect)
  }

  // ------------------------------------------------------------ q253

  test("q253 top paths matches a sequential sessionize+count replay") {
    val evs = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val paths = evs.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(r => (r._3, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var last = Long.MinValue
      ordered.foreach { e =>
        if (last != Long.MinValue && e._3 - last > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += e._4; last = e._3
      }
      sessions.map(_.mkString(">"))
    }.toSeq
    val expect = paths.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(r => (-r._2, r._1)).take(10).toSet
    val got = graft.queries.Extended.topPaths(spark, sf)
      .as[(String, Long)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------------ q254

  test("q254 Theil-Sen matches a sequential pairwise-slope median replay") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val base = java.time.LocalDate.parse("2024-01-01")
    val expect = daily.groupBy(_._1).map { case (et, g) =>
      val pts = g.toSeq.map(r =>
        (java.time.temporal.ChronoUnit.DAYS.between(
          base, java.time.LocalDate.parse(r._2)), r._3))
      val slopes = (for {
        (da, ca) <- pts; (db, cb) <- pts if da < db
      } yield BigDecimal((cb - ca).toDouble / (db - da).toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sorted
      val n = slopes.length
      val med2 = slopes((n + 1) / 2 - 1) + slopes((n + 2) / 2 - 1)
      (et, n.toLong, round4(med2.toDouble / 2e6))
    }.toSet
    val got = graft.queries.Extended.theilSenTrend(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expect)
  }

  // ------------------------------------------------------- q255 / q256

  private def collectedLegs(): (Map[Long, Long], Map[Long, Long]) = {
    val d = Tables.t(spark, sf, "documents")
    val e = Tables.t(spark, sf, "embeddings")
    val qTerms = d.filter(col("doc_id") === 0)
      .select(explode(array_distinct(graft.llm.TextOps.tokens(col("text"))))
        .as("term"))
    val lex = d.select(col("doc_id"),
      explode(array_distinct(graft.llm.TextOps.tokens(col("text"))))
        .as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .filter(col("doc_id") =!= 0)
      .as[(Long, Long)].collect()
      .sortBy(r => (-r._2, r._1)).take(50)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]]
      .head()
    val vec = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .withColumn("cos", round(graft.llm.Similarity.cosine(
        col("embedding"), typedLit(qv)), 4))
      .select(col("vec_id"), col("cos")).as[(Long, Double)].collect()
      .sortBy(r => (-r._2, r._1)).take(50)
    (lex.zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap,
      vec.zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap)
  }

  test("q255 RBO matches a sequential prefix-overlap replay") {
    val (rl, rv) = collectedLegs()
    val common = rl.keySet & rv.keySet
    val picos = (1 to 50).map { dd =>
      val ov = common.count(id => rl(id) <= dd && rv(id) <= dd)
      BigDecimal(ov.toDouble / dd.toDouble / (1L << dd).toDouble * 1e12)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expect = (common.size.toLong, round6(picos.sum.toDouble / 1e12))
    val got = graft.queries.LlmQueries.rboAgreement(spark, sf)
      .as[(Long, Double)].collect()
    assert(got.toSeq === Seq(expect))
    assert(expect._2 >= 0.0 && expect._2 <= 1.0)
  }

  test("q256 Kendall tau matches a pool-ranked pairwise concordance replay") {
    // round-10 pool semantics: the lexical top-50 is the SHARED
    // candidate pool, ranked by both measures — the two-leg
    // intersection form went vacuous at sf1 (0 common docs)
    val (rl, _) = collectedLegs()
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
    // cosine rank WITHIN the pool (members without an embedding drop
    // from both sides, exactly as the operator's join does)
    val cos = e.filter(col("vec_id").isin(rl.keySet.toSeq: _*))
      .select(col("vec_id"), round(graft.llm.Similarity.cosine(
        col("embedding").cast("array<double>"), typedLit(qv)), 4).as("cos"))
      .as[(Long, Double)].collect()
    val rv = cos.sortBy(r => (-r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val members = rv.keySet.toSeq.sorted
    val pairs = for {
      i <- members.indices; j <- (i + 1) until members.length
    } yield (rl(members(i)) < rl(members(j))) == (rv(members(i)) < rv(members(j)))
    val np = pairs.length.toLong
    val nc = pairs.count(identity).toLong
    val expect = (np, round6((2 * nc - np).toDouble / np.toDouble))
    val got = graft.queries.LlmQueries.kendallTau(spark, sf)
      .as[(Long, Double)].collect()
    assert(got.toSeq === Seq(expect))
    assert(np >= 1000L, "the pool design must compare a full pair set")
  }

  // ------------------------------------------------------------ q222

  test("q222 quantile normalization matches a rank-walk replay") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val globalSorted = docs.map(_._3).sorted
    val nn = docs.length
    val expect = docs.groupBy(_._2).flatMap { case (src, g) =>
      val ordered = g.sortBy(r => (r._3, r._1))
      val m = ordered.length
      ordered.zipWithIndex.toSeq.map { case ((id, _, nc), i) =>
        val pr = if (m == 1) 0.0 else i.toDouble / (m - 1).toDouble
        val idx = BigDecimal(pr * (nn - 1).toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
        (id, src, nc, globalSorted(idx))
      }
    }.toSet
    val got = graft.queries.Curation.quantileNormalize(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === expect)
  }
}
