package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent replays for the classifier-evaluation family
  * (q270–q275): the per-doc (score, label, pred) triple is rebuilt from
  * the already-oracle-verified q258/q39 outputs, then AUC is recomputed
  * by brute-force pair counting, κ by the textbook po/pe formula, the
  * sweep and bins by direct recounting, and Kruskal–Wallis by a
  * collected average-rank walk with the SAME integral quantization —
  * every assert is exact, no tolerances. (The DuckDB oracle is the
  * cross-engine gate; these pin the semantics.)
  */
class ClassifierEvalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def half4(num: BigInt, den: BigInt): Double =
    (BigDecimal(num) / BigDecimal(den))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (doc_id, q4i, label, pred) rebuilt from q258 + q39 outputs. */
  private lazy val triples: Array[(Long, Long, Boolean, Boolean)] = {
    val learned = graft.queries.Curation.learnedQuality(spark, sf)
      .select("doc_id", "quality4", "w_sum")
      .as[(Long, Double, Long)].collect()
      .map { case (id, q4, w) => id -> (math.round(q4 * 10000.0), w > 0) }
      .toMap
    graft.queries.LlmQueries.qualityScore(spark, sf)
      .select("doc_id", "quality").as[(Long, Double)].collect()
      .map { case (id, q) =>
        val (q4i, pred) = learned(id)
        (id, q4i, q >= 0.3, pred)
      }
  }

  test("q270 AUC equals brute-force pair counting") {
    val pos = triples.filter(_._3).map(_._2)
    val neg = triples.filterNot(_._3).map(_._2)
    // 2·(wins) + (ties) over all pos×neg pairs, then /(2·npos·nneg)
    var num2 = BigInt(0)
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val expect = (BigDecimal(num2) /
      (BigDecimal(2) * pos.length * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.queries.Curation.rocAuc(spark, sf)
      .as[(Long, Long, Double)].collect().head
    assert(got._1 === pos.length.toLong)
    assert(got._2 === neg.length.toLong)
    assert(got._3 === expect)
  }

  test("q273 kappa equals the textbook po/pe formula") {
    val n11 = triples.count(t => t._3 && t._4).toLong
    val n10 = triples.count(t => t._3 && !t._4).toLong
    val n01 = triples.count(t => !t._3 && t._4).toLong
    val n00 = triples.count(t => !t._3 && !t._4).toLong
    val n = BigDecimal(n11 + n10 + n01 + n00)
    val po = BigDecimal(n11 + n00) / n
    val pe = (BigDecimal(n11 + n10) * BigDecimal(n11 + n01) +
      BigDecimal(n01 + n00) * BigDecimal(n10 + n00)) / (n * n)
    val expect = ((po - pe) / (1 - pe))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.queries.Curation.kappaAgreement(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert((got._1, got._2, got._3, got._4) === ((n11, n10, n01, n00)))
    assert(got._5 === po.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._6 === expect)
  }

  test("q272 sweep: exact counts, exact 4-dp metrics, monotone recall") {
    val rows = graft.queries.Curation.thresholdSweep(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])].collect()
    assert(rows.length === 5)
    val nPos = triples.count(_._3).toLong
    val n = triples.length.toLong
    for ((thrI, thr, tp, fp, fn, tn, p4, r4, f14) <- rows) {
      val etp = triples.count(t => t._3 && t._2 >= thr).toLong
      val efp = triples.count(t => !t._3 && t._2 >= thr).toLong
      assert((tp, fp) === ((etp, efp)), s"thr_i=$thrI")
      assert(tp + fn === nPos)
      assert(tp + fp + fn + tn === n)
      assert(p4 === (if (tp + fp == 0) None
        else Some(half4(tp, tp + fp))))
      assert(r4 === (if (nPos == 0) None else Some(half4(tp, nPos))))
      assert(f14 === (if (2 * tp + fp + fn == 0) None
        else Some(half4(2 * tp, 2 * tp + fp + fn))))
    }
    // recall non-increasing as the threshold rises
    val recalls = rows.sortBy(_._1).map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    // lowest threshold is min score: everything kept
    assert(rows.minBy(_._1)._4 + rows.minBy(_._1)._3 === n)
  }

  test("q271 bins: partition the corpus, exact fractions and means") {
    val rows = graft.queries.Curation.calibrationBins(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum === triples.length.toLong)
    assert(rows.map(_._3).sum === triples.count(_._3).toLong)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    val mn = triples.map(_._2).min; val mx = triples.map(_._2).max
    for ((bin, n, nPos, pf4, ms4) <- rows) {
      val in = triples.filter(t => (t._2 - mn) * 10 / (mx - mn + 1) == bin)
      assert(in.length.toLong === n)
      assert(in.count(_._3).toLong === nPos)
      assert(pf4 === half4(nPos, n))
      // mean q4i half-away to integer, then /10000 (score units)
      val sq = in.map(t => BigInt(t._2)).sum
      val mi = (BigDecimal(sq) / BigDecimal(n))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)
      assert(ms4 === (mi / 10000).toDouble)
    }
  }

  test("q274 Kruskal-Wallis equals a collected rank walk (same quantization)") {
    val vals = Tables.t(spark, sf, "documents")
      .select("source", "n_chars").as[(String, Long)].collect()
    val n = vals.length.toLong
    // doubled mid-ranks per distinct value
    val grouped = vals.groupBy(_._2).toSeq.sortBy(_._1)
    var lo = 0L
    val r2 = grouped.map { case (v, g) =>
      val t = g.length.toLong
      val d = (lo + 1) + (lo + t) // lo+hi, doubled mid-rank
      lo += t
      v -> (d, t)
    }.toMap
    val tsum = r2.values.map { case (_, t) =>
      BigInt(t) * t * t - t }.sum
    val bySrc = vals.groupBy(_._1)
    val sq = bySrc.values.map { g =>
      val r12 = g.map(x => BigInt(r2(x._2)._1)).sum
      (r12 * r12) / (BigInt(4) * g.length) // floor, as the query's DIV
    }.sum
    val nd = n.toDouble
    val h = 12.0 * sq.toDouble / (nd * (nd + 1.0)) - 3.0 * (nd + 1.0)
    val c = 1.0 - tsum.toDouble / (nd * nd * nd - nd)
    val got = graft.queries.Analytics.kruskalWallis(spark, sf)
      .as[(Int, Long, Double, Double)].collect().head
    assert(got._1 === bySrc.size)
    assert(got._2 === n)
    assert(got._3 === BigDecimal(h)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._4 === BigDecimal(h / c)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q275 MRR is consistent with q269 and the reciprocal table") {
    val mrr = graft.queries.LlmQueries.mrrEval(spark, sf)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val ndcg = graft.queries.LlmQueries.ndcgEval(spark, sf)
      .select("query_id", "n_hit").as[(Long, Int)].collect().sortBy(_._1)
    assert(mrr.map(_._1).toSeq === ndcg.map(_._1).toSeq)
    for (((id, rk, rr6), (_, nHit)) <- mrr.zip(ndcg)) {
      assert((rk > 0) === (nHit > 0), s"query $id")
      if (rk > 0) {
        assert(rk >= 1 && rk <= 10)
        assert(rr6 === math.round(1e6 / rk))
      } else assert(rr6 === 0L)
    }
    // at least one query must actually hit on the fixture
    assert(mrr.exists(_._2 > 0))
  }
}
