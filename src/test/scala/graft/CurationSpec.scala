package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextOps

/** Ground-truth specs for the round-4 curation/analytics operators
  * (Curation.scala). Value-level parity with DuckDB is driven by the
  * oracle gate; here we pin the semantic invariants and the plan shapes
  * that keep these operators scale-safe. */
class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("decontam only flags train docs, with overlap counts matching brute force") {
    val d = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"),
        graft.queries.Fragments.splitBucket(col("doc_id")).as("bucket"))
    val buckets = d.select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    // brute force: distinct 8-gram sets per doc, intersect train × test-union
    val sh = d.select(col("doc_id"),
        TextOps.wordShingles(col("text"), 8).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val testUnion = sh.collect {
      case (id, g) if buckets(id) >= 90 => g.toSet
    }.fold(Set.empty[String])(_ ++ _)
    val expect = sh.collect {
      case (id, g) if buckets(id) < 80 && g.toSet.intersect(testUnion).nonEmpty =>
        id -> g.toSet.intersect(testUnion).size
    }.toMap
    val got = graft.queries.Curation.decontam(spark, sf)
      .as[(Long, Int)].collect().toMap
    assert(got === expect)
  }

  test("decontam broadcasts the test-shingle set (no corpus-side shuffle join)") {
    val p = graft.queries.Curation.decontam(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), "test-set join must not sort-merge")
  }

  test("cohort retention: offset-0 users per cohort equals cohort sizes") {
    val ret = graft.queries.Curation.cohortRetention(spark, sf)
      .as[(String, Int, Long)].collect()
    assert(ret.forall(_._2 >= 0), "offsets are non-negative")
    // every user appears at offset 0 of exactly their own cohort
    val zeroSum = ret.filter(_._2 == 0).map(_._3).sum
    val nUsers = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(zeroSum === nUsers,
      s"offset-0 across cohorts ($zeroSum) must cover every user ($nUsers)")
    // retention at any offset never exceeds the cohort's size
    val cohortSize = ret.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(ret.forall(r => r._3 <= cohortSize(r._1)))
  }

  test("range-frame hour matches a brute-force count for the busiest user") {
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"))
    val busiest = ev.groupBy("user_id").count()
      .orderBy(col("count").desc).head().getLong(0)
    val times = ev.filter(col("user_id") === busiest)
      .select("event_id", "sec").as[(Long, Long)].collect()
    val expect = times.map { case (id, s0) =>
      id -> times.count { case (_, s) => s >= s0 - 3600 && s <= s0 }
    }.toMap
    val got = graft.queries.Curation.rangeFrameHour(spark, sf)
      .filter(col("user_id") === busiest)
      .select("event_id", "n_hour").as[(Long, Int)].collect().toMap
    assert(got === expect)
  }

  test("ntile deciles partition the table into 10 near-equal ordered slices") {
    val rows = graft.queries.Curation.ntileDeciles(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val total = Tables.t(spark, sf, "customer").count()
    assert(rows.map(_._2).sum === total)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "ntile balance")
    rows.foreach { case (_, _, mn, mx, _) => assert(mn <= mx) }
    // deciles are ordered: each decile's max <= next decile's min
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"decile ${a._1} overlaps ${b._1}")
      case _ =>
    }
  }

  test("incremental partial-agg merge equals a full recompute") {
    val o = Tables.t(spark, sf, "orders")
    val full = o.groupBy(col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100)
          .as("total"))
      .as[(String, Long, Double)].collect().toSet
    val merged = graft.queries.Curation.incrementalAgg(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(merged === full)
  }

  test("canonical urls carry no scheme-noise, query, fragment, or trailing slash") {
    val rows = graft.queries.Curation.urlCanonical(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, _) =>
      assert(u == u.toLowerCase, s"not lowercased: $u")
      assert(!u.contains("?") && !u.contains("#"), s"query/fragment kept: $u")
      assert(!u.endsWith("/"), s"trailing slash kept: $u")
      assert(n >= 1)
    }
    assert(rows.map(_._2).sum === Tables.t(spark, sf, "documents").count(),
      "every doc lands in exactly one canonical group")
  }

  test("z-scores standardize each (label, dim) group to mean≈0, sd≈1") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"))
    val z = graft.queries.Curation.zscoreNorm(spark, sf)
      .join(e, "vec_id")
    val stats = z.groupBy("label", "pos")
      .agg(avg("z").as("m"), stddev_pop("z").as("sd"))
      .as[(Int, Int, Double, Double)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (l, p, m, sd) =>
      assert(math.abs(m) < 0.01, s"label=$l pos=$p mean=$m")
      assert(math.abs(sd - 1.0) < 0.01, s"label=$l pos=$p sd=$sd")
    }
  }

  test("sequence packs are dense per source and respect the running budget") {
    val rows = graft.queries.Curation.sequencePack(spark, sf)
      .as[(Long, String, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val packs = docs.map(_._4).distinct.sorted
      assert(packs.head === 0, s"$src packs must start at 0")
      assert(packs === (packs.head to packs.last).toSeq, s"$src packs dense")
      // a doc's pack is its preceding cumulative total / 2048: totals of
      // packs 0..k-1 must each have crossed the budget boundary
      val byPack = docs.groupBy(_._4).map { case (p, d) => p -> d.map(_._3.toLong).sum }
      packs.dropRight(1).foreach { p =>
        val through = byPack.filterKeys(_ <= p).values.sum
        assert(through > p.toLong * 2048,
          s"$src pack $p closed before crossing its boundary")
      }
    }
  }

  test("forward fill densifies each user's day span and carries values over gaps") {
    val out = graft.queries.Curation.forwardFill(spark, sf)
      .as[(Long, String, Boolean, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (user, rows) =>
      val days = rows.map(_._2).sorted
      // dense day spine: consecutive ISO dates
      val parsed = days.map(java.time.LocalDate.parse)
      parsed.sliding(2).foreach {
        case Array(a, b) => assert(a.plusDays(1) === b, s"user $user gap $a->$b")
        case _ =>
      }
      // first day is never a gap (spine starts at the user's first event)
      assert(!rows.minBy(_._2)._3, s"user $user first day must be real")
      // gap rows repeat the previous day's filled value
      val byDay = rows.sortBy(_._2)
      byDay.sliding(2).foreach {
        case Array(prev, cur) if cur._3 =>
          assert(cur._4 === prev._4, s"user $user day ${cur._2} fill mismatch")
        case _ =>
      }
    }
  }

  test("rank battery: percent_rank in [0,1], cume_dist positive, ranks tie-free") {
    val rows = graft.queries.Curation.rankBattery(spark, sf)
      .as[(Long, String, Int, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, drk, prk, cd) =>
      assert(drk >= 1)
      assert(prk >= 0.0 && prk <= 1.0)
      assert(cd > 0.0 && cd <= 1.0)
    }
    // tie-free ordering key → dense_rank is a permutation of 1..n per status
    rows.groupBy(_._2).foreach { case (st, g) =>
      assert(g.map(_._3).sorted.toSeq === (1 to g.length), s"status $st")
    }
  }

  test("string agg roster is the alphabetized high-balance customer list") {
    val rows = graft.queries.Curation.stringAgg(spark, sf)
      .as[(String, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, roster) =>
      val names = roster.split(",").toSeq
      assert(names.length === n)
      assert(names === names.sorted, "roster must be alphabetized")
    }
  }

  test("EXISTS decorrelates to a semi join; NOT IN plans null-aware anti") {
    val pExists = graft.queries.Curation.existsSubquery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pExists.contains("Semi"), pExists.take(600))
    val pNotIn = graft.queries.Curation.notInSubquery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pNotIn.contains("NullAwareAnti") || pNotIn.contains("LeftAnti"),
      pNotIn.take(600))
  }

  test("pipeline capstone accounting is consistent across its stages") {
    val rows = graft.queries.Curation.pipelineCapstone(spark, sf)
      .as[(String, String, Int, Long, Int)].collect()
    assert(rows.nonEmpty)
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_._3.toLong).sum <= total, "stages only drop docs")
    assert(rows.map(_._1).distinct.sorted.toSeq.forall(
      Set("train", "val", "test").contains))
    rows.foreach { case (split, src, nDocs, nTok, nPacks) =>
      assert(nDocs >= 1 && nTok >= nDocs, s"$split/$src token floor")
      assert(nPacks >= 1 && nPacks <= nDocs, s"$split/$src pack bounds")
      // running-total packing can overshoot a boundary by at most one
      // doc per pack, so the pack count is at least the full-budget floor
      assert(nPacks >= (nTok / (2048 * 2)).toInt, s"$split/$src pack floor")
    }
  }

  test("unpivot yields exactly 4 metric rows per source row") {
    val src = Tables.t(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 997 === 0).count()
    val out = graft.queries.Curation.unpivotMeasures(spark, sf)
    assert(out.count() === src * 4)
    assert(out.select("metric").distinct().count() === 4)
  }

  test("map functions report sorted segment keys consistent with the counts") {
    val rows = graft.queries.Curation.mapFunctions(spark, sf)
      .as[(String, Int, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSeg, bld, segs) =>
      val keys = segs.split(",").toSeq
      assert(keys.length === nSeg)
      assert(keys === keys.sorted, "map built from sorted entries")
      assert(bld >= 0)
      assert(keys.contains("BUILDING") === (bld > 0))
    }
  }

  test("quantile bucketing matches exact ntile deciles and adds no exchange") {
    val cust = Tables.t(spark, sf, "customer")
    val out = graft.operators.Quantiles
      .bucketByQuantiles(cust, "c_acctbal", 10, relErr = 0.0001)
    // shuffle-free: the bucket assignment plan has no Exchange at all
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(500))
    // agreement with the exact global ntile everywhere but sketch-error
    // boundary ties
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val exact = cust.select(col("c_custkey"), ntile(10).over(w).as("ex"))
    val joined = out.select(col("c_custkey"), col("bucket")).join(exact, "c_custkey")
    val n = joined.count()
    val agree = joined.filter(col("bucket") === col("ex")).count()
    assert(agree.toDouble / n > 0.99, s"agreement ${agree.toDouble / n}")
    // buckets near-balanced: each within 5% of n/10
    val sizes = out.groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet === (1 to 10).toSet)
    sizes.values.foreach(c =>
      assert(math.abs(c - n / 10.0) <= n * 0.05, s"bucket size $c vs ${n / 10}"))
  }

  test("windowed distinct: bucket totals reconcile with the raw event stream") {
    val rows = graft.queries.Curation.windowedDistinct(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = Tables.t(spark, sf, "events")
    assert(rows.map(_._2).sum === ev.count(), "buckets partition all events")
    rows.foreach { case (start, n, u) =>
      assert(u >= 1 && u <= n, s"$start distinct users bounded by events")
      // bucket starts sit on 6-hour boundaries
      assert(start.endsWith("00:00") || start.endsWith("06:00") ||
        start.endsWith("12:00") || start.endsWith("18:00"), start)
    }
    val maxUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).max <= maxUsers)
  }

  test("MAD outliers: median/mad from a driver-side recompute, outliers counted") {
    val got = graft.queries.Curation.madOutliers(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    val raw = Tables.t(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    got.foreach { case (tpe, n, med, mad, outliers) =>
      val cs = raw(tpe).map(_._2.toDouble)
      assert(n === cs.length)
      val m = medianOf(cs)
      assert(math.abs(med - m / 100) < 1e-9, s"$tpe median")
      val madRef = medianOf(cs.map(c => math.abs(c - m)))
      assert(math.abs(mad - madRef / 100) < 1e-9, s"$tpe mad")
      assert(outliers === cs.count(c => math.abs(c - m) > madRef * 3), s"$tpe outliers")
    }
  }

  test("z-score stats join is broadcast (corpus side never shuffles)") {
    val p = graft.queries.Curation.zscoreNorm(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }
}
