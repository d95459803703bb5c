package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth specs for the round-6 additions (q211–q216): HyperBall
  * vs exact-reachability registers, skyline vs the O(n²) dominance
  * definition, time-weighted averages vs a sequential per-user replay,
  * DSIR weights vs an independent integer recomputation, ER best-match
  * vs a collected-pairs argmax, and BPE fertility vs the per-doc q205
  * counts. (The DuckDB oracle is the cross-engine gate; these pin the
  * SEMANTICS against definitions computed a different way.) */
class Round6OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ------------------------------------------------------------ q211

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("hyperball matches registers derived from exact reachability") {
    // exact balls by BFS over the collected co-purchase graph, then the
    // same md5 register derivation and raw HLL estimator as the operator
    val items = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = items.as("x").join(items.as("y"), Seq("o"))
      .where(col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s")).where(col("s") >= 2)
      .select("a", "b").as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = adj.keySet.toSeq.sorted
    def reg(n: Long): (Int, Int) = {
      val h = md5hex(n.toString)
      val bkt = (java.lang.Long.parseLong(h.substring(0, 4), 16) % 16).toInt
      val v = java.lang.Long.parseLong(h.substring(4, 10), 16)
      val rho = if (v == 0) 25 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      (bkt, rho)
    }
    def estOf(ball: Set[Long]): Double = {
      val regs = ball.toSeq.map(reg).groupBy(_._1).view.mapValues(_.map(_._2).max)
      val nb = regs.size
      val zn = regs.values.map(m => 1.0 / (1L << m)).sum
      val raw = 172.288 / ((16.0 - nb) + zn)
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var balls: Map[Long, Set[Long]] = nodes.map(n => n -> Set(n)).toMap
    val expect = (1 to 3).flatMap { r =>
      balls = balls.map { case (n, b) => n -> (b ++ b.flatMap(adj)) }
      nodes.map(n => (n, r, estOf(balls(n))))
    }.toSet
    val got = graft.queries.Analytics.hyperBall(spark, sf)
      .as[(Long, Int, Double)].collect().toSet
    assert(got === expect)
  }

  test("hyperball estimates are non-decreasing in radius") {
    val rows = graft.queries.Analytics.hyperBall(spark, sf)
      .as[(Long, Int, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byR = rs.sortBy(_._2).map(_._3)
      assert(byR.zip(byR.tail).forall { case (a, b) => b >= a })
    }
  }

  // ------------------------------------------------------------ q213

  test("pareto frontier equals the O(n^2) dominance definition") {
    val all = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("p"))
      .as[(Long, Long, Long)].collect()
    val expect = all.filter { case (_, d, p) =>
      !all.exists { case (_, d2, p2) =>
        d2 >= d && p2 >= p && (d2 > d || p2 > p)
      }
    }.map(_._1).toSet
    val got = graft.queries.Advanced.paretoFrontier(spark, sf)
      .select("o_orderkey").as[Long].collect().toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------ q214

  test("time-weighted average matches a sequential per-user replay") {
    val evs = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 1000).cast("long").as("vm"))
      .as[(Long, Long, Long, Long)].collect()
    val expect = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val ivs = sorted.zip(sorted.tail).map { case (cur, nxt) =>
        ((nxt._3 - cur._3) / 1000000L, cur._4)
      }
      val held = ivs.map(_._1).sum
      val num = ivs.map { case (dt, vm) => vm * dt }.sum
      if (ivs.nonEmpty && held > 0)
        Some(u -> (ivs.size.toLong, held,
          BigDecimal(num.toDouble / (held.toDouble * 1000.0))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }
    val got = graft.queries.Extended.timeWeightedAvg(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === expect)
  }

  // ------------------------------------------------------------ q212

  test("dsir weights match an independent integer recomputation") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
    def bucket(term: String): Int =
      (java.lang.Long.parseLong(md5hex(term).substring(0, 8), 16) % 64).toInt
    val all = docs.flatMap { case (id, src, t) =>
      toks(t).map(tk => (id, src, bucket(tk)))
    }
    val rK = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tK = all.filter(_._2 == "src0").groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val score = rK.map { case (b, r) =>
      b -> ((tK(b) * 2 + 1) * 1000000L) / (r * 2 + 1)
    }
    val weights = all.groupBy(_._1).map { case (id, rows) =>
      (id, rows.size.toLong, rows.map(r => score(r._3)).sum)
    }.toSeq
    val expect = weights.sortBy { case (id, _, w) => (-w, id) }.take(30)
      .map { case (id, n, w) => (id, n, w, w / n) }
    val got = graft.queries.Pipeline.dsirWeights(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  // ------------------------------------------------------------ q216

  test("er best-match is the argmax with the declared margin gate") {
    val parts = Tables.t(spark, sf, "part")
      .select(col("p_partkey"), col("p_name")).as[(Long, String)].collect()
    def block(name: String): (String, String) =
      (name.split(" ").last, name.substring(0, 1))
    val byBlock = parts.groupBy(p => block(p._2))
    val expect = parts.flatMap { case (id, name) =>
      val cands: Seq[(Long, Double)] =
        byBlock(block(name)).filter(_._1 != id).toSeq.map { case (cid, cname) =>
          val jw = BigDecimal(graft.functions.JaroWinklerKernel.similarity(
              org.apache.spark.unsafe.types.UTF8String.fromString(name),
              org.apache.spark.unsafe.types.UTF8String.fromString(cname)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (cid, jw)
        }.sortBy { case (cid, jw) => (-jw, cid) }
      cands.headOption.filter(_._2 >= 0.9).map { case (cid, jw) =>
        val jw2 = cands.drop(1).headOption.map(_._2).getOrElse(0.0)
        val margin = BigDecimal(jw - jw2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, cid, jw, margin, margin >= 0.05)
      }
    }.toSet
    val got = graft.queries.Pipeline.erBestMatch(spark, sf)
      .select("id_a", "id_b", "jw", "margin", "confident")
      .as[(Long, Long, Double, Double, Boolean)].collect().toSet
    assert(got === expect)
    assert(got.exists(_._5) || got.nonEmpty)
  }

  // ------------------------------------------------------------ q215

  test("bpe fertility totals agree with the per-doc q205 counts") {
    val perDoc = graft.queries.LlmQueries.bpeSubwordStats(spark, sf)
      .select(col("doc_id"), col("n_subwords")).as[(Long, Long)].collect().toMap
    val langs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val expectSub = perDoc.groupBy { case (id, _) => langs(id) }
      .view.mapValues(_.values.sum).toMap
    val got = graft.queries.LlmQueries.bpeFertility(spark, sf)
      .select(col("lang"), col("n_subwords"), col("n_az_chars"), col("fertility"))
      .as[(String, Long, Long, Option[Double])].collect()
    got.foreach { case (lang, nSub, nAz, fert) =>
      assert(nSub === expectSub(lang))
      assert(nAz >= nSub || nSub == 0) // a subword has >= 1 char
      fert.foreach { f =>
        assert(f === BigDecimal(nAz.toDouble / nSub.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(got.map(_._1).toSet === langs.values.toSet)
  }
}
