package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

/** Specs for the native as-of physical operator
  * ([[graft.plans.AsOfJoinExec]]): semantic equivalence with the
  * window-based [[AsOf.join]], plan shape, and edge semantics. */
class AsOfPlanSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def clicksAndPurchases = {
    val ev = Tables.t(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    (clicks, purchases)
  }

  test("merge as-of equals the window as-of on the events fixture") {
    val (clicks, purchases) = clicksAndPurchases
    val merge = AsOf.joinMerge(clicks, purchases, key = "user_id",
        leftTs = "ts", rightKey = "p_user", rightTs = "p_ts",
        rightTieBreak = "purchase_id")
      .select("event_id", "user_id", "purchase_id", "purchase_value")
      .as[(Long, Long, Option[Long], Option[Double])].collect().sortBy(_._1)

    val ev = Tables.t(spark, sf, "events")
    val window = AsOf.join(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"), col("value").as("purchase_value")),
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightCols = Seq("purchase_id", "purchase_value"),
        rightTieBreak = "purchase_id")
      .select("event_id", "user_id", "purchase_id", "purchase_value")
      .as[(Long, Long, Option[Long], Option[Double])].collect().sortBy(_._1)

    assert(merge.length === window.length)
    assert(merge.nonEmpty)
    assert(merge.toSeq === window.toSeq)
    assert(merge.exists(_._3.isEmpty), "some clicks precede any purchase")
    assert(merge.exists(_._3.nonEmpty))
  }

  test("plan uses AsOfJoinExec with per-side cluster+sort, no union-window") {
    val (clicks, purchases) = clicksAndPurchases
    val plan = AsOf.joinMerge(clicks, purchases, "user_id", "ts",
      "p_user", "p_ts", "purchase_id").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(400))
    assert(!plan.contains("Window"), "merge form must not fall back to a window")
  }

  test("ties at equal (key, ts) pick the largest tie-break; null keys never match") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val right = Seq((10L, 100L, 7L), (10L, 100L, 9L), (10L, 60L, 5L))
      .toDF("p_user", "p_ts", "purchase_id")
      .withColumn("p_ts", timestamp_seconds(col("p_ts")))
    val got = AsOf.joinMerge(left, right, "user_id", "ts",
        "p_user", "p_ts", "purchase_id")
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(9L), "equal-ts rights resolve to the largest tie-break")
    assert(got(2L) === None, "no right at or before ts=50")
  }

  test("null right timestamps are skipped; string keys reset the match buffer") {
    val left = Seq(("a", 1L, Some(100L)), ("b", 2L, Some(100L)))
      .toDF("k", "event_id", "ts")
      .withColumn("ts", timestamp_seconds(col("ts")))
    // the null-ts right row sorts FIRST in its key group (NULLS FIRST):
    // it must be skipped, not block the scan for the whole key
    val right = Seq(("a", Some(90L), 7L), ("a", None, 8L))
      .toDF("rk", "p_ts", "view_id")
      .withColumn("p_ts", timestamp_seconds(col("p_ts")))
    val got = AsOf.joinMerge(left, right, "k", "ts", "rk", "p_ts", "view_id")
      .select("event_id", "view_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(7L), "valid right row matches despite a null-ts sibling")
    // with a reused-buffer key bug, key "b" would inherit key "a"'s match
    assert(got(2L) === None, "string key change must reset the buffered match")
  }

  test("merge as-of equals window as-of on random corpora (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rows = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
      for {
        k <- Gen.choose(1L, 5L) // few keys → many per-key collisions
        ts <- Gen.choose(0L, 50L) // small range → ties are common
        id <- Gen.choose(1L, 1000L)
      } yield (k, ts, id)))
    val prop = Prop.forAll(rows, rows) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, ts, _), i) => (k, ts, i.toLong) }
        .toDF("k", "ts", "event_id")
        .withColumn("ts", timestamp_seconds(col("ts")))
      val right = rs.map { case (k, ts, id) => (k, ts, id) }
        .toDF("rk", "p_ts", "view_id")
        .withColumn("p_ts", timestamp_seconds(col("p_ts")))
      val merge = AsOf.joinMerge(left, right, "k", "ts", "rk", "p_ts", "view_id")
        .select("event_id", "view_id")
        .as[(Long, Option[Long])].collect().toMap
      val window = AsOf.join(
          left,
          right.select(col("rk").as("k"), col("p_ts").as("ts"), col("view_id")),
          key = "k", leftTs = "ts", rightTs = "ts",
          rightCols = Seq("view_id"), rightTieBreak = "view_id")
        .select("event_id", "view_id")
        .as[(Long, Option[Long])].collect().toMap
      merge == window
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("repartitioned inputs still merge correctly (co-partitioning enforced)") {
    val (clicks, purchases) = clicksAndPurchases
    val merge = AsOf.joinMerge(clicks.repartition(7), purchases.repartition(3),
        "user_id", "ts", "p_user", "p_ts", "purchase_id")
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    val base = AsOf.joinMerge(clicks, purchases,
        "user_id", "ts", "p_user", "p_ts", "purchase_id")
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(merge === base)
  }
}
