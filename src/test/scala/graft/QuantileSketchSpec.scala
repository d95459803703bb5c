package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HV, QuantileSketchAgg, QsBuf}

/** Mergeable quantile sketch (functions/QuantileSketch): merge law,
  * order independence, rank-error envelope, and streaming-shaped
  * incremental folds — the KMV discipline applied to order
  * statistics. */
class QuantileSketchSpec extends AnyFunSuite {
  import TestSpark._

  private val k = 64

  private def mix(x: Long): Long = {
    // splitmix-style scramble for deterministic pseudo-uniform hashes
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  private def sketchOf(agg: QuantileSketchAgg, rows: Seq[HV]): QsBuf =
    rows.foldLeft(agg.zero)(agg.reduce)

  test("merge law: bottom-k(A ∪ B) == merge(bottom-k(A), bottom-k(B))") {
    val agg = new QuantileSketchAgg(k)
    val rows = (1L to 5000L).map(i => HV(mix(i), i))
    val (a, b) = rows.splitAt(2200)
    val whole = agg.finish(sketchOf(agg, rows))
    val merged = agg.finish(agg.merge(sketchOf(agg, a), sketchOf(agg, b)))
    assert(whole.n === 5000L && merged.n === 5000L)
    assert(merged.sample.toSeq === whole.sample.toSeq)
  }

  test("selection is a pure function of the data, not encounter order") {
    val agg = new QuantileSketchAgg(k)
    val rows = (1L to 3000L).map(i => HV(mix(i), i))
    val fwd = agg.finish(sketchOf(agg, rows)).sample.toSeq
    val rev = agg.finish(sketchOf(agg, rows.reverse)).sample.toSeq
    val shuf = agg.finish(sketchOf(agg, rows.sortBy(r => mix(r.v + 77)))).sample.toSeq
    assert(fwd === rev)
    assert(fwd === shuf)
    assert(fwd.length === k)
  }

  test("rank-error envelope: |rank/n - p| within 4 sigma at k=64") {
    val agg = new QuantileSketchAgg(k)
    val n = 20000L
    val rows = (1L to n).map(i => HV(mix(i), i)) // values ARE ranks
    val sample = agg.finish(sketchOf(agg, rows)).sample
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = sample(math.ceil(p * k).toInt - 1)
      val err = math.abs(est.toDouble / n - p)
      val bound = 4 * math.sqrt(p * (1 - p) / k)
      assert(err <= bound, s"p=$p: rank err $err > 4 sigma $bound")
    }
  }

  test("incremental fold (streaming shape): prefix sketches converge to batch") {
    val agg = new QuantileSketchAgg(k)
    val rows = (1L to 4000L).map(i => HV(mix(i), i))
    // fold in 7 uneven micro-batches, merging each into running state —
    // the state an update-mode monitor would keep per key
    val batches = rows.grouped(613).toSeq
    val folded = batches.foldLeft(agg.zero) { (st, b) =>
      agg.merge(st, sketchOf(agg, b))
    }
    assert(agg.finish(folded).sample.toSeq ===
      agg.finish(sketchOf(agg, rows)).sample.toSeq)
    assert(agg.finish(folded).n === 4000L)
  }

  test("q257 plan: sketch is partial-aggregated, estimate side broadcast") {
    val df = graft.queries.Analytics.quantileSketch(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      "5-row estimate table must broadcast")
    assert(df.count() === 5)
  }
}
