package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 parity with the reference's InputFormat surface:
  * split planning, per-split readers, determinism, and pruning through
  * the connector. */
class SynthSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def synth(rows: Long, parts: Int, seed: Long = 42) =
    spark.read.format("graft.sources.SynthSource")
      .option("rows", rows).option("partitions", parts).option("seed", seed)
      .load()

  test("produces exactly the requested rows across the requested splits") {
    val df = synth(10000, 8)
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.select("id").distinct().count() === 10000)
  }

  test("content is deterministic for a seed and differs across seeds") {
    val a = synth(500, 4).orderBy("id").collect()
    val b = synth(500, 4).orderBy("id").collect()
    val c = synth(500, 4, seed = 7).orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
  }

  test("split layout does not change content, only parallelism") {
    val narrow = synth(2000, 2).orderBy("id").collect()
    val wide = synth(2000, 16).orderBy("id").collect()
    assert(narrow.toSeq === wide.toSeq)
  }

  test("id-range filters eliminate splits at planning time") {
    // rows 0..9999 over 8 splits of 1250; id >= 8750 leaves one split's
    // worth of ids — the other ranges must never be planned
    val pruned = synth(10000, 8).filter(col("id") >= 8750)
    assert(pruned.rdd.getNumPartitions === 1, "out-of-range splits should not exist")
    assert(pruned.count() === 1250)
    // equality with the unpruned computation
    val viaFull = synth(10000, 8).collect().filter(_.getLong(0) >= 8750)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ===
      viaFull.map(_.getLong(0)).sorted.toSeq)
    // point lookup plans a single one-row split
    val point = synth(10000, 8).filter(col("id") === 4321)
    assert(point.rdd.getNumPartitions === 1)
    assert(point.count() === 1)
    // non-id filters stay residual and still evaluate correctly
    val mixed = synth(10000, 8).filter(col("id") < 100 && col("tag") === "even")
    assert(mixed.collect().forall(r => r.getLong(0) < 100 && r.getString(3) == "even"))
  }

  test("column pruning reaches the reader") {
    val df = synth(1000, 4).select("grp", "value")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("tag"), s"pruned column still read: $scan")
    assert(df.columns.toSeq === Seq("grp", "value"))
    assert(df.distinct().count() > 0)
    // pruned read agrees with the full read
    val full = synth(1000, 4).select("grp", "value").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(df.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq === full.toSeq)
  }

  test("standard operators compose over the custom source") {
    val agg = synth(10000, 8)
      .filter(col("tag") === "even")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("v"))
    assert(agg.count() === 10)
    // value field is uniform in [0,1): group means should hover near 0.5
    val means = agg.select("v").collect().map(_.getDouble(0))
    assert(means.forall(m => m > 0.4 && m < 0.6), means.mkString(","))
  }
}
