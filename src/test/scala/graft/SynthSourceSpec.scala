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
