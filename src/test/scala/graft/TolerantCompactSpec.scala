package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** The persisted tolerant-state contract ([[TolerantCompact]] +
  * [[Similarity.tolerantStateOf]]/[[Similarity.srpTolerantServe]]):
  * serve parity with the from-scratch cross operator, from-scratch
  * state equivalence after every append surgery case (new exemplar,
  * grown cell, rep relabel, re-ingestion, cell death, width growth),
  * idempotent re-runs, and the Compact crash-recovery discipline. */
class TolerantCompactSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("graft-tolstate").toString

  private def rm(dir: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(go)); f.delete(); ()
    }
    go(new java.io.File(dir))
  }

  /** A state's comparable content: groups (leader, pop, 6-dp radius,
    * sig), exemplars (id, leader, sig), members (id, rep), width. The
    * vectors are implied by the ids (every id IS a corpus id). */
  private def snapOf(st: Similarity.TolerantState)
      : (Set[(Long, Long, Double, List[Long])], Set[(Long, Long, List[Long])],
         Set[(Long, Long)], Int) = {
    val g = st.groups
      .select(col("leader"), col("pop"), round(col("radius"), 6), col("sig"))
      .as[(Long, Long, Double, Seq[Long])].collect()
      .map(r => (r._1, r._2, r._3, r._4.toList)).toSet
    val e = st.exemplars.select(col("id"), col("leader"), col("sig"))
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => (r._1, r._2, r._3.toList)).toSet
    val m = st.members.select(col("id"), col("rep"))
      .as[(Long, Long)].collect().toSet
    (g, e, m, st.width)
  }

  private def snap(state: String) = {
    val (st, _) = TolerantCompact.readState(spark, state).get
    snapOf(st)
  }

  // ---- planted corpus: the 8-dim drift shape of the cross spec ----
  private val planted8 = Array(
    Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0, 0, 0),
    Array(0.0, 0, 1, 0, 0, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0, 0, 0),
    Array(1.0, 1, 1, 1, 1, 1, 1, 1), Array(1.0, -1, 1, -1, 1, -1, 1, -1),
    Array(0.0, 0, 0, 0, 1, 1, 1, 1), Array(1.0, 0, 1, 0, 1, 0, 1, 0))
  private val famA = Seq(0.8, -0.6, 0.5, -0.3, 0.9, -0.2, 0.4, -0.7)
  private val loneB = Seq(-0.5, 0.7, -0.8, 0.2, -0.4, 0.6, -0.9, 0.1)
  private val dupC = Seq(0.3, 0.9, 0.1, 0.6, -0.2, 0.5, 0.7, -0.4)

  test("serve over a built state equals the from-scratch cross operator, tuple-exactly") {
    val emb = Tables.t(spark, sf, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val planes = Similarity.firstNPlanes(base, 32)
    val st = Similarity.tolerantStateOf(base, planes)
    val served = Similarity.srpTolerantServe(st, batch, planes, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(served.nonEmpty, "fixture must contain cross-side pairs (premise)")
    // same width, same planes -> the two pipelines are the same algebra
    // and must agree on every (pair, sim) TUPLE, not just the pair set
    val scratch = Similarity.srpTolerantPairsAgainst(base, batch, planes,
        bits = st.width, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(served === scratch)
    graft.llm.Dedup.clearShingleCache()
  }

  test("disk round-trip: build, serve from disk; missing state throws; rebuild is idempotent") {
    val emb = Tables.t(spark, sf, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val planes = Similarity.firstNPlanes(base, 32)
    val state = tmpState()
    try {
      val ex = intercept[IllegalStateException] {
        TolerantCompact.serve(spark, state, batch, 0.3)
      }
      assert(ex.getMessage.contains("no tolerant state"))
      TolerantCompact.run(spark, state, base, planes)
      val first = snap(state)
      val inMem = Similarity.tolerantStateOf(base, planes)
      assert(first === snapOf(inMem), "disk state equals the in-memory build")
      val served = TolerantCompact.serve(spark, state, batch, 0.3)
        .as[(Long, Long, Double)].collect().toSet
      val scratch = Similarity.srpTolerantPairsAgainst(base, batch, planes,
          bits = first._4, threshold = 0.3)
        .as[(Long, Long, Double)].collect().toSet
      assert(served === scratch, "disk serve equals the from-scratch cross")
      // re-running the identical batch is a no-op (upsert semantics)
      TolerantCompact.run(spark, state, base)
      assert(snap(state) === first)
      graft.llm.Dedup.clearShingleCache()
    } finally rm(state)
  }

  test("append surgery: every case lands on the from-scratch state over the accumulated corpus") {
    // batch 1 (the base): a 4-rung drift ladder (ids 100-103, each its
    // own cell, one signature class), a lone vector (200), a verbatim
    // duplicate cell (300, 301 -> rep 300)
    val b1 = Seq(
      100L -> famA, 101L -> famA.map(_ + 0.004),
      102L -> famA.map(_ + 0.008), 103L -> famA.map(_ + 0.012),
      200L -> loneB, 300L -> dupC, 301L -> dupC)
    // batch 2 exercises every surgery case at once:
    //  - 104: NEW exemplar extending the ladder's class
    //  - 310: grown cell, larger id (rep 300 keeps, only pop grows)
    //  -  50: grown cell, SMALLER id (cell 200 relabels to rep 50)
    //  - 101: RE-INGESTED onto a new vector (old cell 101 dies; the
    //         id lands in a brand-new class)
    //  - 400: a brand-new lone class
    val moved = Seq(-0.6, -0.7, 0.5, 0.4, -0.3, -0.2, 0.8, 0.9)
    val b2 = Seq(
      104L -> famA.map(_ + 0.016), 310L -> dupC, 50L -> loneB,
      101L -> moved, 400L -> moved.map(-_))
    val accumulated = (b1.filter(r => !b2.exists(_._1 == r._1)) ++ b2)
      .toDF("vec_id", "embedding")
    val state = tmpState()
    try {
      TolerantCompact.run(spark, state, b1.toDF("vec_id", "embedding"),
        planted8, maxChord = 0.15)
      TolerantCompact.run(spark, state, b2.toDF("vec_id", "embedding"))
      val got = snap(state)
      val want = snapOf(Similarity.tolerantStateOf(accumulated, planted8,
        maxChord = 0.15))
      assert(got === want)
      // the planted premises actually happened: relabel (rep 50 owns
      // 200's cell), death (no exemplar id 101 in the ladder class),
      // growth (rep 300's members include 310)
      assert(got._3.contains((200L, 50L)) && got._3.contains((50L, 50L)))
      assert(got._3.contains((310L, 300L)))
      assert(got._3.contains((101L, 101L)), "re-ingested id lives in its new cell")
      // appending batch 2 again changes nothing (idempotent upsert)
      TolerantCompact.run(spark, state, b2.toDF("vec_id", "embedding"))
      assert(snap(state) === got)
      graft.llm.Dedup.clearShingleCache()
    } finally rm(state)
  }

  test("auto width re-derives on growth (global re-sign); explicit width is pinned forever") {
    // deterministic pseudo-corpus in d=8 under 32 planes (widths 4, 8,
    // 16 available): 200 cells derive width 4; +150 more cross the
    // 2^(4+4) = 256 boundary and the rule moves to 8
    // coordinate 0 carries the index so every cell is DISTINCT (the
    // width rule counts cells; a modular pattern alone would cycle)
    def vec(i: Int): Seq[Double] =
      (i + 1).toDouble +: (1 until 8).map(j => ((i * 31 + j * 17) % 19 - 9) / 9.0)
    val planes32 = (0 until 32).map(p =>
      (0 until 8).map(j => ((p * 13 + j * 7) % 11 - 5).toDouble).toArray).toArray
    val b1 = (0 until 200).map(i => (i.toLong, vec(i)))
    val b2 = (200 until 350).map(i => (i.toLong, vec(i)))
    val all = (b1 ++ b2).toDF("vec_id", "embedding")
    assert(Similarity.autoSrpBits(200, 32) === 4 &&
      Similarity.autoSrpBits(350, 32) === 8, "boundary premise")
    val auto = tmpState()
    val pinned = tmpState()
    try {
      TolerantCompact.run(spark, auto, b1.toDF("vec_id", "embedding"), planes32)
      assert(snap(auto)._4 === 4)
      TolerantCompact.run(spark, auto, b2.toDF("vec_id", "embedding"))
      val got = snap(auto)
      assert(got._4 === 8, "auto state must re-derive the width on growth")
      assert(got === snapOf(Similarity.tolerantStateOf(all, planes32)))
      TolerantCompact.run(spark, pinned, b1.toDF("vec_id", "embedding"),
        planes32, bits = 4)
      TolerantCompact.run(spark, pinned, b2.toDF("vec_id", "embedding"))
      val gotPinned = snap(pinned)
      assert(gotPinned._4 === 4, "explicit width never moves")
      assert(gotPinned === snapOf(
        Similarity.tolerantStateOf(all, planes32, bits = 4)))
      graft.llm.Dedup.clearShingleCache()
    } finally { rm(auto); rm(pinned) }
  }

  test("interrupted swap: reads serve staging read-only; the next run rolls forward") {
    val b1 = Seq(100L -> famA, 200L -> loneB, 300L -> dupC, 301L -> dupC)
    val state = tmpState()
    try {
      TolerantCompact.run(spark, state, b1.toDF("vec_id", "embedding"),
        planted8)
      val before = snap(state)
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val live = new org.apache.hadoop.fs.Path(state, "index")
      val staging = new org.apache.hadoop.fs.Path(state, "_staging")
      assert(fs.rename(live, staging))
      assert(!fs.exists(live))
      assert(snap(state) === before, "readers serve a complete staging copy")
      assert(!fs.exists(live) && fs.exists(staging),
        "readers never repair the layout")
      TolerantCompact.run(spark, state,
        Seq(500L -> famA.map(-_)).toDF("vec_id", "embedding"))
      assert(fs.exists(live) && !fs.exists(staging),
        "the writer rolls the swap forward at entry")
      assert(snap(state)._3.contains((500L, 500L)))
      graft.llm.Dedup.clearShingleCache()
    } finally rm(state)
  }

  test("a future-format state is refused by the reader") {
    val state = tmpState()
    try {
      TolerantCompact.run(spark, state,
        Seq(100L -> famA).toDF("vec_id", "embedding"), planted8)
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(state, "index/_FORMAT")
      val out = fs.create(marker, true)
      out.write("99".getBytes("UTF-8")); out.close()
      val ex = intercept[IllegalStateException] {
        TolerantCompact.readState(spark, state)
      }
      assert(ex.getMessage.contains("v99"))
    } finally rm(state)
  }
}
