package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextOps
import graft.operators.Merge

/** Ground-truth specs for the pipeline utilities (Pipeline.scala):
  * upsert semantics, PII redaction, split determinism, quantization
  * error bounds, repetition flags, TF-IDF ranking, stratified-sample
  * shape. Value-level parity with DuckDB is driven by the oracle gate. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("upsert: matched keys replaced row-level, inserts appended, base preserved") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (9L, "new", 1.0)).toDF("k", "s", "v")
    val out = Merge.upsert(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0)))
  }

  test("upsert: an update's null non-key column wins (row replace, not coalesce)") {
    val base = Seq((1L, "keep"), (2L, "old")).toDF("k", "s")
    val updates = Seq((2L, null.asInstanceOf[String])).toDF("k", "s")
    val out = Merge.upsert(base, updates, Seq("k"))
      .as[(Long, Option[String])].collect().toSet
    assert(out === Set((1L, Some("keep")), (2L, None)))
  }

  test("redactPii masks emails before phone-shaped runs and counts each once") {
    val df = Seq(
      "mail bob.smith@corp.example.org or call +1-555-0100 then 8005551234",
      "no pii here at all").toDF("t")
      .select(TextOps.redactPii(col("t")).as("r"),
        TextOps.emailCount(col("t")).as("e"),
        TextOps.phoneCount(col("t")).as("p"))
    val rows = df.as[(String, Int, Int)].collect()
    assert(rows(0) === (("mail <EMAIL> or call <PHONE> then <PHONE>", 1, 2)))
    assert(rows(1) === (("no pii here at all", 0, 0)))
  }

  test("split assignment is a pure function of the key with sane proportions") {
    val once = graft.queries.Pipeline.splitAssign(spark, sf)
      .as[(Long, Int, String)].collect()
    val again = graft.queries.Pipeline.splitAssign(spark, sf)
      .as[(Long, Int, String)].collect()
    assert(once.toSeq === again.toSeq, "split must be deterministic")
    assert(once.forall { case (_, b, s) =>
      b >= 0 && b < 100 &&
        ((s == "train" && b < 80) || (s == "val" && b >= 80 && b < 90) ||
          (s == "test" && b >= 90))
    })
    val frac = once.count(_._3 == "train").toDouble / once.length
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac far from 0.8")
  }

  test("int8 quantization stays in range and reconstructs within one step") {
    val q = graft.queries.Pipeline.quantizeInt8(spark, sf)
    assert(q.filter(col("q") < -128 || col("q") > 127).count() === 0)
    // reconstruction: v ∈ [mn + step·(q+128), mn + step·(q+129)) by floor
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "v")))
      .filter(col("pos") < 4)
    val stats = e.groupBy("pos").agg(min("v").as("mn"), max("v").as("mx"))
    val bad = q.join(e, Seq("vec_id", "pos")).join(stats, "pos")
      .withColumn("step", (col("mx") - col("mn")) / 255)
      .withColumn("recon", col("mn") + (col("q") + lit(128)) * col("step"))
      .filter(abs(col("v") - col("recon")) > col("step") * 1.000001)
      .count()
    assert(bad === 0, "every value must reconstruct within one quantization step")
  }

  test("repetition quality flags a degenerate all-same-token document") {
    val docs = Seq((1L, "spam spam spam spam spam"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val base = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("n_tok"),
      size(TextOps.wordShingles(col("text"), 2)).as("d2"))
    val row = base.filter(col("doc_id") === 1).head()
    assert(row.getInt(1) === 5)
    assert(row.getInt(2) === 1, "all 2-grams identical → one distinct shingle")
    // top fraction 5/5 = 1.0 > 0.2 and dup2 = 1 - 1/4 = 0.75 > 0.5 → flagged
  }

  test("tfidf ranks a document's rare term above corpus-wide terms") {
    val top = graft.queries.Pipeline.tfidfTopTerms(spark, sf)
    // rank 1..3 per doc, no duplicate (doc, rank)
    assert(top.groupBy("doc_id").count().filter(col("count") > 3).count() === 0)
    assert(top.filter(col("rk") < 1 || col("rk") > 3).count() === 0)
    // scores within a doc are non-increasing with rank
    val viol = top.as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).values.count { rows =>
        val byRk = rows.sortBy(_._4).map(_._3)
        byRk.zip(byRk.drop(1)).exists { case (a, b) => a < b }
      }
    assert(viol === 0, "tfidf must be non-increasing in rank")
  }

  test("stratified sample takes exactly min(10, stratum size) per source") {
    val docs = Tables.t(spark, sf, "documents")
    val sizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val got = graft.queries.Pipeline.stratifiedSample(spark, sf)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(got.keySet === sizes.keySet)
    got.foreach { case (src, n) =>
      assert(n === math.min(10L, sizes(src)), s"stratum $src")
    }
  }

  test("funnel step counts are monotonically non-increasing") {
    val steps = graft.queries.Pipeline.funnelSteps(spark, sf)
      .as[(String, Long)].collect().sortBy(_._1).map(_._2)
    assert(steps.length === 3)
    assert(steps(0) >= steps(1) && steps(1) >= steps(2),
      s"each funnel step can only lose users: ${steps.mkString(",")}")
    assert(steps(0) > 0)
  }

  test("latest-per-key keeps exactly one row per (user, type) with the max ts") {
    val ev = Tables.t(spark, sf, "events")
    val out = graft.queries.Pipeline.latestPerKey(spark, sf)
    val dupes = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(dupes === 0)
    assert(out.count() ===
      ev.select("user_id", "event_type").distinct().count())
    // spot-check: the kept event_id's ts is the key's max ts
    val joined = out.join(ev.groupBy("user_id", "event_type")
      .agg(max("ts").as("mx")), Seq("user_id", "event_type"))
      .join(ev.select(col("event_id"), col("ts")), "event_id")
      .filter(col("ts") =!= col("mx")).count()
    assert(joined === 0, "kept row must carry the key's max timestamp")
  }

  test("fuzzy pairs are ordered, thresholded, and block-consistent") {
    val rows = graft.queries.Pipeline.fuzzyPairs(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, lev, sim) =>
      assert(a < b)
      assert(lev >= 0)
      assert(sim >= 0.35 && sim <= 1.0)
    }
  }

  test("fuzzy block cap: engages, reports, and stays a subset") {
    import graft.queries.Pipeline
    def run() = Pipeline.fuzzyPairs(spark, sf)
      .as[(Long, Long, Int, Double)].collect().toSet
    // conf unset = AUTO; the fixture's whole pair space fits the default
    // budget, so the default run IS the exact semantics here
    val uncapped = run()
    assert(uncapped.nonEmpty)
    // a cap of 1 drops every multi-document block: zero pairs survive
    // and the accumulator reports the engaged drops
    val dropsBefore = Pipeline.fuzzyDroppedBlocks(spark)
    spark.conf.set(Pipeline.FuzzyMaxBlockConf, "1")
    try {
      assert(run().isEmpty)
      assert(Pipeline.fuzzyDroppedBlocks(spark) > dropsBefore,
        "dropped blocks must be surfaced via the accumulator")
      // a generous cap drops nothing: exact semantics preserved
      spark.conf.set(Pipeline.FuzzyMaxBlockConf, "1000000")
      assert(run() === uncapped)
      // an intermediate cap yields a strict subset
      spark.conf.set(Pipeline.FuzzyMaxBlockConf, "3")
      val capped = run()
      assert(capped.subsetOf(uncapped))
    } finally spark.conf.unset(Pipeline.FuzzyMaxBlockConf)
  }

  test("fuzzy auto cap math: water-fill sheds only the largest size classes") {
    import graft.queries.Pipeline.autoMaxBlock
    // whole distribution fits -> exact (no cap)
    assert(autoMaxBlock(Array(5L, 5L, 5L), budget = 100) === Int.MaxValue)
    assert(autoMaxBlock(Array.empty[Long], budget = 0) === Int.MaxValue)
    assert(autoMaxBlock(Array(1L, 1L), budget = 0) === Int.MaxValue)
    // pairs: 2->1, 3->3, 10->45; budget 10 keeps {2,3} (work 4), sheds 10
    assert(autoMaxBlock(Array(10L, 2L, 3L), budget = 10) === 3)
    // equal-size classes keep or shed TOGETHER (a cap can't split them):
    // two 5-blocks are 20 pairs, budget 15 fits neither beyond the 2-block
    assert(autoMaxBlock(Array(5L, 5L, 2L), budget = 15) === 2)
    // budget under even the smallest multi-doc class -> cap 1 (no pair work)
    assert(autoMaxBlock(Array(4L, 4L), budget = 5) === 1)
  }

  test("naive fuzzy call is scale-safe BY DEFAULT: oversized blocks shed, work bounded") {
    import graft.queries.Pipeline
    // planted corpus: one pathological block (60 docs -> 1770 pairs, the
    // miniature of a 100x-grown block) plus two healthy 3-doc blocks
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy-planted").toString
    try {
      val rows =
        (0 until 60).map(i => (i.toLong, s"lorem ipsum dolor sit amet $i", "en", "big", 64L)) ++
        (100 until 103).map(i => (i.toLong, s"alpha beta gamma delta $i", "en", "s1", 64L)) ++
        (200 until 203).map(i => (i.toLong, s"epsilon zeta eta theta $i", "fr", "s2", 64L))
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      def collect() = Pipeline.fuzzyPairs(spark, dir)
        .as[(Long, Long, Int, Double)].collect().toSet
      // exact reference (explicit 0 = the oracle semantics)
      spark.conf.set(Pipeline.FuzzyMaxBlockConf, "0")
      val exact = try collect() finally spark.conf.unset(Pipeline.FuzzyMaxBlockConf)
      assert(exact.exists(p => p._1 < 60),
        "the planted big block must contribute pairs to the exact run")
      // naive run: conf UNSET, budget tightened so the big block can't fit
      val dropsBefore = Pipeline.fuzzyDroppedBlocks(spark)
      spark.conf.set(Pipeline.FuzzyPairBudgetConf, "100")
      val auto = try collect() finally spark.conf.unset(Pipeline.FuzzyPairBudgetConf)
      assert(Pipeline.fuzzyDroppedBlocks(spark) > dropsBefore,
        "the shed block must be surfaced via the accumulator")
      // bounded-work contract: exactly the oversized block's pairs are
      // shed — everything in a block at or under the derived cap survives
      assert(auto === exact.filter(p => p._1 >= 100 && p._2 >= 100))
      // the registry entry pins EXACT when the conf is unset (oracle row)
      val registry = Pipeline.fuzzyPairsExact(spark, dir)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(registry === exact,
        "q72's registry semantics must stay the exact oracle replay")
      assert(spark.conf.getOption(Pipeline.FuzzyMaxBlockConf).isEmpty,
        "the registry pin must not leak conf state")
      // ...and passes an explicit caller setting through
      spark.conf.set(Pipeline.FuzzyMaxBlockConf, "3")
      val steered = try Pipeline.fuzzyPairsExact(spark, dir)
        .as[(Long, Long, Int, Double)].collect().toSet
      finally spark.conf.unset(Pipeline.FuzzyMaxBlockConf)
      assert(steered === exact.filter(p => p._1 >= 100 && p._2 >= 100))
    } finally {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(go)); f.delete(); ()
      }
      go(new java.io.File(dir))
    }
  }
}
