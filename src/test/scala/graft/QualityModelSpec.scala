package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QualityModel
import graft.llm.TextOps

/** Learned quality-classifier inference (TextOps.linearQualityScore +
  * functions/QualityModel): hand-computed planted-corpus scores, the
  * fixture/table round trip, and the q259 gate-swap contract. */
class QualityModelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Independent reimplementation of the scorer for ground truth:
    * md5 via MessageDigest, same bucket + fixture-weight arithmetic. */
  private def expected(text: String, w: Array[Int]): (Long, Int) = {
    val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
    val uni = toks.distinct.filter(_.nonEmpty)
    val bi = toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      .toArray.distinct
    val feats = uni ++ (if (toks.length >= 2) bi else Array.empty[String])
    def bucket(f: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % w.length).toInt
    }
    (feats.map(f => w(bucket(f)).toLong).sum, feats.length)
  }

  test("planted corpus: scorer equals hand-computed md5-bucket weight sums") {
    val w = QualityModel.fixture()
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "alpha beta alpha gamma",
      "single",
      "Mixed CASE   spacing\ttest")
    val got = docs.toDF("text")
      .select(TextOps.linearQualityScore(col("text"), w).as("lq"))
      .select(col("lq.w_sum"), col("lq.n_feats"))
      .as[(Long, Int)].collect()
    docs.zip(got).foreach { case (text, (wsum, nf)) =>
      val (ew, en) = expected(text, w)
      assert(nf === en, s"n_feats for '$text'")
      assert(wsum === ew, s"w_sum for '$text'")
    }
  }

  test("fixture weights are integer milli-units in [-1000, 1000]") {
    val w = QualityModel.fixture()
    assert(w.length === QualityModel.Buckets)
    assert(w.forall(x => x >= -1000 && x <= 1000))
    // deterministic: same formula, same values
    assert(QualityModel.fixture().toSeq === w.toSeq)
  }

  test("load round-trips a weight table (model-as-data)") {
    val w = QualityModel.fixture()
    val table = w.zipWithIndex.map { case (x, b) => (b, x) }
      .toSeq.toDF("bucket", "w_milli")
    assert(QualityModel.load(table).toSeq === w.toSeq)
    // sparse table: missing buckets weigh 0
    val sparse = QualityModel.load(Seq((3, 42)).toDF("bucket", "w_milli"))
    assert(sparse(3) === 42 && sparse(0) === 0)
  }

  test("q259 is q100 with only the gate swapped: same schema, plausible drift") {
    val a = graft.queries.Curation.pipelineCapstone(spark, sf)
    val b = graft.queries.Curation.capstoneLearnedGate(spark, sf)
    assert(a.schema === b.schema)
    // both gates keep a nonempty, different-but-overlapping corpus
    assert(a.count() > 0 && b.count() > 0)
  }

  test("q303 trained weights beat the fixture on held-out rule labels") {
    val wdf = graft.queries.Curation.trainedQuality(spark, sf)
    val trained = QualityModel.load(wdf)
    val fixture = QualityModel.fixture()
    assert(trained.exists(_ != 0), "training must produce non-zero weights")
    // held-out docs (bucket >= 80 — never seen by the trainer), labeled
    // by the same rule gate the trainer distilled
    val held = Tables.t(spark, sf, "documents")
      .filter(graft.queries.Fragments.splitBucket(col("doc_id")) >= 80)
      .select(col("text"),
        (TextOps.qualityScore(col("text")) >= 0.3).as("label"))
    assert(held.count() > 50)
    def acc(w: Array[Int]): Double = held
      .select(avg(when((TextOps.linearQualityScore(col("text"), w)
        .getField("w_sum") > 0) === col("label"), 1.0).otherwise(0.0)).as("a"))
      .collect()(0).getDouble(0)
    val at = acc(trained)
    val af = acc(fixture)
    assert(at > af, s"trained ($at) must beat the fixture ($af) held-out")
    assert(at >= 0.7, s"trained held-out accuracy implausibly low: $at")
  }

  test("scorer plan is one codegen'd projection — no joins, no extra shuffles") {
    val w = QualityModel.fixture()
    val plan = Tables.t(spark, sf, "documents")
      .select(TextOps.linearQualityScore(col("text"), w).as("lq"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "model must ride as a literal, not a join")
    assert(!plan.contains("Exchange"), "inference must be map-side only")
  }
}
