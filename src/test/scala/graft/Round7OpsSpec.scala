package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 additions beyond their oracle rows: PCA power iteration
  * invariants (q261) and Jensen–Shannon planted/bound checks (q262). */
class Round7OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q261: eigenvector is unit-norm in micro-units and deterministic") {
    val out = graft.queries.LlmQueries.pcaTopComponent(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.length === 64)
    val norm2 = out.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val norm = math.sqrt(norm2.toDouble) / 1e6
    assert(math.abs(norm - 1.0) < 1e-4, s"unit norm, got $norm")
    val eig = out.head._3
    assert(out.forall(_._3 === eig), "Rayleigh quotient constant across rows")
    assert(eig > 0, s"top covariance eigenvalue must be positive: $eig")
    // determinism: a second run reproduces the integer vector exactly
    val again = graft.queries.LlmQueries.pcaTopComponent(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq === out.toSeq)
  }

  test("q261: Rayleigh quotient dominates the average variance (top component)") {
    // lambda_max >= trace/d for any symmetric matrix; a power iteration
    // that converged anywhere sensible must clear it
    val cov = graft.queries.LlmQueries.embCovariance(spark, sf)
      .as[(Int, Int, Double)].collect()
    val trace = cov.filter(r => r._1 == r._2).map(_._3).sum
    val eig = graft.queries.LlmQueries.pcaTopComponent(spark, sf)
      .select("eig4").as[Double].head()
    assert(eig >= trace / 64 - 1e-3, s"eig $eig vs trace/d ${trace / 64}")
  }

  test("q262: JSD bounded by [0, ln 2] and deterministic") {
    val out = graft.queries.LlmQueries.jsDivergence(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, _, j) =>
      assert(j >= 0.0 && j <= 0.693148, s"$src: jsd $j out of [0, ln2]")
    }
  }

  test("q262 planted: a source identical to the rest has jsd 0") {
    val dir = java.nio.file.Files.createTempDirectory("jsd").toString
    Seq(
      (1L, "alpha beta gamma delta", "en", "srcA", 22L),
      (2L, "alpha beta gamma delta", "en", "srcB", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmQueries.jsDivergence(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(out.length === 2)
    out.foreach { case (src, n, j) =>
      assert(n === 4L, src)
      assert(j === 0.0, s"$src: identical distributions must have jsd 0, got $j")
    }
  }
}
