package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted degenerate-input specs for the statistics family (the
  * discipline of CurationPlantedSpec/DedupAdversarialSpec): tiny crafted
  * tables exercising the boundaries the fixture never hits — zero
  * variance, single-row strata, ties across every rank boundary,
  * sub-k sketches — written to a temp dir and run through the SAME
  * query functions the driver runs. */
class StatPlantedSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Write a planted documents table (plus empty companions the loaders
    * need) and return the dir. */
  private def plantDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-planted").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def plantLineitem(rows: Seq[(String, String, Double, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-planted-li").toString
    rows.toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  // ------------------------------------------------------------ q217

  test("q217 drops zero-variance groups instead of dividing by zero") {
    // group A: x constant (den_x = 0) -> dropped; group B: y constant
    // (den_y = 0) -> dropped; group C: well-formed -> exact fit line
    val dir = plantLineitem(Seq(
      ("A", "F", 5.0, 100.0), ("A", "F", 5.0, 200.0),
      ("B", "F", 1.0, 100.0), ("B", "F", 2.0, 100.0),
      ("C", "F", 1.0, 10.0), ("C", "F", 2.0, 20.0), ("C", "F", 3.0, 30.0)))
    val got = graft.queries.Analytics.olsGroup(spark, dir)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet === Set("C"))
    val c = got.head
    assert(c._4 === 10.0 && c._5 === 0.0 && c._6 === 1.0,
      s"exact line y=10x must fit perfectly: $c")
  }

  // ------------------------------------------------------------ q225/q234

  test("q225/q234 survive single-doc sources and all-equal lengths") {
    val dir = plantDocs(Seq(
      (1L, "a", "en", "solo", 7L),
      (2L, "b", "en", "flat", 5L), (3L, "c", "en", "flat", 5L),
      (4L, "d", "en", "flat", 5L)))
    // all-equal source has Gini 0; the single-doc source too
    val g = graft.queries.Curation.giniBySource(spark, dir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(g("flat") === 0.0 && g("solo") === 0.0, g.toString)
    val tm = graft.queries.Curation.trimmedMean(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // n < 10 -> k = 0 -> trimmed mean equals the plain mean
    assert(tm("solo")._4 === 7.0 && tm("solo")._5 === 7.0)
    assert(tm("flat")._4 === 5.0 && tm("flat")._5 === 5.0)
  }

  // ------------------------------------------------------------ q226

  test("q226 winsorize is identity when all values tie") {
    val dir = plantDocs((1L to 12L).map(i => (i, s"d$i", "en", "s", 9L)))
    val got = graft.queries.Curation.winsorize(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length === 12 && got.forall(r => r._4 === 9L))
  }

  // ------------------------------------------------------------ q223/q224

  test("q223/q224 on an exactly-identical two-source corpus: KS 0, |z| finite") {
    // two sources with IDENTICAL length multisets -> KS distance 0
    val rows = for {
      s0 <- Seq("a", "b"); (v, i) <- Seq(3L, 5L, 5L, 9L).zipWithIndex
    } yield ((if (s0 == "a") 10 else 20) + i.toLong, "t", "en", s0, v)
    val dir = plantDocs(rows)
    val ks = graft.queries.Analytics.ksAudit(spark, dir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ks("a") === 0.0 && ks("b") === 0.0, ks.toString)
    val z = graft.queries.Analytics.mwuAudit(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    // identical distributions: U1 = n1*n2/2 exactly -> z = 0
    z.foreach(r => assert(r._4 === 0.0, r.toString))
  }

  // ------------------------------------------------------------ q221

  test("q221 chi-square is exactly 0 under perfect independence") {
    // lang split identical in every source -> O == E for every cell
    val rows = for {
      s0 <- Seq("s1", "s2", "s3"); (l, k) <- Seq("en" -> 0, "en" -> 1, "fr" -> 2)
    } yield (s0.hashCode.toLong * 10 + k, "t", l, s0, 1L)
    val dir = plantDocs(rows)
    val got = graft.queries.Analytics.chisqIndependence(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(got.length === 3)
    got.foreach(r => assert(r._3 === 0.0, r.toString))
  }

  // ------------------------------------------------------------ q232

  test("q232 sub-k source estimates exactly (the sketch IS the set)") {
    val dir = plantDocs(Seq(
      (1L, "alpha beta gamma", "en", "tiny", 10L),
      (2L, "alpha beta", "en", "tiny", 8L)))
    val got = graft.queries.Analytics.kmvDistinct(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(got._2 === 3L && got._4 === got._3.toDouble && got._5 === 0.0,
      got.toString)
  }

  // ------------------------------------------------------------ q222

  test("q222 quantile normalization is the identity on a single source") {
    // one source: within-source ranks == global ranks -> norm == own value
    val dir = plantDocs(Seq(
      (1L, "a", "en", "s", 3L), (2L, "b", "en", "s", 8L),
      (3L, "c", "en", "s", 5L), (4L, "d", "en", "s", 11L)))
    val got = graft.queries.Curation.quantileNormalize(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length === 4)
    got.foreach(r => assert(r._4 === r._3, r.toString))
  }
}
