package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphArtifact

/** Build-once / serve-many graph-edge artifact (operators/GraphArtifact):
  * served edge lists must equal the inline derivation row for row, the
  * graph queries must return identical results under both paths, and the
  * served plan must read the artifact parquet instead of re-deriving
  * from lineitem/events. */
class GraphArtifactSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graph-artifact")
      .resolve("graph").toString
    GraphArtifact.build(spark, sf, d)
    d
  }

  private def served[A](body: => A): A = {
    spark.conf.set(GraphArtifact.Key, dir)
    try body finally spark.conf.unset(GraphArtifact.Key)
  }

  test("served co-purchase edges equal the inline derivation") {
    val inline = GraphArtifact.coPurchaseInline(spark, sf)
      .as[(Long, Long)].collect().toSet
    val fromArtifact = served {
      GraphArtifact.coPurchase(spark, sf).as[(Long, Long)].collect().toSet
    }
    assert(inline.nonEmpty)
    assert(fromArtifact === inline)
  }

  test("append on an order-disjoint batch equals a full rebuild") {
    import org.apache.spark.sql.functions._
    val items = GraphArtifact.itemsInline(spark, sf)
    val clicks = GraphArtifact.clickEdgesInline(spark, sf)
    // base = 80% of orders; batch = the remaining 20% (order-disjoint,
    // the daily-ingest precondition append documents)
    val base = items.filter(col("o") % 5 =!= 0)
    val batch = items.filter(col("o") % 5 === 0)
    val cBase = clicks.filter(col("u") % 5 =!= 0)
    val cBatch = clicks.filter(col("u") % 5 === 0)
    val d = java.nio.file.Files.createTempDirectory("graph-append")
      .resolve("graph").toString
    // appending into a non-existent artifact must refuse loudly
    val thrown = intercept[IllegalArgumentException] {
      GraphArtifact.append(spark, batch, cBatch, d)
    }
    assert(thrown.getMessage.contains("rebuild"))
    GraphArtifact.buildFrom(spark, base, cBase, d)
    GraphArtifact.append(spark, batch, cBatch, d)
    // appended state must equal a from-scratch build over the union
    val full = java.nio.file.Files.createTempDirectory("graph-full")
      .resolve("graph").toString
    GraphArtifact.buildFrom(spark, items, clicks, full)
    for (sub <- Seq("copurchase_support", "copurchase", "click")) {
      val a = spark.read.parquet(s"$d/$sub").collect()
        .map(_.toSeq).toSet
      val b = spark.read.parquet(s"$full/$sub").collect()
        .map(_.toSeq).toSet
      assert(a === b, sub)
      assert(a.nonEmpty, sub)
    }
    // and the appended artifact serves the graph queries unchanged
    val inlineEdges = GraphArtifact.coPurchaseInline(spark, sf)
      .as[(Long, Long)].collect().toSet
    spark.conf.set(GraphArtifact.Key, d)
    try {
      val servedEdges = GraphArtifact.coPurchase(spark, sf)
        .as[(Long, Long)].collect().toSet
      assert(servedEdges === inlineEdges)
    } finally spark.conf.unset(GraphArtifact.Key)
  }

  test("served click edges equal the inline derivation") {
    val inline = GraphArtifact.clickEdgesInline(spark, sf)
      .as[(Long, Long)].collect().toSet
    val fromArtifact = served {
      GraphArtifact.clickEdges(spark, sf).as[(Long, Long)].collect().toSet
    }
    assert(inline.nonEmpty)
    assert(fromArtifact === inline)
  }

  test("graph queries are row-equal served vs inline (q179, q116)") {
    for (name <- Seq("q179_triangle_count", "q116_pagerank")) {
      val q = SparkEntry.queries(name)
      val inline = q(spark, sf).collect().map(_.toSeq).toSeq
      val art = served { q(spark, sf).collect().map(_.toSeq).toSeq }
      assert(inline.nonEmpty, name)
      assert(art === inline, name)
    }
  }

  test("served plan scans the artifact, not the base tables") {
    served {
      val plan = GraphArtifact.coPurchase(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("copurchase"), plan.take(400))
      assert(!plan.contains("lineitem"), "served path must not re-derive")
    }
  }

  test("unset conf falls back to inline derivation (self-contained queries)") {
    val plan = GraphArtifact.coPurchase(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("lineitem"))
  }

  test("rebuild is atomic: no .staging residue, artifact replaced wholesale") {
    GraphArtifact.build(spark, sf, dir) // second build over the first
    assert(!new java.io.File(dir + ".staging").exists())
    val n = served { GraphArtifact.coPurchase(spark, sf).count() }
    assert(n === GraphArtifact.coPurchaseInline(spark, sf).count())
  }
}
