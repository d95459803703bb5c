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
