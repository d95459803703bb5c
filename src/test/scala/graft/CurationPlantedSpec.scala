package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture ground truth for the round-5 curation ops: a corpus
  * CONSTRUCTED so the expected answer is computable by independent
  * brute force in plain Scala — boilerplate segments planted across
  * documents (q172's accounting must find exactly those), and the
  * hash-Bernoulli sample membership recomputed md5-by-md5 (q175's
  * counts must agree long for long). The DuckDB oracle already pins
  * engine-vs-engine agreement; these pin engine-vs-ARITHMETIC. */
class CurationPlantedSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  import PlantedArith.{md5hex, bucket}

  // corpus with PLANTED boilerplate: segment "alpha beta" appears in
  // docs 1,2,3 of src0 (df=3 → boilerplate); "gamma delta" in docs 1,2
  // only (df=2 → kept); src1 reuses "alpha beta" in ONE doc only, so
  // per-source scoping must keep it there
  private def plantedDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-planted").toString
    Seq(
      (1L, "alpha beta gamma delta uniq1a uniq1b", "en", "src0", 36L),
      (2L, "alpha beta gamma delta uniq2a uniq2b", "en", "src0", 36L),
      (3L, "alpha beta uniq3a uniq3b uniq3c uniq3d", "en", "src0", 38L),
      (4L, "uniq4a uniq4b uniq4c uniq4d", "en", "src0", 27L),
      (5L, "alpha beta uniq5a uniq5b", "en", "src1", 24L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q172 removes exactly the planted boilerplate, scoped per source") {
    val dir = plantedDir()
    val rows = SparkEntry.queries("q172_chunk_boilerplate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 1-3 each lose exactly the one "alpha beta" segment (2 tokens);
    // "gamma delta" (df=2) and everything in src1 survives
    val expected = Array(
      (1L, 3L, 1L, 4L),  // segs: [alpha beta][gamma delta][uniq1a uniq1b]
      (2L, 3L, 1L, 4L),
      (3L, 3L, 1L, 4L),
      (4L, 2L, 0L, 4L),
      (5L, 2L, 0L, 4L))  // src1's "alpha beta" is df=1 there
    assert(rows === expected, rows.mkString(", "))
  }

  test("q173 shard manifest equals the md5 arithmetic, shard by shard") {
    val sf = TestSpark.sf
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.llm.TextOps.tokens(col("text"))).as("n_tokens"))
      .as[(Long, String, Int)].collect()
    val expected = docs.groupBy { case (id, _, _) => bucket(s"${id}shard", 16) }
      .map { case (shard, ds) =>
        (shard, ds.length.toLong, ds.map(_._3.toLong).sum,
          ds.map(_._2).distinct.length.toLong,
          ds.map(_._1).min, ds.map(_._1).max)
      }.toSet
    val got = SparkEntry.queries("q173_shard_export")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expected,
      s"got minus expected: ${got -- expected}; expected minus got: ${expected -- got}")
  }

  test("q175 sample membership equals the md5 arithmetic, doc by doc") {
    val sf = TestSpark.sf
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "source").as[(Long, String)].collect()
    val hi = Set("src0", "src1", "src2", "src3", "src4")
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val rate = if (hi(src)) 500 else 100
      (src, ds.length.toLong,
        ds.count { case (id, _) => bucket(s"${id}samp", 1000) < rate }.toLong)
    }.toSet
    val got = SparkEntry.queries("q175_hash_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected,
      s"got minus expected: ${got -- expected}; expected minus got: ${expected -- got}")
  }

  test("q180 weighted sample equals the md5 + priority-sampling arithmetic") {
    val sf = TestSpark.sf
    // independent recomputation: same md5-derived odd denominator, same
    // single exactly-rounded division 2e6·w / (2·bucket + 1), 5 largest
    // priorities per source (doc_id tie-break)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.llm.TextOps.tokens(col("text"))).as("nt"))
      .as[(Long, String, Int)].collect()
    val expected = docs.toSeq.filter(_._3 > 0).groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _, nt) =>
          val oh = bucket(s"${id}wsamp", 1000000).toDouble * 2.0 + 1.0
          (src, id, 2000000.0 * nt / oh)
        }
        .sortBy { case (_, id, k) => (-k, id) }
        .take(5)
        .map { case (s2, id, k) =>
          (s2, id, BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet
    val got = SparkEntry.queries("q180_weighted_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      s"got minus expected: ${got -- expected}; expected minus got: ${expected -- got}")
  }
}
