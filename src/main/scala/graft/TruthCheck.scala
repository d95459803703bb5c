package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-facing truth gate for the queries whose DuckDB oracle is
  * all-pairs-quadratic and therefore impractical past sf0.01 (q32
  * MinHash-LSH pairs, q56/q178 dup clusters, q59's capstone, q177's
  * batch×base incremental form): recompute the ground truth
  * with Spark itself — brute-force Jaccard over every doc pair via the
  * codegen'd [[graft.functions.Hashing.jaccardSim]] kernel — and
  * compare the LSH path's answer set against it exactly. This is the
  * reproducible form of the sf0.1 re-verification (round 3 did it
  * ad-hoc); run with `sbt "runMain graft.TruthCheck /root/testdata/sf0.1"`.
  *
  * The brute force is O(n²/2) Jaccard evaluations and exists ONLY here,
  * as the verifier; the shipped operators never do this.
  */
object TruthCheck {

  /** Connected components of a pair set as (member -> min id of its
    * component) — the driver-side union-find both truth gates
    * canonicalize cluster answers with (here and [[TruthCheckSf1]]). */
  private[graft] def components(pairs: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.t(spark, sfDir, "documents")
    val sh = docs.select(col("doc_id").as("id"),
        graft.llm.TextOps.wordShingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // brute-force truth: every (a < b) pair, exact Jaccard >= 0.8
    val a = sh.select(col("id").as("doc_a"), col("s").as("sa"))
    val b = sh.select(col("id").as("doc_b"), col("s").as("sb"))
    // same predicate as the operator (Dedup.scala filters on
    // round(j, 4) >= threshold) — an unrounded >= here would misreport
    // boundary pairs like j = 0.79999 as `extra`
    val truthPairs = a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.Hashing.jaccardSim(col("sa"), col("sb")).as("j"))
      .filter(round(col("j"), 4) >= 0.8)
      .select("doc_a", "doc_b")
    val truth = truthPairs.as[(Long, Long)].collect().toSet

    val lshDf = graft.llm.Dedup.minhashLsh(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = lshDf.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // nothing downstream reads the pair frame anymore (the cluster and
    // corpus-filter legs run the collapsed REGISTRY operators, which
    // build their own state) — release it before those sections
    lshDf.unpersist()
    val missed = truth -- lsh
    val extra = lsh -- truth
    println(s"TRUTH|q32|truth=${truth.size}|lsh=${lsh.size}|missed=${missed.size}|extra=${extra.size}|" +
      (if (missed.isEmpty && extra.isEmpty) "PASS" else s"FAIL missed=$missed extra=$extra"))

    // cluster truth: connected components of the brute-force pair graph,
    // canonicalized as (member -> min id of its component)
    val truthComp = components(truth)
    // the REGISTRY path (exact-copy-collapsed CC, Dedup.minhashClusters),
    // not CC over the expanded pair frame — the truth tier gates what
    // q56/q178 actually serve
    val got = graft.llm.Dedup.minhashClusters(docs)
      .as[(Long, Long)].collect().toMap
    // compare only docs that appear in some pair (singletons are trivial)
    val diff = truthComp.keySet.filter(k => got.get(k) != truthComp.get(k))
    println(s"TRUTH|q56|members=${truthComp.size}|clusters=${truthComp.values.toSet.size}|" +
      (if (diff.isEmpty && got.keySet == truthComp.keySet) "PASS"
       else s"FAIL diff=${diff.take(5)} extraMembers=${(got.keySet -- truthComp.keySet).take(5)}"))

    // q178: the alternating large-star/small-star CC must land on the
    // same truth clusters, through the same collapsed registry path
    val gotAlt = graft.llm.Dedup.minhashClusters(docs, alternating = true)
      .as[(Long, Long)].collect().toMap
    val diffAlt = truthComp.keySet.filter(k => gotAlt.get(k) != truthComp.get(k))
    println(s"TRUTH|q178|members=${truthComp.size}|rounds=${graft.llm.Dedup.lastAlternatingRounds}|" +
      (if (diffAlt.isEmpty && gotAlt.keySet == truthComp.keySet) "PASS"
       else s"FAIL diff=${diffAlt.take(5)} extraMembers=${(gotAlt.keySet -- truthComp.keySet).take(5)}"))

    // q59 corpus filter: its oracle embeds the same quadratic pair graph,
    // so at sf0.1 replay the non-quadratic gates (lang id, quality) over
    // the brute-force-derived drop set and compare final output sets
    val dropsTruth = truthComp.collect { case (k, r) if k != r => k }.toSet
    val truth59 = docs
      .filter(!col("doc_id").isin(dropsTruth.toSeq: _*))
      .filter(graft.llm.TextOps.langId(col("text")) === "en")
      .filter(graft.llm.TextOps.qualityScore(col("text")) >= 0.5)
      .select("doc_id").as[Long].collect().toSet
    val got59 = graft.queries.LlmQueries.corpusFilter(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    println(s"TRUTH|q59|truth=${truth59.size}|got=${got59.size}|" +
      (if (got59 == truth59) "PASS"
       else s"FAIL missing=${(truth59 -- got59).take(5)} extra=${(got59 -- truth59).take(5)}"))

    // q177 incremental near-dup: truth is the brute-force batch×base
    // cross product (quadratic ACROSS the split only) with the same
    // rounded-Jaccard predicate; the LSH path must match it exactly
    val isBatch177 = col("source")
      .isin("src15", "src16", "src17", "src18", "src19")
    // serve both cross-join legs from the ALREADY-persisted shingle
    // table instead of re-scanning + re-shingling the corpus
    val shSrc = sh.join(
      docs.select(col("doc_id").as("id"), col("source")), "id")
    val truth177 = shSrc.filter(isBatch177)
      .select(col("id").as("batch_id"), col("s").as("sa"))
      .join(shSrc.filter(!isBatch177)
        .select(col("id").as("base_id"), col("s").as("sb")))
      .select(col("batch_id"), col("base_id"),
        graft.functions.Hashing.jaccardSim(col("sa"), col("sb")).as("j"))
      .filter(round(col("j"), 4) >= 0.8)
      .select("batch_id", "base_id").as[(Long, Long)].collect().toSet
    val got177 = graft.queries.LlmQueries.incrementalNearDup(spark, sfDir)
      .select("batch_id", "base_id").as[(Long, Long)].collect().toSet
    println(s"TRUTH|q177|truth=${truth177.size}|got=${got177.size}|" +
      (if (got177 == truth177) "PASS"
       else s"FAIL missed=${(truth177 -- got177).take(5)} extra=${(got177 -- truth177).take(5)}"))

    sh.unpersist()
    spark.stop()
  }
}
