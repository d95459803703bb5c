package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 truth gate for the seven quadratic-oracle queries
  * (q32/q56/q59/q177/q178/q181/q209) — the round-9 verdict's gap: their
  * highest direct-truth tier was sf0.1 while everything else is
  * hash-verified at sf1. Full brute force at sf1 (50 k docs, 1.25 B
  * pairs) is rightly off the table; instead this uses the PLANTED-TRUTH
  * structure of the [[SfGen]] corpus itself:
  *
  * **The sf1 corpus is `mult` key-offset copies of sf0.1 with text
  * copied VERBATIM, and Jaccard is a pure function of text — so the
  * complete sf1 pair truth is an algebraic lift of the (feasible)
  * sf0.1 brute-force truth.** A pair (x, y) at sf1 with J ≥ 0.8 is
  * either two copies of the same base doc (J = 1 exactly — the planted
  * copy-family cliques, C(mult,2) pairs per shingle-eligible doc) or
  * copies of a base pair (a, b) whose J ≥ 0.8 at sf0.1 (J is
  * copy-invariant, so membership is inherited for all mult² copy
  * combinations). Nothing else can reach the threshold, so the lifted
  * set is not a sample: it is the EXACT, COMPLETE truth at sf1, and
  * every leg below is a full set-compare against it —
  *
  *  - q32: `minhashLsh` at sf1 vs the lifted pair set;
  *  - q56/q178: both connected-components implementations vs a driver
  *    union-find over the lifted pairs;
  *  - q59: the corpus-filter output vs a replay of its non-quadratic
  *    gates (lang id, quality) over the lift-derived drop set;
  *  - q177/q209: the from-scratch AND index-served incremental
  *    near-dup vs the lifted batch×base truth (copies keep their base
  *    doc's `source`, so the batch/base split lifts verbatim);
  *  - q181: embeddings are NOT copy-invariant (SfGen perturbs each copy
  *    by +copy·0.001 to break rank ties), so no lift exists — instead
  *    the within-cell pair + cluster stages are replayed INDEPENDENTLY
  *    (driver-side scalar cosine + union-find, no Spark expression
  *    shared with the operator) over four deterministic sample cells
  *    (~20 M scored pairs), given the cell assignment that q50's sf1
  *    oracle row already hash-verifies.
  *
  * Usage (after `SfGen /root/testdata/sf0.1 /tmp/sf1 10`):
  * {{{ sbt "runMain graft.TruthCheckSf1 /root/testdata/sf0.1 /tmp/sf1 10" }}}
  * Writes `TRUTHCHECK_sf1.json` (per-query counts + pass) at the repo
  * root and prints the same `TRUTH|...` lines as [[TruthCheck]].
  */
object TruthCheckSf1 {

  /** Lift the sf0.1 unordered pair truth to sf1: copy-family cliques
    * over the shingle-eligible docs plus every copy combination of
    * every base pair, canonicalized (min, max). */
  private[graft] def liftPairs(base: Set[(Long, Long)], eligible: Set[Long],
                               mult: Int, keyOff: Long): Set[(Long, Long)] = {
    val cliques = for {
      d <- eligible.iterator
      i <- 0 until mult
      j <- (i + 1) until mult
    } yield (d + i * keyOff, d + j * keyOff)
    val lifted = for {
      (a, b) <- base.iterator
      i <- 0 until mult
      j <- 0 until mult
    } yield {
      val x = a + i * keyOff
      val y = b + j * keyOff
      (math.min(x, y), math.max(x, y))
    }
    (cliques ++ lifted).toSet
  }

  /** Lift the ORDERED sf0.1 batch×base truth (q177's shape): the batch
    * membership is source-derived and sources are copied verbatim, so
    * every copy of a batch doc stays batch — no cliques (a doc's copies
    * are all on the same side of the split). */
  private[graft] def liftOrdered(base: Set[(Long, Long)], mult: Int,
                                 keyOff: Long): Set[(Long, Long)] =
    (for {
      (a, b) <- base.iterator
      i <- 0 until mult
      j <- 0 until mult
    } yield (a + i * keyOff, b + j * keyOff)).toSet

  def main(args: Array[String]): Unit = {
    val sf01 = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val sf1 = if (args.length > 1) args(1) else "/tmp/sf1"
    val mult = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val results = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long, Long)]()
    def report(q: String, truthN: Long, gotN: Long,
               missed: Long, extra: Long): Boolean = {
      val ok = missed == 0 && extra == 0
      results(q) = (truthN, gotN, missed, extra)
      println(s"TRUTH|$q|truth=$truthN|got=$gotN|missed=$missed|extra=$extra|" +
        (if (ok) "PASS" else "FAIL"))
      ok
    }

    // ---- sf0.1 brute-force truth (the feasible quadratic pass) ----
    val docs01 = Tables.t(spark, sf01, "documents")
    val sh01 = docs01.select(col("doc_id").as("id"),
        graft.llm.TextOps.wordShingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eligible = sh01.select("id").as[Long].collect().toSet
    val truth01 = sh01.select(col("id").as("doc_a"), col("s").as("sa"))
      .join(sh01.select(col("id").as("doc_b"), col("s").as("sb")),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.Hashing.jaccardSim(col("sa"), col("sb")).as("j"))
      .filter(round(col("j"), 4) >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    System.err.println(s"[truth-sf1] sf0.1 brute pairs=${truth01.size}, eligible=${eligible.size}")
    val isBatchSrc = col("source").isin("src15", "src16", "src17", "src18", "src19")
    val shSrc01 = sh01.join(docs01.select(col("doc_id").as("id"), col("source")), "id")
    val truth177_01 = shSrc01.filter(isBatchSrc)
      .select(col("id").as("batch_id"), col("s").as("sa"))
      .join(shSrc01.filter(!isBatchSrc).select(col("id").as("base_id"), col("s").as("sb")))
      .select(col("batch_id"), col("base_id"),
        graft.functions.Hashing.jaccardSim(col("sa"), col("sb")).as("j"))
      .filter(round(col("j"), 4) >= 0.8)
      .select("batch_id", "base_id").as[(Long, Long)].collect().toSet
    sh01.unpersist()
    System.err.println(s"[truth-sf1] sf0.1 batch×base brute pairs=${truth177_01.size}")

    // ---- the lift: complete, exact sf1 truth ----
    val truthPairs = liftPairs(truth01, eligible, mult, SfGen.KeyOff)
    val truth177 = liftOrdered(truth177_01, mult, SfGen.KeyOff)
    System.err.println(s"[truth-sf1] lifted: pairs=${truthPairs.size}, batch×base=${truth177.size}")

    // ---- q32: the LSH path at sf1 vs the lifted truth ----
    val docs1 = Tables.t(spark, sf1, "documents")
    require(docs1.count() == docs01.count() * mult,
      s"sf1 corpus at $sf1 is not a $mult× copy of $sf01")
    val lshDf = graft.llm.Dedup.minhashLsh(docs1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = lshDf.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // released immediately: the cluster/corpus-filter legs run the
    // collapsed registry operators, which never read this pair frame
    lshDf.unpersist()
    report("q32_dedup_minhash_lsh", truthPairs.size, lsh.size,
      (truthPairs -- lsh).size, (lsh -- truthPairs).size)

    // ---- q56/q178: both CC implementations vs union-find truth ----
    val truthComp = TruthCheck.components(truthPairs)
    def compareComp(q: String, got: Map[Long, Long]): Boolean = {
      val missed = truthComp.keySet.count(k => got.get(k) != truthComp.get(k))
      report(q, truthComp.size, got.size, missed, (got.keySet -- truthComp.keySet).size)
    }
    // the REGISTRY path (exact-copy-collapsed CC) — see TruthCheck
    compareComp("q56_dedup_clusters",
      graft.llm.Dedup.minhashClusters(docs1).as[(Long, Long)].collect().toMap)
    compareComp("q178_cc_alternating",
      graft.llm.Dedup.minhashClusters(docs1, alternating = true)
        .as[(Long, Long)].collect().toMap)

    // ---- q59: replay the non-quadratic gates over the lifted drop set ----
    val dropsTruth = truthComp.collect { case (k, r) if k != r => k }.toSeq
    val truth59 = docs1
      .join(dropsTruth.toDF("doc_id"), Seq("doc_id"), "left_anti")
      .filter(graft.llm.TextOps.langId(col("text")) === "en")
      .filter(graft.llm.TextOps.qualityScore(col("text")) >= 0.5)
      .select("doc_id").as[Long].collect().toSet
    val got59 = graft.queries.LlmQueries.corpusFilter(spark, sf1)
      .select("doc_id").as[Long].collect().toSet
    report("q59_corpus_filter", truth59.size, got59.size,
      (truth59 -- got59).size, (got59 -- truth59).size)

    // ---- q177/q209: from-scratch and index-served incremental near-dup ----
    val got177 = graft.queries.LlmQueries.incrementalNearDup(spark, sf1)
      .select("batch_id", "base_id").as[(Long, Long)].collect().toSet
    report("q177_incremental_neardup", truth177.size, got177.size,
      (truth177 -- got177).size, (got177 -- truth177).size)
    val got209 = graft.queries.LlmQueries.indexedNearDup(spark, sf1)
      .select("batch_id", "base_id").as[(Long, Long)].collect().toSet
    report("q209_indexed_neardup", truth177.size, got209.size,
      (truth177 -- got209).size, (got209 -- truth177).size)

    // ---- q181: independent sampled-cell replay (embeddings are
    // perturbed per copy, so no lift — see scaladoc) ----
    val emb = Tables.t(spark, sf1, "embeddings")
    val got181 = graft.llm.Similarity.semDedupClusters(emb, nlist = 16)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    val cents = graft.llm.Similarity.firstNCentroids(emb, 16, "vec_id", "embedding")
    val assigned = graft.llm.Similarity.assignCells(
      emb.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v")),
      cents, "v")
    // four deterministic sample cells: the smallest cell ids present
    val sampleCells = assigned.select("cell").distinct()
      .as[Long].collect().sorted.take(4)
    val sampled = assigned.filter(col("cell").isin(sampleCells: _*))
      .select("cell", "id", "v").as[(Long, Long, Seq[Double])].collect()
    System.err.println(s"[truth-sf1] q181 sample cells=${sampleCells.mkString(",")} " +
      s"vectors=${sampled.length}")
    // driver-side scalar cosine — shares no code with the Spark kernel
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val pairs181 = scala.collection.mutable.Set[(Long, Long)]()
    sampled.groupBy(_._1).foreach { case (_, cell) =>
      val vs = cell.map { case (_, id, v) => (id, v.toArray) }.sortBy(_._1)
      var i = 0
      while (i < vs.length) {
        var j = i + 1
        while (j < vs.length) {
          val s = cos(vs(i)._2, vs(j)._2)
          // replicate round(sim, 4) HALF_UP >= 0.4; the BigDecimal is
          // only needed on the knife edge
          val in = if (s >= 0.40006) true else if (s < 0.39994) false
            else BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
          if (in) pairs181 += ((vs(i)._1, vs(j)._1))
          j += 1
        }
        i += 1
      }
    }
    val comp181 = TruthCheck.components(pairs181.toSet)
    val sampleIds = sampled.map(_._2).toSet
    val truthClusters = sampleIds.iterator
      .map(id => id -> comp181.getOrElse(id, id)).toMap
    val gotSampled = sampleIds.iterator.map(id => id -> got181(id)).toMap
    val diff181 = sampleIds.count(id => truthClusters(id) != gotSampled(id))
    report("q181_semdedup", truthClusters.size, gotSampled.size, diff181, 0)

    // ---- q305 tolerant SRP: pair-set parity against the raw pipeline
    // at the REGISTRY parameters, on the full sf1 corpus. The raw
    // explicit-plane pipeline IS the truth here (q305's contract is
    // pair-set equality with it; sims may be rep-attributed, which is
    // why the DuckDB hash tier excludes it at sf1 — a single 4-dp
    // rounding-razor sim at 20k-vector scale — and this SET compare
    // replaces it). Feasible at sf1: raw candidates are bounded by the
    // 10-copy families, unlike the 100-copy sf10 corpus where raw DIED.
    val emb1 = Tables.t(spark, sf1, "embeddings")
    val planes305 = graft.llm.Similarity.firstNPlanes(emb1, 32)
    // bits = 0: the registry's round-14 auto width — the raw truth
    // side then reads the derived value back (parity is per-parameter,
    // so the comparison must run at the width the engine CHOSE)
    val tol305 = graft.llm.Similarity.srpTolerantPairs(
        emb1, planes305, bits = 0, threshold = 0.3)
      .select("id_a", "id_b")
    val bits305 = spark.conf
      .get(graft.llm.Similarity.TolerantAutoBitsConf).toInt
    println(s"[truth-sf1] q305 auto width: bits=$bits305")
    val nzEmb1 = emb1.filter(exists(
      col("embedding").cast("array<double>"), x => x =!= lit(0.0)))
    val raw305 = graft.llm.Similarity.planeSrpPairs(
        nzEmb1, planes305, bits = bits305, threshold = 0.3)
      .select("id_a", "id_b")
    val miss305 = raw305.exceptAll(tol305).count()
    val extra305 = tol305.exceptAll(raw305).count()
    val rawN305 = raw305.count()
    val tolN305 = tol305.count()
    graft.llm.Dedup.clearShingleCache()
    report("q305_srp_tolerant", rawN305, tolN305, miss305, extra305)

    // ---- q306 cross-corpus tolerant SRP: the (batch, base) pair set
    // must equal the cross-side subset of the raw union pipeline at
    // the registry split (vec_id % 5) and the auto width — the same
    // per-parameter parity contract as q305, now with the per-side
    // collapse and the never-self-join base discipline under test
    val batch306 = emb1.filter(col("vec_id") % 5 === 0)
    val base306 = emb1.filter(col("vec_id") % 5 =!= 0)
    val tol306 = graft.llm.Similarity.srpTolerantPairsAgainst(
        base306, batch306, planes305, bits = 0, threshold = 0.3)
      .select("batch_id", "base_id")
    val bits306 = spark.conf
      .get(graft.llm.Similarity.TolerantAutoBitsConf).toInt
    println(s"[truth-sf1] q306 auto width: bits=$bits306")
    val raw306 = graft.llm.Similarity.planeSrpPairs(
        nzEmb1, planes305, bits = bits306, threshold = 0.3)
      .select("id_a", "id_b")
    val rawCross306 = raw306
      .select(when(col("id_a") % 5 === 0, col("id_a")).otherwise(col("id_b"))
          .as("batch_id"),
        when(col("id_a") % 5 === 0, col("id_b")).otherwise(col("id_a"))
          .as("base_id"))
      .filter(col("batch_id") % 5 === 0 && col("base_id") % 5 =!= 0)
    val miss306 = rawCross306.exceptAll(tol306).count()
    val extra306 = tol306.exceptAll(rawCross306).count()
    val rawN306 = rawCross306.count()
    val tolN306 = tol306.count()
    graft.llm.Dedup.clearShingleCache()
    report("q306_srp_tolerant_cross", rawN306, tolN306, miss306, extra306)

    // ---- q307 indexed tolerant serve: the persisted-state path's
    // answer must equal the same cross-side subset, now at ITS
    // deployment rules — planes AND width derived from the base side
    // only (a state is built before future batches exist), the batch
    // collapsed alone at the state's width. TolerantCompactSpec pins
    // disk == in-memory, so the in-memory serve here covers the
    // persisted path's algebra at sf1 scale.
    val planes307 = graft.llm.Similarity.firstNPlanes(base306, 32)
    val st307 = graft.llm.Similarity.tolerantStateOf(base306, planes307)
    val tol307 = graft.llm.Similarity
      .srpTolerantServe(st307, batch306, planes307, threshold = 0.3)
      .select("batch_id", "base_id")
    println(s"[truth-sf1] q307 state width: bits=${st307.width}")
    val raw307 = graft.llm.Similarity.planeSrpPairs(
        nzEmb1, planes307, bits = st307.width, threshold = 0.3)
      .select("id_a", "id_b")
    val rawCross307 = raw307
      .select(when(col("id_a") % 5 === 0, col("id_a")).otherwise(col("id_b"))
          .as("batch_id"),
        when(col("id_a") % 5 === 0, col("id_b")).otherwise(col("id_a"))
          .as("base_id"))
      .filter(col("batch_id") % 5 === 0 && col("base_id") % 5 =!= 0)
    val miss307 = rawCross307.exceptAll(tol307).count()
    val extra307 = tol307.exceptAll(rawCross307).count()
    val rawN307 = rawCross307.count()
    val tolN307 = tol307.count()
    graft.llm.Dedup.clearShingleCache()
    report("q307_srp_tolerant_indexed", rawN307, tolN307, miss307, extra307)

    // ---- artifact ----
    val json = results.map { case (q, (t, g, m, e)) =>
      s"""  "$q": {"truth": $t, "got": $g, "missed": $m, "extra": $e, "pass": ${m == 0 && e == 0}}"""
    }.mkString("{\n", ",\n", "\n}\n")
    Files.writeString(Paths.get("TRUTHCHECK_sf1.json"), json)
    println(s"[truth-sf1] wrote TRUTHCHECK_sf1.json " +
      s"(${results.count { case (_, (_, _, m, e)) => m == 0 && e == 0 }}/${results.size} pass)")
    spark.stop()
  }
}
