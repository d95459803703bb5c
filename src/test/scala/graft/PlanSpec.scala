package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality assertions: the optimizations SURVEY.md §4 claims are
  * "free from Catalyst" must actually appear in the physical plans —
  * pushdown, pruning, broadcast, top-k. These are the properties that
  * decide whether the plan survives a 100× scale-up. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02 pushes the row filter into the parquet scan") {
    val p = plan("q02_filter_predicate")
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"),
      "shipdate predicate should reach the scan")
  }

  test("q01 prunes columns to the 3-column projection") {
    val p = plan("q01_scan_projection")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"),
      p.split("ReadSchema").last.take(200))
  }

  test("q03 plans ORDER BY + LIMIT as TakeOrderedAndProject (no global sort)") {
    val p = plan("q03_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q11 broadcasts the dimension tables") {
    val p = plan("q11_join_inner_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("q05 aggregates with a partial (map-side) phase") {
    val p = plan("q05_agg_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(600))
  }

  test("Engine partition filter prunes partitions at plan time") {
    import spark.implicits._
    val e = new graft.api.Engine(spark,
      java.nio.file.Files.createTempDirectory("graft-wh-plan").toString)
    val spec = graft.api.TableSpec("tpart")
    e.write(spec, Seq((1, 1.1)).toDF("i1", "d1"), graft.api.WriteSpec(Map("ds" -> "a")))
    e.write(spec, Seq((2, 2.2)).toDF("i1", "d1"), graft.api.WriteSpec(Map("ds" -> "b")))
    val pruned = e.read(spec.copy(partitionFilter = Some(col("ds") === "b")))
    // the partition predicate must land in PartitionFilters (directory
    // pruning), not DataFilters (row filtering after a full scan)
    val p = pruned.queryExecution.executedPlan.toString
    val partFilters = p.split("PartitionFilters: ").last.split("]").head
    assert(partFilters.contains("ds"), p.take(600))
    assert(pruned.count() === 1)
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    import org.apache.spark.sql.functions.sum
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val agg = Tables.t(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    // tiny shuffle at sf0.001: AQE should fuse the configured partitions
    // down to far fewer than spark.sql.shuffle.partitions
    val partitionsAfter = agg.rdd.getNumPartitions
    val configured = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(partitionsAfter < configured || configured == 1,
      s"AQE left $partitionsAfter partitions (configured $configured)")
  }

  test("IVF cell assignment is map-side: no Exchange above the corpus scan") {
    val emb = Tables.t(spark, sf, "embeddings")
    val cents = graft.llm.Similarity.firstNCentroids(emb, 8)
    val v = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val assigned = graft.llm.Similarity.assignCells(v, cents, "v")
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"cell assignment must not shuffle the corpus: ${p.take(600)}")
  }

  test("numSplits read is split arithmetic, not a shuffle") {
    import spark.implicits._
    val e = new graft.api.Engine(spark,
      java.nio.file.Files.createTempDirectory("graft-wh-splits").toString)
    val spec = graft.api.TableSpec("tsplit")
    e.write(spec, spark.range(200000).select(col("id"),
      rand(7).as("x"), concat(lit("row-"), col("id")).as("s")))
    val hinted = e.read(spec.copy(numSplits = Some(3)))
    val p = hinted.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"numSplits must not introduce an exchange: ${p.take(600)}")
    val parts = hinted.rdd.getNumPartitions
    assert(parts >= 2 && parts <= 6, s"expected ≈3 scan partitions, got $parts")
    assert(hinted.count() === 200000)
  }

  test("range join plans as a binned equi-join, not a nested-loop product") {
    val p = plan("q63_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pure range predicate must not fall back to a product join: ${p.take(800)}")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(800))
  }

  test("RangeJoinRewrite rule converts a pure range theta-join into a binned equi-join") {
    import spark.implicits._
    val points = (0L until 2000L).map(i => (i, i * 13 % 10000)).toDF("pid", "pt")
    val intervals = (0L until 50L).map(i => (i, i * 200, i * 200 + 399)).toDF("iid", "lo", "hi")
    def joined = points.join(intervals,
      points("pt") >= intervals("lo") && points("pt") <= intervals("hi"))

    // without the rule: nested-loop product
    val before = joined.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"))
    val expected = joined.orderBy("pid", "iid").collect().toSeq

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.binWidth", "400")
    try {
      val after = joined.queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") && !after.contains("CartesianProduct"),
        s"rule should remove the product join: ${after.take(800)}")
      // same rows, same schema — the rewrite is semantics-preserving
      assert(joined.orderBy("pid", "iid").collect().toSeq === expected)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq graft.plans.RangeJoinRewrite)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // fresh session: thresholds lowered so fixture-scale skew triggers
    // the same OptimizeSkewedJoin path that saves a 100 TB shuffle
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    // left: one hot key carrying ~95% of rows, with an incompressible
    // payload so the hot shuffle partition is genuinely large
    val left = s2.range(0, 200000)
      .select(when(col("id") % 20 === 0, col("id") % 100).otherwise(0L).as("k"),
        md5(concat(lit("payload-"), col("id"))).as("v"))
    val right = s2.range(0, 100).select(col("id").as("k"), col("id").as("attr"))
    // global agg over v (keeps the payload through the shuffle; a groupBy
    // on the join key would pin the partitioning and veto the skew split)
    val joined = left.join(right, "k").agg(sum(length(col("v"))).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"expected AQE to mark the skewed SMJ partition: ${p.take(900)}")
  }

  test("custom hash kernels run inside whole-stage codegen") {
    val df = Tables.t(spark, sf, "documents")
      .select(graft.functions.Hashing.minhashSignature(
        graft.llm.TextOps.wordShingles(col("text"), 3), 16).as("sig"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in plan strings
    assert(p.contains("*(1) Project [minhash_signature"), p.take(400))
  }

  test("presentationSort=false elides the final range exchange on the row-level family") {
    val family: Seq[graft.Q] = Seq(
      graft.queries.Relational.scalarDate,
      graft.queries.Relational.scalarString,
      graft.queries.Relational.scalarCaseCast,
      graft.queries.Pipeline.piiRedact,
      graft.queries.Pipeline.splitAssign,
      graft.queries.Pipeline.mergeUpsert,
      graft.queries.Pipeline.quantizeInt8,
      graft.queries.Extended.jsonExtract,
      graft.queries.Extended.predicates,
      graft.queries.Extended.arrayFuncs,
      graft.queries.Curation.zscoreNorm,
      graft.queries.Analytics.datetimeBattery,
      graft.queries.Analytics.regexBattery,
      graft.queries.Analytics.nullBattery,
      graft.queries.Analytics.higherOrder,
      graft.queries.Advanced.windowAnomaly,
      graft.queries.Advanced.valueWindows)
    def rangeExchanges(q: graft.Q): Int = {
      val p = q(spark, sf).queryExecution.executedPlan.toString
      "rangepartitioning".r.findAllIn(p).length
    }
    // oracle mode (default): every query carries exactly its
    // deterministic presentation sort
    family.foreach(q => assert(rangeExchanges(q) >= 1))
    spark.conf.set(graft.Presentation.Key, "false")
    try family.foreach(q => assert(rangeExchanges(q) === 0,
      "library mode must not pay a global sort for presentation"))
    finally spark.conf.unset(graft.Presentation.Key)
  }

  test("BPE subword kernel runs inside whole-stage codegen") {
    val df = Tables.t(spark, sf, "documents")
      .select(graft.llm.TextOps.bpeSubwords(col("text")).as("sub"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [bpe_tokens"), p.take(400))
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the AQE runtime-filter rewrite: a selective predicate on the small
    // side injects bloom_filter_might_contain onto the fact scan, so fact
    // rows failing the filter die before the shuffle — at 100 TB this is
    // the difference between shuffling the whole fact table and shuffling
    // the ~matching fraction. Thresholds lowered so fixture-sized tables
    // qualify; production defaults trigger on real sizes.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val part = Tables.t(spark, sf, "part").filter(col("p_size") === 1)
      val p = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_size").count()
        .queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
        "selective dim filter should inject a runtime bloom filter: " + p.take(800))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q79 IVF+PQ index build is one map-side projection over the corpus scan") {
    val p = plan("q79_ann_ivfpq")
    // cell assignment + code encoding fuse into a single Project directly
    // above the corpus FileScan — no Exchange in the index-build path
    val idx = p.indexOf("pq_encode")
    assert(idx >= 0, "corpus must be PQ-encoded in the plan")
    val encodeLine = p.split("\n").find(_.contains("pq_encode")).get
    assert(encodeLine.contains("nearest_cell"),
      "cell assignment and encoding should share one Project: " + encodeLine)
    val belowEncode = p.substring(idx)
    val scanAt = belowEncode.indexOf("FileScan parquet")
    assert(scanAt >= 0)
    assert(!belowEncode.substring(0, scanAt).contains("Exchange"),
      "no Exchange between the corpus scan and the index-build projection")
  }

  test("q73 top-3 terms use WindowGroupLimit (rank pushed below the window)") {
    val p = plan("q73_tfidf_topterms")
    assert(p.contains("WindowGroupLimit"),
      "row_number <= k should prune per-group rows before the full window: " + p.take(600))
  }

  test("q75 upsert is one full-outer join on the key, no extra exchanges") {
    val p = plan("q75_merge_upsert")
    assert(p.contains("FullOuter"), p.take(600))
    // one exchange per join side + the final presentation range sort
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"upsert should not add exchanges beyond the keyed join: $exchanges\n${p.take(900)}")
  }

  test("q77 quantization broadcasts the per-dim stats (no corpus-side shuffle join)") {
    val p = plan("q77_quantize_int8")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q159 keyset pagination pushes the cursor predicate and plans no offset") {
    val p = plan("q159_keyset_pagination")
    // the cursor disjunction reaches the parquet scan as a pushed filter …
    assert(p.contains("PushedFilters: [Or(LessThan(c_acctbal"),
      p.split("PushedFilters").last.take(300))
    // … and the page is a plain top-k: no offset anywhere in the plan
    // (q153's LIMIT/OFFSET form materializes offset+n rows instead)
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.toLowerCase.contains("offset"), p.take(600))
  }

  test("q172 boilerplate mark-up join broadcasts the df>=3 dictionary") {
    // the corpus-side chunk stream must NOT reshuffle to meet the
    // boilerplate dictionary: the dictionary is vocabulary-bounded, so
    // the left join rides a broadcast while the only chunk exchanges
    // are the DF count and the per-doc report
    val p = plan("q172_chunk_boilerplate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q175 hash sampling is map-side: one exchange for the report only") {
    val p = plan("q175_hash_sample")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected report group-by exchanges only, got $exchanges:\n${p.take(800)}")
    assert(!p.contains("Window"), "rate sampling must not plan a window")
  }

  test("q176 attribution plans one keyed window, no self-join") {
    val p = plan("q176_attribution")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("Join"), "single-table window form must not join")
  }

  test("q177 incremental near-dup plans no products and no base self-join") {
    // candidates come from the grouped cross-bucket expansion: the only
    // joins in the plan are the candidate→shingle verify joins, never a
    // cartesian of corpus sides. Round 11: the verify join AGAINST the
    // pair table must be a SHUFFLE join — the pair frame's static size
    // estimate is garbage-small and the un-hinted plan broadcast 25 M
    // pairs at sf10 into a driver maxResultSize crash (Lsh.pinShuffleJoin)
    val p = plan("q177_incremental_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(p.contains("SortMergeJoin"),
      "the pair-side verify join must plan as a shuffle join:\n" + p.take(800))
    assert(p.contains("collect_set"), "grouped bucket expansion expected")
  }

  test("q181 semdedup pair stage joins only on the cell, assignment map-side") {
    // the full query's executed plan is truncated by the CC stage's
    // eager checkpoints, so pin the pair STAGE directly: the corpus
    // never cross-joins itself (the pair join is keyed on the centroid
    // cell), and cell assignment is the broadcast-literal nearest_cell
    // kernel — no join against a centroid table
    val emb = Tables.t(spark, sf, "embeddings")
    val cents = graft.llm.Similarity.firstNCentroids(emb, 16)
    val v = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val assigned = graft.llm.Similarity.assignCells(v, cents, "v")
    val pairs = assigned
      .select(col("cell"), col("id").as("doc_a"), col("v").as("va"))
      .join(assigned.select(col("cell"), col("id").as("doc_b"), col("v").as("vb")),
        Seq("cell"))
      .where(col("doc_a") < col("doc_b"))
      .filter(round(graft.llm.Similarity.cosine(col("va"), col("vb")), 4) >= 0.4)
      .select("doc_a", "doc_b")
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(p.contains("nearest_cell"),
      "map-side centroid assignment expected:\n" + p.take(800))
    // every non-broadcast exchange in the stage is keyed on the cell
    val hashEx = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(hashEx.subsetOf(Set("cell")),
      s"pair stage must shuffle on cell only, got $hashEx")
  }

  test("q182 dup spans: keyed joins only, partial agg on the shingle count") {
    val p = plan("q182_dup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "positions must rejoin duplicated hashes by key:\n" + p.take(800))
    assert(p.contains("partial_count") || p.contains("partial"),
      "shingle occurrence count should map-side combine:\n" + p.take(800))
  }

  test("q183 semantic decontam: corpus assignment map-side, probes broadcast") {
    val p = plan("q183_semantic_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "probe join must broadcast the eval-set probes:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no corpus×eval product — the scoring join is cell-keyed:\n" + p.take(800))
    assert(p.contains("nearest_cell") || p.contains("NearestCell"),
      "map-side centroid assignment expected:\n" + p.take(800))
  }

  test("q185 trunc rerank: both stage cuts use WindowGroupLimit") {
    val p = plan("q185_trunc_rerank")
    assert("WindowGroupLimit".r.findAllMatchIn(p).size >= 2,
      "prefix cut AND rerank cut should both pre-prune map-side:\n" + p.take(800))
  }

  test("q186 collocations: offset explode joins by equi key, no range self-join") {
    val p = plan("q186_collocations")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the position self-join must be hash-keyed on (doc_id, p) — an
    // inequality-window formulation would surface as a nested-loop join
    // with a range condition instead
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[doc_id#\\d+L?, p#\\d+".r
      .findFirstIn(p).isDefined,
      "pair generation must be the offset-explode equi-join on (doc_id, p):\n" + p.take(1200))
    // the only nested-loop joins are the single-row totals broadcasts
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 2, p.take(800))
  }

  test("q187 paragraph dedup: no joins at all — two keyed exchanges (fp window, doc rollup)") {
    val p = plan("q187_paragraph_dedup")
    assert(!p.contains("Join"),
      "cross-document dedup must be the fp-keyed window, never a join:\n" + p.take(800))
    assert(p.contains("Window"), p.take(800))
  }

  test("q188 ccnet buckets: keyed joins only, tercile window on lang") {
    val p = plan("q188_ccnet_buckets")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "term-count join must be hash-keyed:\n" + p.take(800))
    assert(p.contains("Window"), p.take(800))
  }

  test("q189 bloom gate: the bounded bit set joins as a broadcast probe") {
    val p = plan("q189_bloom_gate")
    assert(p.contains("BroadcastHashJoin"),
      "the <=65536-row bit set must broadcast to the probe side:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the single-row n_set_bits scalar is the only nested-loop build
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
  }

  test("q191 bm25: df broadcasts, stats are the only nested-loop, top-20 is TakeOrdered") {
    val p = plan("q191_bm25_topk")
    assert(p.contains("BroadcastHashJoin"),
      "the <=|query| df rows must broadcast:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      "the top-20 cut must not globally sort:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1,
      "only the single-row corpus stats may nested-loop:\n" + p.take(800))
  }

  test("q192 temperature mix: one keyed agg, single-row total broadcast") {
    val p = plan("q192_temperature_mix")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
    assert(p.contains("partial"), "source agg should map-side combine:\n" + p.take(800))
  }

  test("q193 kn continuation: counts partial-agg, top-20 is TakeOrdered") {
    val p = plan("q193_kn_continuation")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
  }

  test("q194 ann recall: the broadcast-query truth leg is the only nested loop") {
    val p = plan("q194_ann_recall")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the brute-force ground-truth leg broadcasts the EVAL-SAMPLE
    // queries over the corpus scan — the harness's documented cost;
    // everything else (ivf probes, hit counting) joins by key
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
    assert(p.contains("WindowGroupLimit"),
      "both top-5 cuts should prune map-side:\n" + p.take(800))
  }

  test("q195 weighted median: windows keyed on the flag, no join anywhere") {
    val p = plan("q195_weighted_median")
    assert(!p.contains("Join"), "cum/total are same-keyed windows:\n" + p.take(800))
    assert(p.contains("Window"), p.take(800))
  }

  test("q196 containment: shingle-keyed joins only, no all-pairs stage") {
    val p = plan("q196_containment_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pairs must materialize only through the shingle-hash join:\n" + p.take(800))
    assert(p.contains("partial_count"),
      "pair counts should map-side combine:\n" + p.take(800))
  }

  test("q197 covariance: pair products explode map-side, no dimension self-join") {
    val p = plan("q197_emb_covariance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the (vec,dim) self-join formulation is banned — pairs come from the " +
        "nested-transform explode; means join by broadcast:\n" + p.take(800))
    assert(p.contains("partial_avg"), p.take(800))
  }

  test("q198 domain shift: term-keyed scoring join, totals broadcast") {
    val p = plan("q198_domain_shift")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1,
      "only the single-row corpus total may nested-loop:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "per-source totals must broadcast back:\n" + p.take(800))
    assert(p.contains("partial_count") || p.contains("partial"),
      "(source, term) counts should map-side combine:\n" + p.take(800))
  }

  test("q199 dup histogram: two keyed aggs, no join anywhere") {
    val p = plan("q199_dup_histogram")
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("partial"), "fingerprint counts should map-side combine:\n" + p.take(800))
  }

  test("q200 corpus report: one corpus pass, no joins, no windows") {
    val p = plan("q200_corpus_report")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q201 calibration: signatures map-side, pair stage is the bounded broadcast probe") {
    val p = plan("q201_minhash_calibration")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // signature computation must not shuffle — the only join is the
    // broadcast of the <20-doc probe set (the q53 eval-harness shape)
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(800))
  }

  test("q202 halflife via spark.sql: single-row max broadcast, keyed agg, TakeOrdered") {
    val p = plan("q202_halflife_decay")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
  }

  test("q203 prefix top terms: rank pushed below the window as WindowGroupLimit") {
    val p = plan("q203_prefix_topterms")
    assert(p.contains("WindowGroupLimit"),
      "each task must pre-prune to its local top-3:\n" + p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("q204 benford: literal expectation broadcasts, single-row total is the only BNLJ") {
    val p = plan("q204_benford_audit")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p.take(800))
  }

  test("q190 ngram novelty: positions collapse map-side before any shuffle") {
    val p = plan("q190_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "shingle totals must rejoin by hash key:\n" + p.take(800))
    assert(p.contains("partial_count") || p.contains("partial"),
      "per-(doc, shingle) counts should map-side combine:\n" + p.take(800))
  }

  test("q216 ER: JW scores per distinct name pair, records resolve by broadcast") {
    val p = plan("q216_er_best_match")
    assert(p.contains("BroadcastHashJoin"),
      "the name-pair score table must broadcast back onto records:\n" + p.take(800))
    assert(p.contains("WindowGroupLimit"),
      "the rk=1 argmax must pre-prune per id:\n" + p.take(800))
  }

  test("q228 RFM: the per-user table is checkpointed — no repeated events scans") {
    val p = plan("q228_rfm_segments")
    assert(!p.contains("Scan parquet"),
      "every branch must read the checkpointed users table, not re-scan events:\n" +
        p.take(800))
  }

  test("q232 KMV: the rank<=k cut compiles to WindowGroupLimit") {
    val p = plan("q232_kmv_distinct")
    assert(p.contains("WindowGroupLimit"),
      "the k-smallest cut must pre-prune per source:\n" + p.take(800))
  }

  test("q227 Spearman: no data-scale window, moments ride the count cube") {
    val p = plan("q227_spearman")
    // after the cube checkpoint the plan must hold no parquet scan and
    // only cube-sized windows (the 3-partition rank window variant
    // serialized the corpus onto 3 tasks)
    assert(!p.contains("Scan parquet"), p.take(800))
  }

  test("q240 silhouette: centroid sums broadcast, distance terms map-side") {
    val p = plan("q240_silhouette")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the 640-row centroid table must broadcast:\n" + p.take(800))
  }

  test("explicit repartition survives localCheckpoint; a bare one AQE-coalesces to 1 (IterProbe discipline)") {
    // The round-10 iterative-family finding, pinned at its ROOT: a
    // checkpointed shuffle output gets AQE-coalesced — for the graph
    // family's fixture-scale edge frame, all the way down to ONE
    // partition — so every iteration of a loop joining that fixed frame
    // scanned and re-exchanged its biggest input single-threaded. An
    // explicit user repartition(N, key) is a width AQE must not
    // coalesce, and localCheckpoint materializes exactly that width for
    // every iteration to reuse (q116/q242/hyperBall/CC all measured ~2×
    // on the 100× corpus from this alone; graft.IterProbe dissects it).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val base = s2.range(0, 10000)
      .select(col("id").as("u"), (col("id") % 97).as("payload"))
    val other = s2.range(0, 10000).select(col("id").as("u"), lit(1L).as("one"))
    // a small shuffle output checkpointed bare: AQE's coalesce collapses
    // the loop input's width (the degeneracy the graph family hit)
    val bare = base.join(other, "u").localCheckpoint(true)
    assert(bare.rdd.getNumPartitions < 8,
      "expected AQE to coalesce the tiny shuffle output (the hazard this pins)")
    // the fix: an explicit width the optimizer must respect
    val pinned = base.join(other, "u")
      .repartition(8, col("u")).localCheckpoint(true)
    assert(pinned.rdd.getNumPartitions === 8,
      "a user repartition's width must survive localCheckpoint for the loop to reuse")
  }

  test("bucketedServe: the per-iteration join consumes the bucketed scan with no edge-side exchange") {
    // Round-11 deployment of the IterProbe variant-D finding: under
    // spark.graft.graph.bucketedServe the iteration frame is a bucketed
    // CATALOG table whose scan exposes HashPartitioning(u, n), so one
    // PageRank iteration needs strictly fewer hash exchanges than the
    // default checkpointed frame (whose edge side re-exchanges every
    // iteration — localCheckpoint under AQE does not republish a
    // partitioning the join can consume). Broadcast disabled so the
    // join shape is deterministic SMJ at fixture scale.
    val art = java.nio.file.Files
      .createTempDirectory("plan-bktserve").resolve("graph").toString
    graft.operators.GraphArtifact.build(spark, sf, art)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def iteration(): String = {
      val e = graft.operators.GraphArtifact.clickIterEdges(s2, sf)
      val ranks = e.select(col("u").as("id")).distinct()
        .select(col("id"), lit(1000000L).as("r"))
      val next = e.join(ranks, col("u") === col("id"))
        .groupBy(col("v")).agg(sum(expr("(r * 85) div (100 * deg)")).as("contrib"))
      next.collect()
      next.queryExecution.executedPlan.toString // post-execution: AQE final
    }
    val defPlan = iteration()
    s2.conf.set(graft.operators.GraphArtifact.Key, art)
    s2.conf.set(graft.operators.GraphArtifact.BucketedServeKey, "true")
    val bktPlan = try iteration() finally {
      s2.conf.unset(graft.operators.GraphArtifact.BucketedServeKey)
      s2.conf.unset(graft.operators.GraphArtifact.Key)
    }
    def exchanges(p: String) = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(bktPlan.contains("SelectedBucketsCount"),
      "the served frame must scan as a BUCKETED table:\n" + bktPlan.take(900))
    assert(!defPlan.contains("SelectedBucketsCount"))
    assert(exchanges(bktPlan) < exchanges(defPlan),
      s"bucketed iteration should need fewer hash exchanges " +
        s"(${exchanges(bktPlan)} vs ${exchanges(defPlan)}):\n" + bktPlan.take(900))
  }

  test("bucketedServe=auto flips on the broadcast threshold (the measured deployment rule, encoded)") {
    // IterProbe cluster (SCALE.md round-12) measured both halves:
    // bucketed wins above the broadcast threshold (~2x steady-state
    // iteration, 6 -> 4 shuffles), loses below it (both legs broadcast
    // and the n-task floor only costs). `auto` consults the stored
    // sub's bytes against spark.sql.autoBroadcastJoinThreshold.
    val art = java.nio.file.Files
      .createTempDirectory("plan-bktauto").resolve("graph").toString
    graft.operators.GraphArtifact.build(spark, sf, art)
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.GraphArtifact.Key, art)
    s2.conf.set(graft.operators.GraphArtifact.BucketedServeKey, "auto")
    try {
      // sf10-shaped stats stand-in: a threshold BELOW the stored sub's
      // bytes means the edge side cannot broadcast -> bucketed scan
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val above = graft.operators.GraphArtifact.clickIterServed(s2)
      assert(above.isDefined, "auto must serve bucketed above the threshold")
      assert(above.get.queryExecution.analyzed.toString
        .contains("graft_click_iter"),
        "the served frame must come from the bucketed catalog table")
      // broadcast disabled entirely: the edge side can never broadcast
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(graft.operators.GraphArtifact.clickIterServed(s2).isDefined)
      // fixture-shaped stats: sub bytes far below the threshold -> the
      // inline checkpointed frame (the measured single-node winner)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "1GB")
      assert(graft.operators.GraphArtifact.clickIterServed(s2).isEmpty,
        "auto must decline below the threshold")
      // the existing explicit modes are unchanged by auto's existence
      s2.conf.set(graft.operators.GraphArtifact.BucketedServeKey, "true")
      assert(graft.operators.GraphArtifact.clickIterServed(s2).isDefined)
      s2.conf.set(graft.operators.GraphArtifact.BucketedServeKey, "false")
      assert(graft.operators.GraphArtifact.clickIterServed(s2).isEmpty)
    } finally {
      s2.conf.unset(graft.operators.GraphArtifact.BucketedServeKey)
      s2.conf.unset(graft.operators.GraphArtifact.Key)
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("no CartesianProduct node anywhere in the full query registry") {
    // every cross join in the registry pairs a data-scale side with a
    // bounded/single-row side wrapped in broadcast(...) — a Cartesian
    // product surviving to the physical plan means a scalar lost its
    // broadcast hint and would shuffle-pair at corpus scale
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct planned in: ${offenders.mkString(", ")}")
  }
}
