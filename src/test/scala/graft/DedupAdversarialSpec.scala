package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Lsh, SetSimilarity, TextOps}

/** Adversarial-scale behavior of the dedup family: corpora with
  * DEGENERATE shingle/bucket distributions (thousands of near-identical
  * documents, or a dominant shared token core) are exactly where a
  * bucketed dedup either stays bounded or explodes O(n²). These specs
  * pin the two defense tiers:
  *  - the LSH bucket cap ([[Lsh.MaxBucketConf]]) drops degenerate
  *    buckets and surfaces the drop in the `droppedBuckets` accumulator
  *    (exact dedup is the documented escape hatch for those documents);
  *  - PPJoin's positional filter bounds the exact set-similarity join's
  *    candidate count on a corpus whose shared token core would satisfy
  *    the prefix filter pair-wise without ever reaching the Jaccard
  *    threshold.
  */
class DedupAdversarialSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 1,000 byte-identical documents (one degenerate LSH bucket per band)
  // plus a planted ordinary near-dup pair and unrelated fillers
  private def degenerateCorpus() = {
    val cloneText = "the quick brown fox jumps over the lazy dog again and " +
      "again in the same meadow every single morning before dawn breaks"
    val clones = (0L until 1000L).map(i => (i, cloneText))
    val planted = Seq(
      (2000L, "completely different subject matter about distributed query " +
        "engines shuffling partitioned columnar data across executor fleets"),
      (2001L, "completely different subject matter about distributed query " +
        "engines shuffling partitioned columnar data across executor racks"))
    val fillers = (3000L until 3020L).map(i =>
      (i, s"unique filler document number $i with its own vocabulary " +
        s"token${i}a token${i}b token${i}c token${i}d token${i}e token${i}f " +
        s"token${i}g token${i}h token${i}i token${i}j token${i}k token${i}l"))
    (clones ++ planted ++ fillers).toDF("doc_id", "text")
  }

  test("round-5 dedup reports stay exact on the 1000-clone degenerate corpus") {
    // the same degenerate corpus, through the REGISTRY paths that
    // aggregate rather than pair — these must stay exact (no caps
    // needed: their state is per-key counts, never candidate pairs)
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    degenerateCorpus()
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cloneToks = "the quick brown fox jumps over the lazy dog again and " +
      "again in the same meadow every single morning before dawn breaks"
    val t = cloneToks.split("\\s+").length.toLong

    // q199: one group of 1000 clones -> 999 removable docs, 999*t tokens
    val hist = SparkEntry.queries("q199_dup_histogram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(hist === Array((1L, 22L, 22L, 0L, 0L),
      (1000L, 1L, 1000L, 999L, 999L * t)), hist.mkString(", "))

    // q187: exactly ONE clone keeps its paragraph; 999 reassemble empty
    val pars = SparkEntry.queries("q187_paragraph_dedup")(spark, dir)
      .filter(col("doc_id") < 1000).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    assert(pars.filter(_._2 > 0).map(_._1).toSeq === Seq(0L),
      "keep-first must survive exactly once across 1000 clones, on doc 0")

    // q190: clones are all-dup (novelty 0, flagged); fillers with
    // enough tokens are fully novel
    val novRows = SparkEntry.queries("q190_ngram_novelty")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
    assert(novRows.filter(_._1 < 1000).forall(r => r._2 == 0.0 && r._3),
      "clones must score zero novelty and flag")
    assert(novRows.filter(r => r._1 >= 3000 && r._1 < 3020).forall(_._2 == 1.0),
      "unique fillers must be fully novel")
  }

  test("LSH bucket cap bounds a degenerate corpus and surfaces the drops") {
    val docs = degenerateCorpus()
    val dropsBefore = Lsh.droppedBuckets(spark)

    // capped run: the 1000-clone bucket (one per band) is dropped, the
    // planted ordinary pair still comes through its small buckets
    val capped = Dedup.minhashLsh(docs, threshold = 0.8)
    // no cap by default — set the session conf the way a pipeline would
    spark.conf.set(Lsh.MaxBucketConf, "100")
    val pairs =
      try Dedup.minhashLsh(docs, threshold = 0.8).collect()
      finally spark.conf.unset(Lsh.MaxBucketConf)

    val dropped = Lsh.droppedBuckets(spark) - dropsBefore
    assert(dropped >= 1, "degenerate buckets must be counted, not silent")
    // without the cap the clone cluster alone would emit 1000*999/2 =
    // 499,500 pairs; capped output stays at the planted pair
    assert(pairs.length === 1, pairs.take(5).mkString(","))
    assert(pairs.head.getLong(0) === 2000L && pairs.head.getLong(1) === 2001L)

    // the documented escape hatch: exact dedup collapses the clones the
    // cap dropped — nothing is lost end to end
    val exact = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .filter(col("n") > 1).collect()
    assert(exact.length === 1 && exact.head.getAs[Long]("n") === 1000L)

    // and the uncapped default on the same session was exact (finds the
    // planted pair plus the full clone expansion) — cap is opt-in
    assert(capped.filter(col("doc_a") === 2000L).count() === 1L)
    Dedup.clearShingleCache()
  }

  test("positional filter bounds setsim candidates on a correlated corpus") {
    // The adversarial shape for the PREFIX tier is a shared token that
    // is rare enough to land INSIDE every prefix: 120 docs of 20 tokens
    // each — 3 unique (df=1, prefix slots 1-3), 1 per-group tag shared
    // by 10 docs (df=10, slot 4), and a 16-token core shared by all
    // (df=120, slots 5-20 — whose FIRST token still lands at prefix
    // slot 5, because plen = 20 − ⌈0.8·20⌉ + 1 = 5). Every one of the
    // 120·119/2 = 7,140 pairs therefore shares a prefix token, yet the
    // best pairwise Jaccard is 17/23 ≈ 0.74 < 0.8. The positional tier
    // sees every such match at slots ≥ 4 — overlap bound 21−max(p) ≤ 17
    // < α = ⌈(4/9)·40⌉ = 18 — and prunes ALL of them.
    val core = (0 until 16).map(i => s"core$i")
    val sets = (0L until 120L).map { d =>
      (d, (0 until 3).map(i => s"u${d}x$i") ++ Seq(s"grp${d / 10}") ++ core)
    }.toDF("id", "toks")

    val ranked = SetSimilarity.rankedSets(sets, 4, 5).cache()
    val prefixOnly = SetSimilarity.candidatePairs(ranked, 4, 5,
      positional = false).count()
    val positional = SetSimilarity.candidatePairs(ranked, 4, 5).count()
    assert(prefixOnly === 7140L,
      "the correlated corpus must defeat the prefix filter alone (the premise)")
    assert(positional === 0L,
      s"positional tier must prune sub-threshold correlated pairs, got $positional")
    // end-to-end: no false positives survive, and nothing qualifies
    assert(SetSimilarity.selfJoinPairs(sets, 4, 5).count() === 0L)
    ranked.unpersist()
  }

  test("positional filter is lossless: qualifying pairs always survive") {
    // same shared core, but two docs are genuine near-dups (19 of 20
    // tokens shared → Jaccard 19/21 > 4/5)
    val core = (0 until 12).map(i => s"core$i")
    val near = (900L, core ++ (0 until 8).map(i => s"sharedpriv$i"))
    val near2 = (901L, core ++ (0 until 7).map(i => s"sharedpriv$i") :+ "oddone")
    val rest = (0L until 60L).map { d =>
      (d, core ++ (0 until 8).map(i => s"doc${d}priv$i"))
    }
    val sets = (rest :+ near :+ near2).toDF("id", "toks")
    val out = SetSimilarity.selfJoinPairs(sets, 4, 5).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 900L && out.head.getLong(1) === 901L)
    assert(out.head.getAs[Int]("inter") === 19 && out.head.getAs[Int]("uni") === 21)
  }

  test("telephone chain end-to-end: only the alternating CC clusters it") {
    // 30 sliding-window docs over one token stream: doc i shares 16 of
    // its 18 shingles with doc i+1 (Jaccard exactly 16/20 = 0.8) but
    // only ~0.64 with doc i+2 — the real LSH operator therefore finds
    // EXACTLY the 29 consecutive pairs, a chain of diameter 29. That
    // exceeds label propagation's default 20-round budget; the
    // large-star/small-star alternation collapses it regardless.
    val toks = (0 until 78).map(i => s"tok$i")
    val docs = (0L until 30L).map { i =>
      (i, toks.slice(2 * i.toInt, 2 * i.toInt + 20).mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === (0L until 29L).map(i => (i, i + 1)).toSet,
      "LSH should find exactly the consecutive near-dup pairs")
    val alt = Dedup.connectedComponentsAlternating(pairs)
      .as[(Long, Long)].collect()
    assert(alt.length === 30 && alt.forall(_._2 === 0L),
      "alternating CC must collapse the whole chain to doc 0")
    val lp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(lp.exists(_._2 !== 0L),
      "default label-prop budget should NOT finish diameter 29 — if it " +
        "does, update the Scaladoc guidance and this guard")
    pairs.unpersist()
  }

  test("cross-corpus LSH honors the bucket cap and never self-joins the base") {
    // base: the degenerate corpus (1000 clones + planted pair + fillers);
    // batch: one more clone plus a near-copy of a planted base doc
    val base = degenerateCorpus()
    val cloneText = base.filter(col("doc_id") === 0L)
      .select("text").collect().head.getString(0)
    val plantedNear = "completely different subject matter about distributed query " +
      "engines shuffling partitioned columnar data across executor pools"
    val batch = Seq((9000L, cloneText), (9001L, plantedNear))
      .toDF("doc_id", "text")

    val dropsBefore = Lsh.droppedBuckets(spark)
    spark.conf.set(Lsh.MaxBucketConf, "100")
    val pairs =
      try Dedup.minhashLshAgainst(base, batch, threshold = 0.8)
        .collect()
      finally spark.conf.unset(Lsh.MaxBucketConf)
    val dropped = Lsh.droppedBuckets(spark) - dropsBefore

    // the clone bucket (1000 base + 1 batch members) is dropped and
    // counted; the planted near-copy still pairs with both base
    // planted docs through its ordinary-sized buckets — and base-base
    // pairs (e.g. 2000-2001) never appear by construction
    assert(dropped >= 1, "degenerate cross buckets must be counted")
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((9001L, 2000L), (9001L, 2001L)), got.toString)
  }

  test("index-served cross path honors the bucket cap on RAW population") {
    // same shape as the from-scratch cap test, but the base side comes
    // from the CLASS-LEVEL index: the 1000-clone base family is ONE
    // stored class whose grp_n weights every bucket it occupies, so the
    // weighted cap must drop those buckets (raw population 1001 > 100)
    // while the ordinary-sized planted buckets still pair
    val base = degenerateCorpus()
    val cloneText = base.filter(col("doc_id") === 0L)
      .select("text").collect().head.getString(0)
    val plantedNear = "completely different subject matter about distributed query " +
      "engines shuffling partitioned columnar data across executor pools"
    val batch = Seq((9000L, cloneText), (9001L, plantedNear))
      .toDF("doc_id", "text")

    val (classes, members) = graft.Compact.classIndexOf(base)
    val dropsBefore = Lsh.droppedBuckets(spark)
    spark.conf.set(Lsh.MaxBucketConf, "100")
    val pairs =
      try Dedup.minhashLshAgainstIndex(classes, members, batch).collect()
      finally spark.conf.unset(Lsh.MaxBucketConf)
    assert(Lsh.droppedBuckets(spark) - dropsBefore >= 1,
      "weighted class buckets must be counted when dropped")
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((9001L, 2000L), (9001L, 2001L)), got.toString)

    // and uncapped on the same index, the clone family expands fully:
    // batch clone 9000 pairs with every one of the 1000 base members
    val full = Dedup.minhashLshAgainstIndex(classes, members, batch)
      .filter(col("batch_id") === 9000L).count()
    assert(full === 1000L, s"expected the full 1000-member expansion, got $full")
    Dedup.clearShingleCache()
  }

  // ------------------------------------------------ exact-copy collapse

  /** A copy-heavy corpus with known structure: a sliding-window chain of
    * 12 near-dup docs (consecutive Jaccard exactly 16/20 = 0.8), copy
    * families grafted onto chain docs 3 and 7, and one ISOLATED 3-copy
    * family whose representative has no near-dup partner. */
  private def copyHeavyCorpus() = {
    val toks = (0 until 50).map(i => s"w$i")
    val chain = (0L until 12L).map(i =>
      (i, toks.slice(2 * i.toInt, 2 * i.toInt + 20).mkString(" ")))
    val copies =
      (100L to 103L).map(id => (id, chain(3)._2)) ++
      (200L to 202L).map(id => (id, chain(7)._2)) ++
      (300L to 302L).map(id =>
        (id, "isolated family text completely unlike anything else present"))
    (chain ++ copies).toDF("doc_id", "text")
  }

  test("exact-copy collapse is bit-exact: pairs, values, clusters equal brute force") {
    val docs = copyHeavyCorpus()

    // brute-force truth WITH values, via the same kernels
    val sh = docs.select(col("doc_id"),
        TextOps.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val truth = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 4).as("j"))
      .filter(col("j") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet

    val pairs = Dedup.minhashLsh(docs).as[(Long, Long, Double)].collect()
    assert(pairs.length === pairs.toSet.size, "no duplicate pair rows")
    assert(pairs.toSet === truth,
      "collapsed pair output must equal brute force, values included")

    // the collapse demonstrably FIRED: three multi-member families
    val c = Dedup.minhashCollapse(docs, "text", "doc_id", 3, 32, 4, 0.8)
    assert(c.members.select("rep").distinct().count() === 13L,
      "12 chain classes + the isolated family; grafted copies join classes 3 and 7")
    assert(c.multiReps.count() === 3L)
    assert(c.repPairs.filter(col("doc_a") >= 100L).count() === 0L,
      "rep pairs live entirely in representative (min-id) space")

    // clusters: both CC algorithms equal union-find truth over the
    // brute-force pair graph — including the isolated copy family,
    // whose representative has no rep-level pair at all
    val comp = TruthCheck.components(truth.map(t => (t._1, t._2)))
    assert(comp.keySet.contains(302L), "isolated copies must cluster (premise)")
    val lp = Dedup.minhashClusters(docs).as[(Long, Long)].collect().toMap
    assert(lp === comp)
    val alt = Dedup.minhashClusters(docs, alternating = true)
      .as[(Long, Long)].collect().toMap
    assert(alt === comp)

    // simhash: same collapse, same bit-exactness (output is a pure
    // function of the 64-bit fingerprint the collapse keys on)
    val fps = docs.select(col("doc_id"), Dedup.simhashBlocks(col("text")).as("bl"))
    val ham = (1 to 4).map(i => bit_count(
      element_at(col("bl_a"), i).bitwiseXOR(element_at(col("bl_b"), i))))
      .reduce(_ + _)
    val simTruth = fps.select(col("doc_id").as("doc_a"), col("bl").as("bl_a"))
      .crossJoin(fps.select(col("doc_id").as("doc_b"), col("bl").as("bl_b")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), ham.cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val simGot = Dedup.simhashPairs(docs).as[(Long, Long, Int)].collect()
    assert(simGot.length === simGot.toSet.size)
    assert(simGot.toSet === simTruth)
    Dedup.clearShingleCache()
  }

  test("collapse key is injective: a U+0001 inside a token cannot alias distinct classes") {
    // Normalization strips only WHITESPACE, so a raw U+0001 survives
    // inside a token. The bare U+0001-joined class encoding this
    // round replaced aliased the disjoint shingle sets {"x<U+0001>y",
    // "z"} and {"x", "y<U+0001>z"} — identical joined string, hence
    // identical md5 AND xxhash64 — wrongly merging two unrelated
    // documents into one content class (reported as a jaccard-1.0
    // pair). The length-prefixed encoding + structural array hash
    // must keep them apart.
    val docs = Seq((1L, "x\u0001y z"), (2L, "x y\u0001z")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, shingleK = 1).collect()
    assert(pairs.isEmpty,
      s"disjoint shingle sets must not merge: ${pairs.mkString(",")}")

    // same adversarial shape through the set-similarity path, where
    // toks are CALLER-supplied (no normalization at all)
    val sets = Seq((1L, Seq("x\u0001y", "z")), (2L, Seq("x", "y\u0001z")))
      .toDF("id", "toks")
    assert(SetSimilarity.selfJoinPairs(sets, 4, 5).collect().isEmpty)

    // positive control: genuinely equal token SETS (order differs,
    // U+0001 present) still land in one class and pair at 1.0
    val same = Seq((10L, "x\u0001y z"), (11L, "z x\u0001y")).toDF("doc_id", "text")
    val got = Dedup.minhashLsh(same, shingleK = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 11L, 1.0)), got.toString)
    Dedup.clearShingleCache()
  }

  test("setsim collapse is exact: pairs and counts equal brute force on the copy-heavy corpus") {
    // same corpus, same shingle space as q136; the collapse changes the
    // global df basis (classes, not docs) — output must not move
    val docs = copyHeavyCorpus()
    val sh = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(col("text"), 3).as("toks"))
    val got = SetSimilarity.selfJoinPairs(sh, 4, 5)
      .as[(Long, Long, Int, Int)].collect()
    assert(got.length === got.toSet.size, "no duplicate pair rows")

    val nz = sh.filter(size(col("toks")) > 0)
    val truth = nz.select(col("id").as("doc_a"), col("toks").as("ta"))
      .crossJoin(nz.select(col("id").as("doc_b"), col("toks").as("tb")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).as("inter"),
        (size(col("ta")) + size(col("tb")) -
          size(array_intersect(col("ta"), col("tb")))).as("uni"))
      .filter(col("inter") * 5 >= col("uni") * 4)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(truth.exists(t => t._1 < 100 && t._2 >= 100),
      "copies must participate in qualifying pairs (premise)")
    assert(got.toSet === truth)
  }

  test("cross-corpus collapse is bit-exact: from-scratch and index-served equal brute force") {
    // the copy-heavy corpus split across the base/batch boundary so
    // copy families straddle it: the batch carries verbatim copies of
    // a base chain doc (cross-side same-class pairs must verify at
    // 1.0 through the ordinary bucket join — reps share all buckets)
    // and one member of the isolated family whose other two copies
    // stay in the base
    val docs = copyHeavyCorpus()
    val isBatch = col("doc_id").isin(200L, 201L, 202L, 300L)
    val base = docs.filter(!isBatch)
    val batch = docs.filter(isBatch)

    val sh = docs.select(col("doc_id"),
        TextOps.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val truth = sh.filter(isBatch)
      .select(col("doc_id").as("batch_id"), col("sh").as("sh_a"))
      .crossJoin(sh.filter(!isBatch)
        .select(col("doc_id").as("base_id"), col("sh").as("sh_b")))
      .select(col("batch_id"), col("base_id"),
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 4).as("j"))
      .filter(col("j") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(truth.exists(t => t._1 == 300L && t._3 == 1.0),
      "cross-side same-class pairs must exist (premise)")
    assert(truth.exists(t => t._1 >= 200L && t._1 <= 202L && t._2 == 7L),
      "batch copies must pair with their base original (premise)")

    val fromScratch = Dedup.minhashLshAgainst(base, batch)
      .as[(Long, Long, Double)].collect()
    assert(fromScratch.length === fromScratch.toSet.size, "no duplicate rows")
    assert(fromScratch.toSet === truth,
      "collapsed cross-corpus output must equal brute force, values included")

    val (classes, members) = graft.Compact.classIndexOf(base)
    val fromIndex = Dedup.minhashLshAgainstIndex(classes, members, batch)
      .as[(Long, Long, Double)].collect()
    assert(fromIndex.toSet === truth, "index-served path must agree")
    Dedup.clearShingleCache()
  }

  test("capped collapse: oversized copy groups drop from pair expansion, clusters stay exact") {
    // 40 verbatim copies plus one DISTINCT near-dup partner of the copy
    // text (22 tokens; the single changed trailing token flips exactly
    // one of 20 shingles → Jaccard 19/21 ≈ 0.9048 ≥ 0.8)
    val cloneText = "the quick brown fox jumps over the lazy dog again and " +
      "again in the same meadow every single morning before dawn breaks"
    val partner = cloneText.replace("breaks", "arrives")
    val docs = ((0L until 40L).map(i => (i, cloneText)) :+ (100L, partner))
      .toDF("doc_id", "text")

    val before = Lsh.droppedBuckets(spark)
    spark.conf.set(Lsh.MaxBucketConf, "10")
    try {
      // pair expansion honors the cap on RAW population: band rows
      // carry the class size as a weight, so every bucket containing
      // the clone representative weighs ≥ 41 > 10 and is dropped — the
      // identical drop decision the uncollapsed pipeline made — and the
      // 40-copy group's within-clique (780 pairs) is dropped by the
      // group cap with the same accounting. Capped output: empty.
      val pairs = Dedup.minhashLsh(docs).as[(Long, Long, Double)].collect()
      assert(pairs.isEmpty, pairs.take(5).mkString(","))
      assert(Lsh.droppedBuckets(spark) - before >= 1,
        "dropped buckets/groups must be counted, not silent")

      // cluster path: membership is linear, so NO group cap applies —
      // the 40-copy family still clusters exactly (the old bucket-cap
      // path returned nothing here); the partner needs a rep-level
      // edge, which the capped buckets dropped, so it stays out
      val cl = Dedup.minhashClusters(docs).as[(Long, Long)].collect()
      assert(cl.length === 40 && cl.forall(_._2 === 0L), cl.take(5).mkString(","))

      // a cap the raw population fits under keeps EVERYTHING: full
      // clone clique + the cross pairs to the partner
      spark.conf.set(Lsh.MaxBucketConf, "100")
      val loose = Dedup.minhashLsh(docs).as[(Long, Long, Double)].collect()
      assert(loose.length === 40 * 39 / 2 + 40, loose.length.toString)
    } finally spark.conf.unset(Lsh.MaxBucketConf)
    Dedup.clearShingleCache()
  }
}
