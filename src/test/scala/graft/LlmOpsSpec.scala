package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, Similarity, TextOps}

/** Ground-truth specs for the hash-dependent LLM-pipeline operators that
  * the DuckDB oracle can't express (MinHash banding, SimHash, SRP-LSH). */
class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = Tables.t(spark, sf, "documents").cache()

  test("minhash-LSH equals brute-force jaccard truth at threshold 0.8") {
    val lsh = Dedup.minhashLsh(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    val sh = docs.select(col("doc_id"),
        TextOps.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(round(TextOps.jaccard(col("sh_a"), col("sh_b")), 4) >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh === truth)
  }

  test("duplicated spans: merge, within-doc repeats, short docs, clean docs") {
    // w1..w20 are unique filler; "a b c d e f g" is a 7-token run shared
    // between docs 1 and 2 → its three 5-gram start positions merge into
    // ONE span of 7 tokens. Doc 3 repeats its own 5-gram ("r s t u v" at
    // positions 1 and 6 of an 11-token doc) → within-doc duplication
    // flags both occurrences (they touch: 1..5 and 6..10 merge into one
    // 10-token span). Doc 4 is clean; doc 5 is shorter than the shingle.
    val df = Seq(
      (1L, "a b c d e f g w1 w2 w3 w4 w5"),
      (2L, "w6 w7 w8 a b c d e f g w9"),
      (3L, "r s t u v r s t u v w10"),
      (4L, "w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"),
      (5L, "x y z")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df)
      .select("doc_id", "n_spans", "dup_tokens", "max_span", "dup_frac")
      .as[(Long, Int, Long, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((1L, 1, 7L, 7, 0.5833))) // 7 of 12 tokens
    assert(got(2L) === ((2L, 1, 7L, 7, 0.6364))) // 7 of 11 tokens
    assert(got(3L) === ((3L, 1, 10L, 10, 0.9091))) // self-repeat, merged
  }

  test("duplicated spans: non-adjacent spans stay separate islands") {
    // the shared 5-grams sit at positions 1 and 9 of doc 1 (gap of 3
    // clean tokens between covered ranges 1..5 and 9..13) → two spans
    val df = Seq(
      (1L, "p q r s t g1 g2 g3 h i j k l g4"),
      (2L, "p q r s t z1 z2 z3 z4 z5 z6 z7"),
      (3L, "h i j k l y1 y2 y3 y4 y5 y6 y7")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df)
      .select("doc_id", "n_spans", "dup_tokens", "max_span")
      .as[(Long, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2, 10L, 5)))
    assert(got(2L) === ((2L, 1, 5L, 5)))
    assert(got(3L) === ((3L, 1, 5L, 5)))
  }

  test("trunc rerank: full-dim order overrides prefix order within candidates; narrow candidates lose recall") {
    val q = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),    // self — excluded
      (100L, Seq(1.0, 0.0, 1.0, 0.0)),  // prefix-perfect, full ≈ 0.707
      (101L, Seq(0.99, 0.14, 0.0, 0.0)), // prefix ≈ 0.990, full ≈ 0.990
      (102L, Seq(-1.0, 0.1, 0.0, 0.0))  // far
    ).toDF("vec_id", "embedding")
    // wide enough candidate pool: the rerank restores full-dim order
    val wide = Similarity.truncRerankTopK(q, corpus, k = 2,
        prefixDims = 2, candidates = 2)
      .select("neighbor_id", "rk").as[(Long, Int)].collect().toMap
    assert(wide === Map(101L -> 1, 100L -> 2))
    // candidates=1 keeps only the prefix winner — the documented
    // recall trade-off of the cascade
    val narrow = Similarity.truncRerankTopK(q, corpus, k = 1,
        prefixDims = 2, candidates = 1)
      .select("neighbor_id", "rk").as[(Long, Int)].collect().toMap
    assert(narrow === Map(100L -> 1))
  }

  test("semantic decontam: planted paraphrase flagged, far vector clean, witness ties to min test id") {
    val test = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0)), // duplicate eval vector: witness tie
      (3L, Seq(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (100L, Seq(1.0, 0.0, 0.0)),   // verbatim leak
      (101L, Seq(0.95, 0.31225, 0.0)), // paraphrase-close to test 1/2
      (102L, Seq(0.0, 1.0, 0.0))    // clean
    ).toDF("vec_id", "embedding")
    val got = Similarity.contaminatedBy(test, corpus, threshold = 0.8)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set(100L, 101L))
    assert(got(100L) === ((1L, 1.0))) // tie between test 1 and 2 → min id
    assert(got(101L)._1 === 1L && got(101L)._2 >= 0.8 && got(101L)._2 < 1.0)
  }

  test("simhash: identical docs collide at hamming 0; near-identical stay close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "the quick brown fox jumps over the lazy cat near the river bank"),
      (4L, "completely unrelated text about spark catalyst optimizer internals rules")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, maxHamming = 10)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.get((1L, 3L)).exists(_ <= 10), "1-word edit should be near")
    assert(!pairs.contains((1L, 4L)) || pairs((1L, 4L)) > 10)
  }

  test("simhash pairs on fixture are symmetric-free and within hamming bound") {
    val got = Dedup.simhashPairs(docs).as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, h) => a < b && h >= 0 && h <= 3 })
  }

  test("brute-force topk returns k neighbors in descending sim order") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, 5)
      .orderBy("rk").as[(Long, Long, Double, Int)].collect()
    assert(got.length === 5)
    assert(got.map(_._3).sliding(2).forall(w => w.head >= w.last), "sims descending")
    assert(got.forall(_._2 != 0L), "self excluded")
  }

  test("SRP-LSH pairs report exact cosine and respect the threshold") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = Similarity.lshBucketedPairs(emb, threshold = 0.3, bits = 8, tables = 4)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, s) => a < b && s >= 0.3 })
    // spot-check one pair's sim against a direct computation
    val (a0, b0, s0) = got.head
    val direct = emb.filter(col("vec_id").isin(a0, b0))
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].collect()
    val dot = direct(0).zip(direct(1)).map { case (x, y) => x * y }.sum
    val exp = dot / (math.sqrt(direct(0).map(x => x * x).sum) * math.sqrt(direct(1).map(x => x * x).sum))
    assert(math.abs(s0 - exp) < 1e-3)
  }

  test("IVF topk reports exact sims for returned neighbors with nonzero recall") {
    val emb = Tables.t(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(qs, emb, 5)
      .as[(Long, Long, Double, Int)].collect()
    val brute = Similarity.bruteForceTopK(qs, emb, 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    // every reported sim must equal the exact (rounded) cosine from brute scoring
    val bruteAll = Similarity.bruteForceTopK(qs, emb, 500)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, n, s, _) => assert(bruteAll((q, n)) === s) }
    // IVF with nprobe=4/16 cells should recover a decent share of true top-5
    val recall = ivf.map(r => (r._1, r._2)).toSet
      .intersect(brute.map(r => (r._1, r._2)).toSet).size.toDouble / brute.length
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("connected components label chains correctly and keep null-id nodes") {
    val pairs = Seq[(java.lang.Long, java.lang.Long)]((1L, 2L), (2L, 3L), (null, 9L))
      .toDF("doc_a", "doc_b")
    val rows = Dedup.connectedComponents(pairs).collect()
    // every node appearing in a pair must be labeled — including a null id
    // (the convergence-side-effect filter must not silently drop it)
    assert(rows.length === 5, s"expected 5 labeled nodes, got ${rows.toSeq}")
    assert(rows.exists(_.isNullAt(0)), "null-id node must be retained")
    val label = rows.filterNot(_.isNullAt(0))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(label(1L) === 1L && label(2L) === 1L && label(3L) === 1L,
      "the 1-2-3 chain must collapse to the minimum label")
  }

  test("alternating CC matches label propagation on random graphs and string ids") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    val alt = Dedup.connectedComponentsAlternating(edges)
      .as[(Long, Long)].collect().toSet
    val lp = Dedup.connectedComponents(edges, maxIter = 200)
      .as[(Long, Long)].collect().toSet
    assert(alt === lp)

    val s = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("doc_a", "doc_b")
    val sAlt = Dedup.connectedComponentsAlternating(s)
      .as[(String, String)].collect().toMap
    assert(sAlt === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("alternating CC round count is diameter-independent (64-node chain)") {
    // a 64-node path has diameter 63: min-label propagation needs 63
    // rounds (more than its default maxIter=20 budget), while the
    // large-star/small-star alternation collapses it in O(log n) rounds
    val path = spark.range(1, 64)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val alt = Dedup.connectedComponentsAlternating(path)
      .as[(Long, Long)].collect()
    assert(alt.length === 64)
    assert(alt.forall(_._2 === 1L), "whole chain must collapse to node 1")
    assert(Dedup.lastAlternatingRounds <= 12,
      s"expected O(log n) rounds, took ${Dedup.lastAlternatingRounds}")
    // and the label-prop default budget genuinely cannot finish this graph
    val lp = Dedup.connectedComponents(path)
      .as[(Long, Long)].collect()
    assert(lp.exists(_._2 !== 1L),
      "maxIter=20 label-prop should NOT converge on diameter 63 — if it " +
        "does, this guard and the Scaladoc warning are stale")
  }

  test("semdedup labels every vector and matches within-cell union-find truth") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = Similarity.semDedupClusters(emb)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(got.length === vecs.length, "one output row per corpus vector")
    got.foreach { case (id, c, keep) =>
      assert(keep === (id == c), s"keep flag must mark representatives ($id)")
      assert(c <= id, "cluster label is the component minimum")
    }
    // independent truth: same first-16 centroids, same (round-6 cosine
    // desc, cell asc) assignment, exact within-cell pairs at >= 0.4,
    // then union-find
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val cents = vecs.take(16)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (-r6(cos(v, cv)), cid) }.min._2
    }.toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cellOf(ia) == cellOf(ib)
      if BigDecimal(cos(va, vb)).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.4
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = vecs.map { case (id, _) => (id, find(id)) }.toMap
    got.foreach { case (id, c, _) =>
      assert(c === truth(id), s"cluster($id): got $c, truth ${truth(id)}")
    }
    assert(got.exists(g => !g._3), "fixture should contain at least one semantic dup")
  }

  test("semdedup auto-nlist lands in the measured-safe band at both probe sizes") {
    // SCALE.md caveat 9: at the 200k-vector 100x probe corpus, nlist
    // 256..1024 is the measured-safe band (1024 ran the full clusters
    // query in 52 s; fixed 16 measured fatal at 1.78 B within-cell
    // pairs). The corpus-derived default must land inside it there and
    // stay at the fixture-compatible 16 at oracle scales.
    val big = Similarity.autoNlist(200000L)
    assert(big >= 256 && big <= 1024,
      s"auto nlist at 200k vectors must sit in the measured band, got $big")
    assert(Similarity.autoNlist(2000L) === 16, "sf0.01 fixture unchanged")
    assert(Similarity.autoNlist(200L) === 16, "sf0.001 fixture unchanged")
    assert(Similarity.autoNlist(20000L) === 100, "sf0.1: ~200-vector cells")
    assert(Similarity.autoNlist(Long.MaxValue / 4) === (1 << 20),
      "cell-count cap: train real centroids instead of widening first-N")
    // the default (auto) call and the pinned fixture model agree at
    // fixture scale — auto derives 16 here, so existing oracles hold
    val emb = Tables.t(spark, sf, "embeddings")
    val auto = Similarity.semDedupClusters(emb)
      .as[(Long, Long, Boolean)].collect().toSet
    val pinned = Similarity.semDedupClusters(emb, nlist = 16)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(auto === pinned)
  }

  test("LSH bucket cap (opt-in) drops degenerate buckets instead of exploding") {
    // 10k byte-identical docs: every band hashes all ids into ONE bucket,
    // which uncapped would expand to ~50M pairs on one executor. The cap
    // (opt-in via session conf, so oracle-gated paths stay exact) drops
    // those buckets (exact dedup owns identical docs) and reports it.
    val degenerate = spark.range(1, 10001)
      .select(col("id").as("doc_id"),
        lit("identical corpus body that defeats banding entirely").as("text"))
    val before = Dedup.droppedLshBuckets(spark)
    spark.conf.set(graft.llm.Lsh.MaxBucketConf, graft.llm.Lsh.RecommendedMaxBucket.toString)
    try {
      val pairs = Dedup.minhashLsh(degenerate)
      assert(pairs.count() === 0)
      assert(Dedup.droppedLshBuckets(spark) > before,
        "dropped-bucket count should be surfaced")
    } finally spark.conf.unset(graft.llm.Lsh.MaxBucketConf)
  }

  test("PQ encode maps each codebook vector to its own id in every block") {
    val emb = Tables.t(spark, sf, "embeddings")
    val cb = Similarity.firstNCentroids(emb, 16)
    val ids = cb.map(_._1); val cents = cb.map(_._2)
    val selfCodes = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"),
        graft.functions.VectorOps.pqEncode(
          col("embedding").cast("array<double>"), ids, cents, 8).as("codes"))
      .as[(Long, Seq[Long])].collect()
    selfCodes.foreach { case (id, codes) =>
      assert(codes.forall(_ == id),
        s"vector $id block distance to itself is 0 → every code must be $id ($codes)")
    }
  }

  test("PQ top-k recalls a usable fraction of the exact L2 neighbors") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // exact squared-L2 truth (PQ approximates L2, not cosine)
    val v = emb.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val q = v.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("v").as("qv"))
    val d2 = expr("aggregate(zip_with(qv, v, (a, b) -> (a - b) * (a - b)), 0d, (acc, x) -> acc + x)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d").asc, col("id").asc)
    val truth = v.crossJoin(broadcast(q)).filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), round(d2, 6).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("query_id", "id").as[(Long, Long)].collect()
    val recall = pq.toSet.intersect(truth.toSet).size.toDouble / truth.length
    assert(recall >= 0.2, s"recall=$recall with the crude first-16 codebook")
  }

  test("IVF+PQ composition returns k rows per query from probed cells only") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.ivfPqTopK(queries, emb, 5)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)].collect()
    assert(out.groupBy(_._1).forall(_._2.length == 5), "5 neighbors per query")
    // every returned neighbor must live in one of the query's probed cells
    val cents = Similarity.firstNCentroids(emb, 16)
    val v = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val cellOf = Similarity.assignCells(v, cents, "v")
      .select("id", "cell").as[(Long, Long)].collect().toMap
    val probeRk = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("cell").asc)
    val probed = v.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("v").as("qv"))
      .crossJoin(spark.createDataFrame(cents.toSeq.map(c => (c._1, c._2.toSeq)))
        .toDF("cell", "cv"))
      .select(col("query_id"), col("cell"),
        round(Similarity.cosine(col("qv"), col("cv")), 6).as("sim"))
      .withColumn("crk", row_number().over(probeRk)).filter(col("crk") <= 4)
      .select("query_id", "cell").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (q, n, _) =>
      assert(probed(q).contains(cellOf(n)),
        s"neighbor $n of query $q is outside the probed cells")
    }
  }

  test("plane-SRP LSH deterministically finds same-direction vectors") {
    // v1 = 2·v0 ⇒ sign(v·p) identical for every plane ⇒ same bucket in
    // every table, cosine exactly 1.0 — found with probability 1
    val dim = 8
    val mk = (seed: Int) => Array.tabulate(dim)(i => math.sin(seed * 31 + i + 1))
    val rows = Seq(
      (0L, mk(1).toSeq), (1L, mk(1).map(_ * 2.0).toSeq),
      (2L, mk(2).toSeq), (3L, mk(3).toSeq), (4L, mk(4).toSeq),
      (5L, mk(5).toSeq), (6L, mk(6).toSeq), (7L, mk(7).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val planes = Similarity.firstNPlanes(df, 8)
    val got = Similarity.planeSrpPairs(df, planes, bits = 4, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(got.exists { case (a, b, s) => a == 0L && b == 1L && s == 1.0 },
      s"planted pair missing from ${got.toSeq}")
  }

  test("quantized SRP: collapse algebra is exact and the epsilon recall band holds") {
    // ---- planted corpus, d = 4, grid h = 0.01 (scale 100) ----
    // one grid cell with three members (base on exact grid centers, two
    // perturbations < h/2 per coordinate), one qualifying partner, one
    // sub-threshold vector; every vector is all-positive so the chosen
    // planes put EVERYTHING in one bucket — candidates are all pairs
    // and verification alone decides, keeping the test deterministic
    val u = Seq(1.0, 0.8, 0.6, 0.4)
    val u2 = Seq(1.002, 0.799, 0.601, 0.398) // same cell as u
    val u3 = Seq(0.998, 0.804, 0.596, 0.404) // same cell as u
    val w = Seq(0.9, 0.85, 0.65, 0.35)       // cos(u,w) ≈ 0.9960 — in
    val z = Seq(0.4, 0.6, 0.8, 1.0)          // cos(u,z) ≈ 0.8148 — out
    val df = Seq((1L, u), (2L, u2), (3L, u3), (10L, w), (20L, z))
      .toDF("vec_id", "embedding")
    val planes = Array(
      Array(1.0, 0, 0, 0), Array(0.0, 1, 0, 0),
      Array(0.0, 0, 1, 0), Array(0.0, 0, 0, 1),
      Array(1.0, 1, 1, 1), Array(1.0, 1, 0, 0),
      Array(0.0, 0, 1, 1), Array(1.0, 0, 0, 1))
    val thr = 0.9
    val got = Similarity.planeSrpPairsQuantized(df, planes, bits = 4,
        threshold = thr)
      .as[(Long, Long, Double)].collect()
    assert(got.length === got.toSet.size, "no duplicate pair rows")

    // (1) exactness law: output equals the brute-force all-pairs truth
    // over the QUANTIZED vectors (candidates are all pairs here)
    def quant(v: Seq[Double]) = v.map(x => math.round(x * 100) / 100.0)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val all = Seq((1L, u), (2L, u2), (3L, u3), (10L, w), (20L, z))
    val truth = (for {
      (ia, va) <- all; (ib, vb) <- all if ia < ib
      s = cos(quant(va), quant(vb)) if s >= thr
    } yield (ia, ib, s)).toSet
    assert(truth.exists(_._3 == 1.0), "grid-copy clique must exist (premise)")
    assert(got.toSet === truth,
      s"quantized pipeline must equal quantized brute force: ${got.toSeq}")

    // (2) the grid cell collapsed: within-cell pairs at exactly 1.0 and
    // every member inherits the SAME cross sim as its representative
    assert(Seq((1L, 2L), (1L, 3L), (2L, 3L))
      .forall(p => got.exists(g => (g._1, g._2) == p && g._3 == 1.0)))
    val crossSims = got.filter(g => g._2 == 10L).map(_._3).distinct
    assert(crossSims.length === 1, s"members must inherit one sim: ${got.toSeq}")

    // (3) the ε band: |cos(quantized) − cos(raw)| ≤ (h√d)(1/‖a‖+1/‖b‖)
    // for every pair, and the planted in/out pairs sit OUTSIDE the band
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    val eps = (a: Seq[Double], b: Seq[Double]) =>
      0.01 * math.sqrt(4.0) * (1.0 / norm(a) + 1.0 / norm(b))
    for { (ia, va) <- all; (ib, vb) <- all if ia < ib } {
      assert(math.abs(cos(quant(va), quant(vb)) - cos(va, vb)) <=
        eps(va, vb) + 1e-4, s"ε bound violated for ($ia,$ib)")
    }
    assert(cos(u, w) >= thr + eps(u, w), "in-pair must clear threshold+ε (premise)")
    assert(cos(u, z) < thr - eps(u, z), "out-pair must clear threshold−ε (premise)")
    assert(got.exists(g => (g._1, g._2) == (1L, 10L)), "guaranteed catch missing")
    assert(!got.exists(g => g._2 == 20L), "guaranteed exclusion violated")
    graft.llm.Dedup.clearShingleCache()
  }

  test("quantized SRP equals the uncollapsed plane-SRP over the quantized fixture corpus") {
    // the collapse is pure optimization w.r.t. the quantized corpus:
    // running planeSrpPairs directly over (id, quantized embedding)
    // must give row-identical output — pinned on the real fixture table
    val emb = Tables.t(spark, sf, "embeddings")
    val planes = Similarity.firstNQuantizedPlanes(emb, 32)
    val got = Similarity.planeSrpPairsQuantized(emb, planes, bits = 8,
        threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    val qemb = emb.select(col("vec_id"),
      expr("transform(cast(embedding AS array<double>), " +
        "x -> cast(round(x * 100) AS double) / 100)").as("embedding"))
      .filter(expr("exists(embedding, x -> x <> 0.0)"))
    val raw = Similarity.planeSrpPairs(qemb, planes, bits = 8, threshold = 0.3)
      .select(col("id_a"), col("id_b"), col("sim"))
      .as[(Long, Long, Double)].collect()
    assert(raw.nonEmpty, "fixture must contain SRP pairs (premise)")
    assert(got.toSet === raw.toSet)
    assert(got.length === raw.length)
    graft.llm.Dedup.clearShingleCache()
  }

  test("tolerant SRP: band classification is exact, attribution is rep-bound, drops are provable") {
    // ---- planted corpus, d = 4, 2 tables x 2 bits (axis planes) ----
    // signature(v) = ((v0>=0) + 2(v1>=0), (v2>=0) + 2(v3>=0)); all
    // vectors below share table-0 word 3, so every cross-class pair is
    // a candidate through table 0 and CLASSIFICATION alone decides.
    val a1 = Seq(1.0, 0.8, 0.6, 0.02)   // class (3,3), leader of G1
    val a2 = a1                          // verbatim duplicate -> same CELL
    val a4 = Seq(1.0, 0.8, 0.52, 0.02)  // cos(a1,a4)~0.9986 >= 0.995 -> G1
    val a6 = Seq(1.0, 0.8, 0.35, 0.3)   // class (3,3), own group (cos<0.995)
    val a5 = Seq(0.3, 0.9, 0.1, 0.6)    // class (3,3), own group, sub-thr
    val x  = Seq(0.95, 0.45, 0.85, -0.05) // class (3,1): BAND partner of G1
    val x2 = Seq(0.9, 0.2, 0.9, -0.1)     // class (3,1): band, no survivor
    val y  = Seq(1.0, 0.8, 0.6, -0.02)    // class (3,1): ABOVE-band partner
    val w  = Seq(0.9, 0.75, -0.9, 0.5)    // class (3,2): BELOW-band partner
    val ids = Seq(1L -> a1, 2L -> a2, 3L -> a4, 4L -> a6, 5L -> a5,
      10L -> x, 11L -> x2, 20L -> y, 30L -> w)
    val df = ids.toDF("vec_id", "embedding")
    val planes = Array(Array(1.0, 0, 0, 0), Array(0.0, 1, 0, 0),
      Array(0.0, 0, 1, 0), Array(0.0, 0, 0, 1))
    val thr = 0.9
    val rho = 0.1 // cosMinAdmit = 0.995

    def cosR(a: Seq[Double], b: Seq[Double], dp: Int) = {
      val dot = a.zip(b).map { case (p, q) => p * q }.sum
      val r = dot / (math.sqrt(a.map(t => t * t).sum) *
        math.sqrt(b.map(t => t * t).sum))
      BigDecimal(r).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // premises, computed not assumed: the admission, radius, and all
    // three classification positions hold with the 6-dp inputs the
    // operator itself uses
    val c14 = cosR(a1, a4, 6)
    assert(c14 >= 0.995, s"G1 admission premise: $c14")
    assert(cosR(a1, a6, 6) < 0.995 && cosR(a4, a6, 6) < 0.995 &&
      cosR(a1, a5, 6) < 0.995, "a6/a5 must form their own groups")
    val delta = math.sqrt(math.max(0.0, 2 - 2 * c14)) // R(G1); partners singleton
    assert(cosR(a1, y, 6) - delta >= thr, "ABOVE premise (G1 vs y)")
    assert(cosR(a1, x, 6) - delta < thr && cosR(a1, x, 6) + delta >= thr,
      "BAND premise (G1 vs x)")
    assert(cosR(a1, x2, 6) - delta < thr && cosR(a1, x2, 6) + delta >= thr,
      "BAND premise (G1 vs x2)")
    assert(cosR(a1, w, 6) + delta < thr, "BELOW premise (G1 vs w)")
    assert(cosR(a4, y, 4) >= thr, "above-band guarantee must be true for a4 too")
    assert(cosR(a4, x, 4) >= thr && cosR(a1, x, 4) >= thr,
      "band survivors premise")
    assert(cosR(a1, x2, 4) < thr && cosR(a4, x2, 4) < thr,
      "band-no-survivor premise")

    val got = Similarity.srpTolerantPairs(df, planes, bits = 2,
        threshold = thr, maxChord = rho)
      .as[(Long, Long, Double)].collect()
    assert(got.length === got.toSet.size, "no duplicate pair rows")
    val gotMap = got.map(g => (g._1, g._2) -> g._3).toMap

    // (1) pair-set parity with the raw pipeline on the same planes
    val raw = Similarity.planeSrpPairs(df, planes, bits = 2, threshold = thr)
      .as[(Long, Long, Double)].collect()
    assert(raw.map(r => (r._1, r._2)).toSet === gotMap.keySet,
      s"pair-set parity: raw=${raw.toSeq} got=${got.toSeq}")

    // (2) the verbatim duplicate collapsed at cell level: sim exactly 1
    assert(gotMap((1L, 2L)) === 1.0)
    // (3) ABOVE the band: every G1 member inherits the LEADER pair's
    // sim — (3,20) carries round(cos(a1,y),4), provably >= thr but NOT
    // its own exact cosine (rep attribution, the operator's contract)
    assert(gotMap((3L, 20L)) === cosR(a1, y, 4))
    assert(gotMap((3L, 20L)) !== cosR(a4, y, 4), "premise: attribution observable")
    assert(gotMap((1L, 20L)) === cosR(a1, y, 4))
    assert(gotMap((2L, 20L)) === cosR(a1, y, 4), "cell copy inherits too")
    // (4) INSIDE the band: member-exact sims, each member its own value
    assert(gotMap((1L, 10L)) === cosR(a1, x, 4))
    assert(gotMap((3L, 10L)) === cosR(a4, x, 4))
    assert(!gotMap.contains((1L, 11L)) && !gotMap.contains((3L, 11L)),
      "band pair with no qualifying members emits nothing")
    // (5) BELOW the band: dropped without member work
    assert(!got.exists(g => g._1 == 30L || g._2 == 30L))
    // (6) within-class pairs are exact (same signature, cross-group)
    assert(gotMap((1L, 4L)) === cosR(a1, a6, 4))
    assert(gotMap((3L, 4L)) === cosR(a4, a6, 4))
    assert(gotMap((10L, 20L)) === cosR(x, y, 4))
    assert(!gotMap.contains((1L, 5L)), "sub-threshold within-class pair absent")
    graft.llm.Dedup.clearShingleCache()
  }

  test("tolerant SRP equals raw plane-SRP's pair set on the fixture, sims within the stated bound") {
    val emb = Tables.t(spark, sf, "embeddings")
    val planes = Similarity.firstNPlanes(emb, 32)
    val rho = 0.1
    val got = Similarity.srpTolerantPairs(emb, planes, bits = 8,
        threshold = 0.3, maxChord = rho)
      .as[(Long, Long, Double)].collect()
    val nz = emb.filter(expr(
      "exists(cast(embedding as array<double>), x -> x <> 0.0)"))
    val raw = Similarity.planeSrpPairs(nz, planes, bits = 8, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(raw.nonEmpty, "fixture must contain SRP pairs (premise)")
    assert(got.map(g => (g._1, g._2)).toSet === raw.map(r => (r._1, r._2)).toSet,
      "the contract: pair set equals the raw pipeline's")
    // attributed sims sit within Delta_max = 2*rho + rho^2 of exact
    val rawMap = raw.map(r => (r._1, r._2) -> r._3).toMap
    val dmax = 2 * rho + rho * rho + 1e-4
    got.foreach { g =>
      assert(math.abs(g._3 - rawMap((g._1, g._2))) <= dmax,
        s"attribution bound violated for $g vs ${rawMap((g._1, g._2))}")
    }
    graft.llm.Dedup.clearShingleCache()
  }

  test("tolerant SRP on a coherent-drift ladder: output equals raw truth (the q304-DIED shape)") {
    // the SfGen drift shape in miniature: copy c = base + c*eps*ones —
    // the uniform per-copy shift that provably fragments the grid
    // collapse (one boundary crossing per coordinate) but flips an SRP
    // sign only where a dot product sits near zero
    val base = Seq(0.8, -0.6, 0.5, -0.3, 0.9, -0.2, 0.4, -0.7)
    val ladder = (0 until 40).map { c =>
      (100L + c, base.map(_ + c * 0.004))
    }
    val df = ladder.toDF("vec_id", "embedding")
    val planes = Array(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0, 0, 0),
      Array(1.0, 1, 1, 1, 1, 1, 1, 1), Array(1.0, -1, 1, -1, 1, -1, 1, -1),
      Array(0.0, 0, 0, 0, 1, 1, 1, 1), Array(1.0, 0, 1, 0, 1, 0, 1, 0))
    val got = Similarity.srpTolerantPairs(df, planes, bits = 4,
        threshold = 0.995, maxChord = 0.05)
      .as[(Long, Long, Double)].collect()
    val raw = Similarity.planeSrpPairs(df, planes, bits = 4, threshold = 0.995)
      .as[(Long, Long, Double)].collect()
    assert(raw.nonEmpty && raw.length < ladder.length * (ladder.length - 1) / 2,
      "premise: the ladder's ends must NOT all qualify (a real decision boundary)")
    assert(got.map(g => (g._1, g._2)).toSet === raw.map(r => (r._1, r._2)).toSet)
    graft.llm.Dedup.clearShingleCache()
  }

  test("autoSrpBits: the measured ladder points, the constraints, and saturation") {
    // the four measured shapes (SCALE.md rounds 13-14): oracle fixture
    // 500 cells -> 8; pinned-constant fixture 2k -> 8 (r13's hand
    // choice at sf0.1); sf1 20k -> 16; the 100x drift point 200k -> 16
    // (the hand-tuned ladder width; 8 died past 600 s there)
    assert(Similarity.autoSrpBits(500L, 32) === 8)
    assert(Similarity.autoSrpBits(2000L, 32) === 8)
    assert(Similarity.autoSrpBits(20000L, 32) === 16)
    assert(Similarity.autoSrpBits(200000L, 32) === 16)
    // tiny corpora floor at 4 bits; the width always divides the plane
    // count and always leaves >= 2 tables (one table would reduce
    // "shares any bucket" to "identical signature" -- no cross-class
    // candidates at all), so giant corpora SATURATE at planeCount/2
    // rather than degenerate
    assert(Similarity.autoSrpBits(1L, 32) === 4)
    assert(Similarity.autoSrpBits(0L, 32) === 4)
    assert(Similarity.autoSrpBits(Long.MaxValue / 4, 32) === 16)
    for (n <- Seq(1L, 100L, 10000L, 1000000L); p <- Seq(8, 16, 32, 64)) {
      val b = Similarity.autoSrpBits(n, p)
      assert(p % b === 0, s"width $b must divide plane count $p")
      assert(p / b >= 2, s"width $b must leave >= 2 tables of $p planes")
      assert(b >= 4 || b === p / 2, s"floor: $b (n=$n, p=$p)")
    }
    // the ladder spec's 8-plane shape: 40 cells -> the hand-picked 4
    assert(Similarity.autoSrpBits(40L, 8) === 4)
  }

  test("tolerant SRP bits=0 derives the fixture width, publishes it, and matches the explicit run") {
    val emb = Tables.t(spark, sf, "embeddings")
    val planes = Similarity.firstNPlanes(emb, 32)
    val auto = Similarity.srpTolerantPairs(emb, planes, bits = 0,
        threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // the derived width is published eagerly (the auto count runs at
    // construction), and at the fixture's cell count the rule lands on
    // 8 -- the width the r13 registry hand-pinned here
    val chosen = spark.conf.get(Similarity.TolerantAutoBitsConf).toInt
    val nCells = emb.filter(expr(
        "exists(cast(embedding as array<double>), x -> x <> 0.0)"))
      .select(col("embedding").cast("array<double>")).distinct().count()
    assert(chosen === Similarity.autoSrpBits(nCells, 32))
    assert(chosen === 8, s"fixture cell count $nCells should derive 8")
    val explicit = Similarity.srpTolerantPairs(emb, planes, bits = chosen,
        threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto === explicit, "auto must be exactly the derived explicit run")
    graft.llm.Dedup.clearShingleCache()
  }

  test("tolerant SRP bits=0 on the drift-ladder shape reproduces the hand-tuned width") {
    // the planted coherent-drift ladder from the explicit-width spec
    // above: 40 distinct cells over 8 planes -> auto must land on the
    // hand-picked 4 and produce the identical pair set
    val base = Seq(0.8, -0.6, 0.5, -0.3, 0.9, -0.2, 0.4, -0.7)
    val ladder = (0 until 40).map { c => (100L + c, base.map(_ + c * 0.004)) }
    val df = ladder.toDF("vec_id", "embedding")
    val planes = Array(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0, 0, 0),
      Array(1.0, 1, 1, 1, 1, 1, 1, 1), Array(1.0, -1, 1, -1, 1, -1, 1, -1),
      Array(0.0, 0, 0, 0, 1, 1, 1, 1), Array(1.0, 0, 1, 0, 1, 0, 1, 0))
    val auto = Similarity.srpTolerantPairs(df, planes, bits = 0,
        threshold = 0.995, maxChord = 0.05)
      .as[(Long, Long, Double)].collect().toSet
    assert(spark.conf.get(Similarity.TolerantAutoBitsConf).toInt === 4)
    val hand = Similarity.srpTolerantPairs(df, planes, bits = 4,
        threshold = 0.995, maxChord = 0.05)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto === hand)
    graft.llm.Dedup.clearShingleCache()
  }

  test("cross-corpus tolerant SRP equals the cross-side subset of raw SRP on the union") {
    // the q177-for-embeddings contract: collapse per (class, side),
    // candidates from the cross-side leader bucket join, and the pair
    // set must equal raw plane-SRP over the UNION restricted to
    // (batch, base) pairs — at the same planes and the auto width
    val emb = Tables.t(spark, sf, "embeddings")
    val planes = Similarity.firstNPlanes(emb, 32)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val got = Similarity.srpTolerantPairsAgainst(base, batch, planes,
        bits = 0, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty, "fixture must contain cross-side pairs (premise)")
    val bitsUsed = spark.conf.get(Similarity.TolerantAutoBitsConf).toInt
    val nz = emb.filter(expr(
      "exists(cast(embedding as array<double>), x -> x <> 0.0)"))
    val raw = Similarity.planeSrpPairs(nz, planes, bits = bitsUsed,
        threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    val rawCross = raw.flatMap { r =>
      // orient to (batch, base); drop same-side pairs
      if (batchIds(r._1) && !batchIds(r._2)) Some((r._1, r._2))
      else if (batchIds(r._2) && !batchIds(r._1)) Some((r._2, r._1))
      else None
    }.toSet
    assert(got.map(g => (g._1, g._2)).toSet === rawCross,
      "cross pair set must equal the union raw pipeline's cross subset")
    // attributed sims within the ball bound of the exact value
    val rawMap = raw.flatMap(r =>
      Seq((r._1, r._2) -> r._3, (r._2, r._1) -> r._3)).toMap
    val dmax = 2 * 0.1 + 0.1 * 0.1 + 1e-4
    got.foreach { g =>
      assert(math.abs(g._3 - rawMap((g._1, g._2))) <= dmax,
        s"attribution bound violated for $g vs ${rawMap((g._1, g._2))}")
    }
    graft.llm.Dedup.clearShingleCache()
  }

  test("cross-corpus tolerant SRP: base never pairs with itself, batch never with itself") {
    // a planted drift corpus where SAME-side near-dups abound: the
    // operator must emit only (batch, base) pairs, and every planted
    // cross-side drift pair must surface despite living in distinct
    // per-side leader groups
    val base0 = Seq(0.8, -0.6, 0.5, -0.3, 0.9, -0.2, 0.4, -0.7)
    // ids 0,5,10,15 are batch (id % 5 == 0) drift copies; 1,2,3,4,6
    // are base drift copies of the SAME family; 101/102 base-only
    // near-identical pair (a same-side near-dup that must NOT appear)
    val rows = Seq(
      0L -> base0, 5L -> base0.map(_ + 0.004), 10L -> base0.map(_ + 0.008),
      15L -> base0.map(_ + 0.012),
      1L -> base0.map(_ + 0.002), 2L -> base0.map(_ + 0.006),
      3L -> base0.map(_ + 0.010), 4L -> base0.map(_ + 0.014),
      6L -> base0.map(_ + 0.016),
      101L -> Seq(-0.5, 0.7, -0.8, 0.2, -0.4, 0.6, -0.9, 0.1),
      102L -> Seq(-0.5, 0.7, -0.8, 0.2, -0.4, 0.6, -0.9, 0.1).map(_ + 0.001))
    val df = rows.toDF("vec_id", "embedding")
    val planes = Array(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0, 0, 0),
      Array(1.0, 1, 1, 1, 1, 1, 1, 1), Array(1.0, -1, 1, -1, 1, -1, 1, -1),
      Array(0.0, 0, 0, 0, 1, 1, 1, 1), Array(1.0, 0, 1, 0, 1, 0, 1, 0))
    val batch = df.filter(col("vec_id") % 5 === 0)
    val base = df.filter(col("vec_id") % 5 =!= 0)
    val got = Similarity.srpTolerantPairsAgainst(base, batch, planes,
        bits = 4, threshold = 0.995)
      .as[(Long, Long, Double)].collect()
    val batchIds = Set(0L, 5L, 10L, 15L)
    got.foreach { g =>
      assert(batchIds(g._1) && !batchIds(g._2),
        s"output must be (batch, base) only: $g")
    }
    assert(!got.exists(g => g._2 == 101L || g._2 == 102L),
      "the base-only near-dup family must not leak into the output")
    // parity with the raw union's cross subset on this planted shape
    val raw = Similarity.planeSrpPairs(df, planes, bits = 4, threshold = 0.995)
      .as[(Long, Long, Double)].collect()
    val rawCross = raw.flatMap { r =>
      if (batchIds(r._1) && !batchIds(r._2)) Some((r._1, r._2))
      else if (batchIds(r._2) && !batchIds(r._1)) Some((r._2, r._1))
      else None
    }.toSet
    assert(rawCross.nonEmpty, "premise: the drift family must span the split")
    assert(got.map(g => (g._1, g._2)).toSet === rawCross)
    graft.llm.Dedup.clearShingleCache()
  }

  test("trainCentroids is deterministic and drives ivfTopK end to end") {
    val emb = Tables.t(spark, sf, "embeddings")
    val c1 = Similarity.trainCentroids(emb, nlist = 8, sampleN = 256, iters = 3)
    val c2 = Similarity.trainCentroids(emb, nlist = 8, sampleN = 256, iters = 3)
    assert(c1.length === 8)
    assert(c1.map(_._2.toSeq).toSeq === c2.map(_._2.toSeq).toSeq, "k-means must be deterministic")
    val res = Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb, 5,
      nlist = 8, nprobe = 3, centroids = Some(c1))
    assert(res.count() === 25)
  }

  // non-periodic synthetic text: CDC boundary density matches random
  // content (a repeated phrase would alias the rolling window period)
  private def words(seed: Int, n: Int): String =
    (1 to n).map(i => s"tok${(seed * 2654435761L + i * 40503L) % 99991}").mkString(" ")

  test("partial-dup pairs find shared boilerplate, not unrelated docs") {
    val boiler = words(777, 200)
    def noise(seed: Int) = words(seed, 60)
    val df = Seq(
      (1L, noise(1) + " " + boiler + " " + noise(2)),
      (2L, noise(3) + " " + boiler + " " + noise(4)),   // same boilerplate, different position
      (3L, noise(5) + " " + noise(6)),                  // unrelated
      (4L, noise(7) + " " + noise(8))                   // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.partialDupPairs(df, minChunk = 32, mask = 0x3f)
      .as[(Long, Long, Int)].collect()
    assert(got.exists { case (a, b, n) => a == 1L && b == 2L && n >= 2 },
      s"boilerplate pair missing: ${got.toSeq}")
    assert(!got.exists { case (a, b, _) => (a, b) == (3L, 4L) },
      s"unrelated docs must not pair: ${got.toSeq}")
  }

  test("content-defined chunks are position-independent") {
    import graft.functions.Hashing
    val core = words(42, 200)
    val df = Seq((1L, words(9, 10) + " " + core), (2L, core + " " + words(11, 10))).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        Hashing.rollingChunks(col("text"), 32, 0x3f).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    // interior chunks of the shared core must coincide despite the shift
    val shared = chunks(1L).toSet.intersect(chunks(2L).toSet)
    assert(shared.size >= 2, s"expected shared interior chunks, got ${shared.size}")
  }

  test("hashed-gram jaccard equals string-gram jaccard on real documents") {
    import graft.functions.Hashing
    val d = docs.limit(30)
      .select(col("doc_id"),
        Hashing.charNgrams(col("text"), 4).as("g"),
        Hashing.gramHashes(col("text"), 4).as("hg"))
      .filter(size(col("g")) > 0)
    val a = d.select(col("doc_id").as("ia"), col("g").as("g_a"), col("hg").as("hg_a"))
    val b = d.select(col("doc_id").as("ib"), col("g").as("g_b"), col("hg").as("hg_b"))
    val cmp = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        round(TextOps.jaccard(col("g_a"), col("g_b")), 6).as("js"),
        round(Hashing.jaccardSimHashed(col("hg_a"), col("hg_b")), 6).as("jh"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("distributed k-means matches its own determinism and drives IVF") {
    val emb = Tables.t(spark, sf, "embeddings")
    val c1 = Similarity.trainCentroidsDistributed(emb, nlist = 8, iters = 2)
    val c2 = Similarity.trainCentroidsDistributed(emb, nlist = 8, iters = 2)
    assert(c1.length === 8)
    // repeatable up to float-sum merge order (shuffle merge order can
    // permute the partial sums, so exact bit equality is not guaranteed)
    c1.zip(c2).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    // centroids are unit-norm (spherical)
    c1.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    val res = Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb, 5,
      nlist = 8, nprobe = 3, centroids = Some(c1))
    assert(res.count() === 25)
  }

  test("langId marks han-script docs zh and anglophone docs en") {
    val df = Seq(
      (1L, "the cat and the dog went to the market in the morning"),
      (2L, "der Hund und die Katze sind nicht mit dem Auto gefahren"),
      (3L, "你好 世界 这是 一个 测试")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en"); assert(got(2L) === "de"); assert(got(3L) === "zh")
  }

  test("kernel tokenization matches SQL column semantics on control-char framing") {
    // SQL trim strips spaces ONLY; \t/\n framing must produce the same
    // (empty-token-including) splits in kernels as in the column path
    val tricky = Seq(
      (1L, "\nhello world\t"), (2L, " a  b "), (3L, ""), (4L, "x"),
      (5L, "\t\n mixed \r framing \n")
    ).toDF("doc_id", "text")
    val got = tricky.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("kernel_n"),           // TextStats kernel
      size(split(TextOps.normalized(col("text")), " ")).as("column_n"), // pure column path
      size(TextOps.wordShingles(col("text"), 2)).as("kernel_shingles"))
      .orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"doc ${r.getLong(0)}: kernel=${r.getInt(1)} column=${r.getInt(2)}")
    }
    // "\nhello world\t" normalizes to " hello world " -> 4 tokens incl. empties
    assert(got(0).getInt(1) === 4)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds")
    ).toDF("doc_id", "text")
    val fps = df.select(TextOps.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) === fps(1)); assert(fps(0) !== fps(2))
  }

  test("matrix-accumulator covariance equals q197's explode formulation row for row") {
    val emb = Tables.t(spark, sf, "embeddings")
    val accum = Similarity.covarianceMatrix(emb)
      .as[(Int, Int, Double)].collect().toSeq
    val explode = graft.queries.LlmQueries.embCovariance(spark, sf)
      .as[(Int, Int, Double)].collect().toSeq
    assert(accum.nonEmpty)
    assert(accum === explode)
  }

  test("matrix-accumulator covariance rejects ragged embedding widths") {
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      Similarity.covarianceMatrix(bad).collect()
    }
    assert(ex.getMessage.contains("ragged embedding width")
      || Option(ex.getCause).exists(_.getMessage.contains("ragged embedding width")))
  }

  test("trained centroids beat the first-N placeholder on a sampling-biased clustered corpus") {
    // The case IVF training exists for: the first 16 ids all belong to
    // ONE cluster (ids < 60 are cluster 0), so the first-N placeholder's
    // centroids have zero coverage of the other 7 clusters and cross-
    // cluster vectors land in noise-driven cells; the md5-bucket-sampled
    // k-means sees every cluster. Clusters are moderately tight
    // (within-cos ≈ 0.86, cross ≈ 0) with per-(id,dim) md5 noise so
    // neighbor cell ranks are NOT trivially identical to the query's —
    // the regime where centroid quality actually decides recall.
    // (On the structureless embeddings fixture q208 measures the
    // opposite outcome — that contrast is the point of the harness.)
    val d = 16
    def noise(i: Int, j: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$j".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 1000) / 1000.0 * 0.5 - 0.25
    }
    def vec(i: Int): Seq[Double] = {
      val k = if (i < 60) 0 else i % 8
      (0 until d).map(j =>
        (if (j == 2 * k || j == 2 * k + 1) 1.0 else 0.0) + noise(i, j))
    }
    val planted = (0 until 200).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val q = planted.filter(col("vec_id").between(60, 69))
    val truth = Similarity.bruteForceTopK(q, planted, 5)
      .select("query_id", "neighbor_id")
    def hitsOf(cents: Array[(Long, Array[Double])]): Long =
      truth.join(
        Similarity.ivfTopK(q, planted, 5, centroids = Some(cents))
          .select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    val trained = hitsOf(Similarity.trainCentroidsReplayable(planted))
    val firstN = hitsOf(Similarity.firstNCentroids(planted, 16))
    assert(trained > firstN, s"trained=$trained firstN=$firstN")
    assert(trained === 50L, s"trained should be perfect here, got $trained")
  }

  test("BPE subwords match a hand-computed merge sequence") {
    // en16 table, rules applied IN ORDER, one greedy left-to-right pass
    // each. Hand derivation:
    //   "the":     t h e -> (t,h) th e -> (th,e) the
    //   "theater": t h e a t e r -> th -> the a t e r -> (e,r) the a t er
    //              -> (a,t) the at er
    //   "is":      no rule hits -> i s
    //   "interesting": (i,n) merges BOTH in's (fold reuses its own
    //              output: ...t i + n -> t in); then (e,r), (s,t),
    //              (in,g) -> in t er e st ing
    //   "standing": (s,t) st, (a,n) an, (an,d) and, (in,g) ing
    //   "Aaa!":    strips to "aaa"; (a,a) not in the table -> a a a
    val df = Seq(
      (1L, "The theater is interesting"),
      (2L, "standing  Aaa!"),
      (3L, "123 !!"), // strips to nothing -> zero subwords
      (4L, "")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.bpeSubwords(col("text")))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("the", "the", "at", "er", "i", "s",
      "in", "t", "er", "e", "st", "ing"))
    assert(got(2L) === Seq("st", "and", "ing", "a", "a", "a"))
    assert(got(3L) === Seq.empty)
    assert(got(4L) === Seq.empty)
  }

  test("subwordCount never undercounts words and equals size(bpeSubwords) on the corpus") {
    // every word contributes >= 1 subword, and a merge only ever shrinks
    // the sequence, so n_words <= n_subwords <= n_chars
    val rows = docs.select(
      size(filter(transform(TextOps.tokens(col("text")),
        t => regexp_replace(t, lit("[^a-z]"), lit(""))), w => w =!= ""))
        .cast("long").as("n_words"),
      TextOps.subwordCount(col("text")).as("n_sub"),
      size(TextOps.bpeSubwords(col("text"))).cast("long").as("n_sub2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2))
      assert(r.getLong(0) <= r.getLong(1),
        s"words=${r.getLong(0)} > subwords=${r.getLong(1)}")
    }
  }

  test("unknown BPE merges table fails at plan time") {
    val ex = intercept[IllegalArgumentException] {
      docs.select(TextOps.bpeSubwords(col("text"), "nope"))
    }
    assert(ex.getMessage.contains("unknown BPE merges table"))
  }
}
