package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Planted-fixture ground truth for the round-5 pipeline ops (q187
  * paragraph dedup, q188 CCNet terciles, q189 Bloom admission gate,
  * q190 n-gram novelty): corpora CONSTRUCTED so the expected answer is
  * computable by independent brute force in plain Scala collections —
  * the md5 arithmetic, tercile integer cuts, bloom bit sets, and
  * shingle counts are all re-derived outside Spark ([[PlantedArith]]).
  * The DuckDB oracle pins engine-vs-engine agreement; these pin
  * engine-vs-ARITHMETIC. */
class PipelinePlantedSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import PlantedArith.{md5hex, rnd, toks}

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-planted5").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ------------------------------------------------------------- q187

  test("q187 paragraph dedup keeps exactly the corpus-first paragraph instances") {
    def par(prefix: String) = (1 to 32).map(i => f"$prefix$i%02d")
    val pA = par("a"); val pB = par("b"); val pC = par("c")
    val short = Seq("zz1", "zz2", "zz3", "zz4", "zz5")
    val dir = writeDocs(Seq(
      (1L, (pA ++ pB).mkString(" "), "en", "src0", 0L),  // both first
      (2L, (pA ++ pC).mkString(" "), "en", "src0", 0L),  // A dup of doc1
      (3L, (pB ++ pB).mkString(" "), "en", "src0", 0L),  // both dup (doc1 B first)
      (4L, short.mkString(" "), "en", "src0", 0L)))      // sub-width doc
    val fp = (p: Seq[String]) => md5hex(p.mkString(" "))
    val rows = SparkEntry.queries("q187_paragraph_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getString(4)))
    val expected = Array(
      (1L, 2, 2, 1.0, md5hex(fp(pA) + " " + fp(pB))),
      (2L, 2, 1, 0.5, md5hex(fp(pC))),
      (3L, 2, 0, 0.0, md5hex("")),
      (4L, 1, 1, 1.0, md5hex(fp(short))))
    assert(rows === expected, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q188

  test("q188 tercile cut equals the integer-arithmetic brute force, language by language") {
    // two languages with enough docs that head/middle/tail all exist,
    // doc_mean varied by mixing high-df and singleton terms
    val texts = Seq(
      (1L, "en", "the the the the"),
      (2L, "en", "the the u2a u2b"),
      (3L, "en", "the u3a u3b u3c"),
      (4L, "en", "u4a u4b u4c u4d"),
      (5L, "en", "the the the u5a"),
      (6L, "en", "the u6a"),
      (7L, "en", "u7a u7b"),
      (8L, "fr", "le le le"),
      (9L, "fr", "le le v9a"),
      (10L, "fr", "le v10a v10b"),
      (11L, "fr", "v11a v11b v11c"))
    val dir = writeDocs(texts.map { case (id, l, t) => (id, t, l, "src0", 0L) })

    // brute force: corpus-wide term counts -> per-doc mean -> tercile
    val all = texts.flatMap { case (_, _, t) => toks(t) }
    val cnt = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ds = texts.map { case (id, l, t) =>
      val tk = toks(t)
      val sumCnt = tk.map(cnt).sum
      (id, l, tk.size.toLong, sumCnt, rnd(sumCnt.toDouble / tk.size, 6))
    }
    val bucketed = ds.groupBy(_._2).toSeq.flatMap { case (lang, docs) =>
      val sorted = docs.sortBy { case (id, _, _, _, m) => (-m, id) }
      val n = sorted.size
      sorted.zipWithIndex.map { case (d, i) =>
        val rn = i + 1
        val b = if (rn * 3 <= n) "head" else if (rn * 3 <= 2 * n) "middle" else "tail"
        (d, b)
      }
    }
    val expected = bucketed.groupBy { case ((_, lang, _, _, _), b) => (lang, b) }
      .toSeq.map { case ((lang, b), rows) =>
        val nTok = rows.map(_._1._3).sum
        val sumCnt = rows.map(_._1._4).sum
        (lang, b, rows.size, rnd(sumCnt.toDouble / nTok, 4),
          rows.map(_._1._5).min, rows.map(_._1._5).max)
      }.sortBy(r => (r._1, r._2)).toArray

    val rows = SparkEntry.queries("q188_ccnet_buckets")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows === expected, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q189

  test("q189 bloom gate: no false negatives, counts equal the bit-set arithmetic") {
    val base = Seq(
      (1L, "apple banana cherry"), (2L, "delta echo foxtrot"),
      (3L, "golf hotel india"), (4L, "juliet kilo lima"),
      (5L, "mike november oscar"))
    val batch = Seq(
      (101L, "cherry apple banana"),   // bag-dup of doc 1 (order shuffled)
      (102L, "delta echo foxtrot"),    // verbatim dup of doc 2
      (103L, "papa quebec romeo"),     // new
      (104L, "sierra tango uniform"),  // new
      (105L, "victor whiskey xray"))   // new
    val dir = writeDocs(
      base.map { case (id, t) => (id, t, "en", "src0", 0L) } ++
      batch.map { case (id, t) => (id, t, "en", "src19", 0L) })

    // brute force bloom: fp = md5 of sorted distinct tokens; 4 salted
    // positions in m=65536; maybe = all positions set by the base
    val bagFp = (t: String) => md5hex(toks(t).distinct.sorted.mkString(" "))
    val pos = (fp: String) => (0 until 4).map(j =>
      java.lang.Long.parseLong(md5hex(fp + s"bloom$j").take(8), 16) % 65536)
    val baseFps = base.map { case (_, t) => bagFp(t) }.distinct
    val bits = baseFps.flatMap(pos).toSet
    val flagged = batch.map { case (_, t) =>
      val fp = bagFp(t)
      (pos(fp).forall(bits), baseFps.contains(fp))
    }
    val expected = flagged.groupBy(identity).toSeq
      .map { case ((m, d), g) => (m, d, g.size.toLong, bits.size) }
      .sortBy(r => (r._1, r._2)).toArray

    val rows = SparkEntry.queries("q189_bloom_gate")(spark, dir)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getInt(3)))
    assert(rows === expected, rows.mkString(", "))
    assert(!rows.exists(r => r._2 && !r._1),
      "a true duplicate escaped the bloom gate (false negative): " + rows.mkString(", "))
  }

  // ------------------------------------------------------------- q190

  test("q190 novelty equals the shingle-count brute force, including within-doc repeats") {
    val texts = Seq(
      (1L, "t1 t2 t3 t4 t5 t6"),                  // 2 shingles, 1 shared
      (2L, "t1 t2 t3 t4 t5 x1 x2 x3 x4"),         // 5 shingles, 1 shared
      (3L, "r r r r r r"),                        // same shingle twice -> all dup
      (4L, "u1 u2 u3 u4 u5"))                     // 1 unique shingle
    val dir = writeDocs(texts.map { case (id, t) => (id, t, "en", "src0", 0L) })

    val sh = texts.flatMap { case (id, t) =>
      toks(t).sliding(5).filter(_.size == 5).map(w => (id, md5hex(w.mkString(" "))))
    }
    val tot = sh.groupBy(_._2).map { case (h, g) => h -> g.size }
    val expected = texts.map { case (id, _) =>
      val mine = sh.filter(_._1 == id)
      val n = mine.size.toLong
      val dup = mine.count(s => tot(s._2) >= 2).toLong
      (id, n, dup, rnd((n - dup).toDouble / n, 4), (n - dup) * 2 < n)
    }.toArray

    val rows = SparkEntry.queries("q190_ngram_novelty")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows === expected, rows.mkString(", "))
    // doc 3's within-doc repetition alone must flag it
    assert(rows.find(_._1 == 3L).exists(r => r._5 && r._4 == 0.0))
  }

  // ------------------------------------------------------------- q191

  test("q191 BM25 equals the hand arithmetic; non-matching docs never rank") {
    val texts = Seq(
      (1L, "vector vector spark f1 f2"),    // dl=5: vector tf=2, spark tf=1
      (2L, "customer f3 f4 f5"),            // dl=4: customer tf=1
      (3L, "f6 f7"),                        // no query term -> absent
      (4L, "vector spark customer"))        // dl=3: all three, shortest doc
    val dir = writeDocs(texts.map { case (id, t) => (id, t, "en", "src0", 0L) })

    val q = Seq("vector", "spark", "customer")
    val docs = texts.map { case (id, t) => (id, toks(t)) }
    val n = docs.size.toLong
    val sumDl = docs.map(_._2.size.toLong).sum
    val df = q.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val expected = docs.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val hits = q.filter(tk.contains)
      if (hits.isEmpty) None else {
        val score = hits.map { t =>
          val tf = tk.count(_ == t).toLong
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          idf * (tf * 2.2) /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * ((dl * n).toDouble / sumDl.toDouble)))
        }.sum
        Some((id, hits.size, rnd(score, 4)))
      }
    }.sortBy { case (id, _, sc) => (-sc, id) }.toArray

    val rows = SparkEntry.queries("q191_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows === expected, rows.mkString(", "))
    assert(!rows.exists(_._1 == 3L), "doc without query terms must not rank")
    // the all-terms doc with the shortest length must rank first: every
    // term matches and the length normalization favors it
    assert(rows.head._1 == 4L, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q192

  test("q192 temperature weights equal the sqrt arithmetic, source by source") {
    val texts = Seq(
      (1L, "a b c d e f g h i", "srcA"), (2L, "a b c d e f g", "srcA"),
      (3L, "a b c d", "srcB"),
      (4L, "a", "srcC"))
    val dir = writeDocs(texts.map { case (id, t, src) => (id, t, "en", src, 0L) })

    val perSrc = texts.groupBy(_._3).map { case (src, ds) =>
      src -> ds.map(d => toks(d._2).size.toLong).sum
    }
    val totTokens = perSrc.values.sum
    // sum sqrt in source order; assert the engine's order-free sum only
    // after 6-dp rounding (3 addends, error ~1e-16 — never near 5e-7)
    val totW = perSrc.toSeq.sortBy(_._1).map(v => math.sqrt(v._2.toDouble)).sum
    val expected = perSrc.toSeq.sortBy(_._1).map { case (src, tk) =>
      val pRaw = rnd(tk.toDouble / totTokens.toDouble, 6)
      val pT2 = rnd(math.sqrt(tk.toDouble) / totW, 6)
      (src, tk, pRaw, pT2, rnd(pT2 / pRaw, 4))
    }.toArray

    val rows = SparkEntry.queries("q192_temperature_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows === expected, rows.mkString(", "))
    // flattening must boost the smallest source above its raw share and
    // shrink the largest below it
    assert(rows.find(_._1 == "srcC").exists(_._5 > 1.0))
    assert(rows.find(_._1 == "srcA").exists(_._5 < 1.0))
  }

  // ------------------------------------------------------------- q194

  test("q194 recall counts exactly the planted IVF misses against brute-force truth") {
    // 16-dim corpus: ids 0-15 are one-hot basis vectors (and therefore
    // the first-16 IVF centroids); id 20 leans toward cell 0, ids 21/22
    // lean toward cells 10/5 — OUTSIDE a cell-0 query's 4-probe set, so
    // their true-top-5 memberships are plantable misses. All weights are
    // binary-exact floats (0.5, 0.75) so cosine replays exactly.
    def oneHot(i: Int): Array[Double] = Array.tabulate(16)(j => if (j == i) 1.0 else 0.0)
    def mix(i: Int, wi: Double, j: Int, wj: Double): Array[Double] =
      Array.tabulate(16)(d => if (d == i) wi else if (d == j) wj else 0.0)
    val vecs: Map[Long, Array[Double]] =
      (0L to 15L).map(i => i -> oneHot(i.toInt)).toMap ++
        Map(20L -> mix(0, 0.75, 1, 0.5), 21L -> mix(0, 0.5, 10, 0.75),
          22L -> mix(5, 0.75, 6, 0.5))
    val dir = java.nio.file.Files.createTempDirectory("graft-planted5").toString
    vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat).toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // independent replay: same cosine accumulation, 6-dp cell ranks,
    // 4-dp scoring, id tie-breaks — in plain Scala collections
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val cents = ids.take(16).map(id => id -> vecs(id))
    def topCells(v: Array[Double], n: Int): Seq[Long] =
      cents.map { case (c, cv) => (-rnd(cos(v, cv), 6), c) }.sorted.take(n).map(_._2)
    val cellOf = vecs.map { case (id, v) => id -> topCells(v, 1).head }
    def top5(q: Long, candidates: Seq[Long]): Set[Long] =
      candidates.filter(_ != q)
        .map(n => (-rnd(cos(vecs(q), vecs(n)), 4), n)).sorted.take(5).map(_._2).toSet
    val expected = ids.filter(_ < 10).map { q =>
      val truth = top5(q, ids)
      val probed = topCells(vecs(q), 4).toSet
      val ivf = top5(q, ids.filter(n => probed(cellOf(n))))
      val hit = (truth & ivf).size
      (q, hit, rnd(hit / 5.0, 2))
    }.toArray

    val rows = SparkEntry.queries("q194_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows === expected, rows.mkString(", "))
    // the planted cross-cell neighbors must actually cost recall
    // somewhere, without collapsing the metric to all-zero
    assert(rows.exists(_._3 < 1.0), "planted miss did not register: " + rows.mkString(", "))
    assert(rows.exists(_._3 > 0.0), rows.mkString(", "))
  }

  // ------------------------------------------------------------- q195

  test("q195 weighted median follows the weight mass, not the row count") {
    // one heavy line (qty 96) at price 10 against five light lines (qty
    // 1 each) at higher prices: the row median of prices is 40, but the
    // weight mass puts the median at the heavy line's price 10
    val dir = java.nio.file.Files.createTempDirectory("graft-planted5").toString
    Seq(
      (1L, 1, "A", 10.0, 96.0), (2L, 1, "A", 20.0, 1.0), (3L, 1, "A", 30.0, 1.0),
      (4L, 1, "A", 40.0, 1.0), (5L, 1, "A", 50.0, 1.0), (6L, 1, "A", 60.0, 1.0),
      // flag B: even total weight 4, split 2+2 — the 2*cum >= tot
      // boundary lands EXACTLY on the first row (2*2 >= 4)
      (7L, 1, "B", 5.0, 2.0), (8L, 1, "B", 7.0, 2.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q195_weighted_median")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows === Array(("A", 10.0, 101L), ("B", 5.0, 4L)), rows.mkString(", "))
  }

  // ------------------------------------------------------------- q196

  test("q196 containment flags the planted quote in ONE direction only") {
    // doc 2 contains doc 1 verbatim plus as much again: containment of
    // 1-in-2 is 1.0 (every shingle of 1 appears in 2) while 2-in-1 is
    // well under the 0.5 gate — and Jaccard would blur the direction
    val a = (1 to 10).map(i => f"a$i%02d").mkString(" ")
    val b = a + " " + (1 to 10).map(i => f"b$i%02d").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, a, "en", "src0", 0L),
      (2L, b, "en", "src0", 0L),
      (3L, (1 to 10).map(i => f"c$i%02d").mkString(" "), "en", "src0", 0L)))
    val rows = SparkEntry.queries("q196_containment_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1: 6 distinct 5-shingles, all inside doc 2 -> containment 1.0.
    // doc 2: 16 shingles (6 of a, 5 bridging, 5 of b... = 21-5=16),
    // shares 6 -> 0.375 < 0.5 -> absent. doc 3 shares nothing.
    assert(rows.length === 1 && rows.head._1 == 1L && rows.head._2 == 2L &&
      rows.head._4 == 1.0, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q197

  test("q197 covariance equals the two-pass brute force on planted vectors") {
    // 4 vectors in 64 dims: dims 1/2 perfectly correlated, dim 3
    // anti-correlated with them, dim 4 constant (zero variance), the
    // rest zero. All values binary-exact.
    val vals = Seq(
      Seq(1.0, 1.0, -1.0, 0.5), Seq(2.0, 2.0, -2.0, 0.5),
      Seq(-1.0, -1.0, 1.0, 0.5), Seq(-2.0, -2.0, 2.0, 0.5))
    val vecs = vals.zipWithIndex.map { case (v, id) =>
      (id.toLong, (v ++ Seq.fill(60)(0.0)).map(_.toFloat), 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-planted5").toString
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val n = vals.size
    val full = vals.map(v => v ++ Seq.fill(60)(0.0))
    def mu(i: Int) = full.map(_(i)).sum / n
    def cov(i: Int, j: Int) =
      rnd(full.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j), 4) + 0.0
    val expected = (for { i <- 0 until 64; j <- i until 64 }
      yield (i + 1, j + 1, cov(i, j))).toArray

    val rows = SparkEntry.queries("q197_emb_covariance")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows === expected, s"first diffs: ${
      rows.zip(expected).filter(p => p._1 != p._2).take(5).mkString(", ")}")
    // the planted structure: var(1)=var(2)=cov(1,2)=2.5, cov with dim 3
    // is its negation, dim 4 contributes nothing off-diagonal
    assert(rows.find(r => r._1 == 1 && r._2 == 2).exists(_._3 == 2.5))
    assert(rows.find(r => r._1 == 1 && r._2 == 3).exists(_._3 == -2.5))
    assert(rows.find(r => r._1 == 4 && r._2 == 4).exists(_._3 == 0.0))
    assert(rows.find(r => r._1 == 1 && r._2 == 4).exists(_._3 == 0.0))
  }

  // ------------------------------------------------------------- q198

  test("q198 TV distance equals the rational arithmetic, absent vocab included") {
    // srcX = {a:2/3, b:1/3}, srcY = {b:1/4, c:3/4}, corpus = {a:2/7,
    // b:2/7, c:3/7}; srcX never sees 'c', so its TV must include the
    // 3/7 correction term without a vocab×sources cross join:
    // TV(X) = (8/21 + 1/21 + 3/7)/2 = 3/7, TV(Y) = (1/28 + 9/28 + 2/7)/2 = 9/28
    val dir = writeDocs(Seq(
      (1L, "a a b", "en", "srcX", 0L),
      (2L, "b c c c", "en", "srcY", 0L)))
    val rows = SparkEntry.queries("q198_domain_shift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val expected = Array(
      ("srcX", 2, rnd(3.0 / 7.0, 4)),
      ("srcY", 2, rnd(9.0 / 28.0, 4)))
    assert(rows === expected, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q199

  test("q199 histogram counts the planted dup group and its exact token savings") {
    // d1=d2=d3 after normalization (case + whitespace) -> one group of
    // 3 (9 tokens, keep d1's 3 -> 6 removable); d4, d5 are singletons
    val dir = writeDocs(Seq(
      (1L, "x y z", "en", "s0", 0L),
      (2L, "x   Y z ", "en", "s0", 0L),
      (3L, "x y z", "en", "s0", 0L),
      (4L, "a b", "en", "s0", 0L),
      (5L, "c", "en", "s0", 0L)))
    val rows = SparkEntry.queries("q199_dup_histogram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows === Array((1L, 2L, 2L, 0L, 0L), (3L, 1L, 3L, 2L, 6L)),
      rows.mkString(", "))
  }

  // ------------------------------------------------------------- q200

  test("q200 report equals the hand-computed metrics on a punct/stopword-free corpus") {
    // with no punctuation and no stopwords, the q39 quality formula
    // collapses to round(0.75 * n_tok/50, 4) — so every metric is
    // hand-computable: docs (4, one exact dup pair), tokens 11,
    // fingerprints 3, langs 2, sources 2, all scores < 0.5
    val dir = writeDocs(Seq(
      (1L, "t1 t2 t3 t4", "en", "s0", 0L),
      (2L, "t1 t2 t3 t4", "en", "s1", 0L),
      (3L, "u1 u2", "fr", "s0", 0L),
      (4L, "v1", "en", "s0", 0L)))
    val q = (n: Int) => rnd(0.75 * (n / 50.0), 4)
    val sq = q(4) + q(4) + q(2) + q(1)
    val expected = Array(
      ("exact_dup_frac", rnd(1.0 - 3.0 / 4.0, 6)),
      ("low_quality_frac", 1.0),
      ("mean_doc_tokens", rnd(11.0 / 4.0, 4)),
      ("mean_quality", rnd(sq / 4.0, 6)),
      ("n_distinct_fingerprints", 3.0),
      ("n_docs", 4.0),
      ("n_langs", 2.0),
      ("n_sources", 2.0),
      ("n_tokens", 11.0))
    val rows = SparkEntry.queries("q200_corpus_report")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows === expected, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q201

  test("q201 calibration equals the salted-min arithmetic; sub-threshold pairs absent") {
    // doc1/doc2 share 4 of their 3-token shingles; doc3 is unrelated;
    // doc4 is too short to shingle
    val dir = writeDocs(Seq(
      (1L, "w1 w2 w3 w4 w5 w6", "en", "s0", 0L),   // shingles at pos 1..4
      (2L, "w1 w2 w3 w4 w5 w6 x1", "en", "s0", 0L), // adds one shingle
      (3L, "z1 z2 z3 z4", "en", "s0", 0L),
      (4L, "y1 y2", "en", "s0", 0L)))
    def shingles(t: String) =
      toks(t).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq.distinct
    def sig(sh: Seq[String]) =
      (0 until 32).map(j => sh.map(s => md5hex(s"mh$j|$s")).min)
    val (sa, sb) = (shingles("w1 w2 w3 w4 w5 w6"), shingles("w1 w2 w3 w4 w5 w6 x1"))
    val trueJ = rnd(sa.intersect(sb).size.toDouble /
      (sa ++ sb).distinct.size.toDouble, 4)
    val est = rnd(sig(sa).zip(sig(sb)).count(p => p._1 == p._2) / 32.0, 4)
    val rows = SparkEntry.queries("q201_minhash_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows === Array((1L, 2L, trueJ, est, rnd(math.abs(est - trueJ), 4))),
      rows.mkString(", "))
    assert(trueJ == 0.8, s"planted true jaccard should be 4/5: $trueJ")
  }

  // ------------------------------------------------------------- q202

  test("q202 decay weights are exact powers of two; age anchored to the corpus max ts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-planted5").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // the latest event is a CLICK — ages must anchor to it, not to the
    // latest purchase
    Seq(
      (1L, ts("2026-01-10 08:00:00"), 9L, "click", 0.0, "{}"),
      (2L, ts("2026-01-09 12:00:00"), 1L, "purchase", 8.0, "{}"),
      (3L, ts("2026-01-07 01:00:00"), 1L, "purchase", 16.0, "{}"),
      (4L, ts("2026-01-10 06:00:00"), 2L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q202_halflife_decay")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // user 1: 8·2^-1 + 16·2^-3 = 6.0 (exact); user 2: 5·2^0 = 5.0
    assert(rows === Array((1L, 2L, 6.0), (2L, 1L, 5.0)), rows.mkString(", "))
  }

  // ------------------------------------------------------------- q203

  test("q203 keeps each prefix's top-3 by frequency with the term tie-break") {
    val dir = writeDocs(Seq(
      (1L, "apple apple apricot april apron banana banana art x", "en", "s0", 0L),
      (2L, "apple april april banana art", "en", "s0", 0L)))
    // ap: apple 3, april 3, apricot 1, apron 1 -> top3 apple, april,
    // apricot (freq desc, term asc; apricot beats apron on the term
    // tie); ar: art 2; ba: banana 3; the 1-char term 'x' is excluded
    val rows = SparkEntry.queries("q203_prefix_topterms")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val expected = Array(
      ("ap", 1, "apple", 3L), ("ap", 2, "april", 3L), ("ap", 3, "apricot", 1L),
      ("ar", 1, "art", 2L), ("ba", 1, "banana", 3L))
    assert(rows === expected, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q204

  test("q204 digit profile equals the hand count against the literal Benford table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-planted5").toString
    val totals = Seq(123.0, 150.5, 199.99, 20.5, 35.0, 900.1)
    totals.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q204_benford_audit")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val e = Map(1 -> 0.301029995663981, 2 -> 0.176091259055681,
      3 -> 0.124938736608300, 9 -> 0.045757490560675)
    val expected = Seq((1, 3L), (2, 1L), (3, 1L), (9, 1L)).map { case (d, n) =>
      val obs = rnd(n.toDouble / 6.0, 4)
      (d, n, obs, rnd(e(d), 4), rnd(math.abs(obs - rnd(e(d), 4)), 4))
    }.toArray
    assert(rows === expected, rows.mkString(", "))
  }

  // ------------------------------------------------------------- q193

  test("q193 continuation counts equal the distinct-left-context brute force") {
    val texts = Seq(
      (1L, "the cat sat"), (2L, "a cat ran"), (3L, "my cat sat"),
      (4L, "san francisco san francisco san francisco"),
      (5L, "solo"))  // 1-token doc contributes no bigram
    val dir = writeDocs(texts.map { case (id, t) => (id, t, "en", "src0", 0L) })

    val bigrams = texts.flatMap { case (_, t) =>
      val tk = toks(t); if (tk.size < 2) Nil else tk.sliding(2).map(w => (w(0), w(1))).toSeq
    }
    val typeCounts = bigrams.groupBy(identity).map { case (bg, g) => (bg, g.size.toLong) }
    val nTypes = typeCounts.size.toLong
    val expected = typeCounts.toSeq.groupBy(_._1._2).map { case (nxt, g) =>
      (nxt, g.size.toLong, g.map(_._2).sum, rnd(g.size.toDouble / nTypes.toDouble, 6))
    }.toSeq.sortBy { case (nxt, cont, _, _) => (-cont, nxt) }.take(20).toArray

    val rows = SparkEntry.queries("q193_kn_continuation")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows === expected, rows.mkString(", "))
    // the KN signature: "cat" (3 distinct left contexts) outranks
    // "francisco" (1 context, higher raw frequency 3)
    val cat = rows.indexWhere(_._1 == "cat"); val fr = rows.indexWhere(_._1 == "francisco")
    assert(cat >= 0 && fr >= 0 && cat < fr, rows.mkString(", "))
    assert(rows(cat)._2 == 3L && rows(fr)._2 == 1L && rows(fr)._3 == 3L)
  }
}
