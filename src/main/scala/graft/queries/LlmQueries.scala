package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.{Dedup, Similarity, TextOps}

/** LLM-training-data pipeline operators (SURVEY.md §7 M7 north star):
  * dedup family, similarity search, text analysis — each exposed as a
  * named query over the `documents`/`embeddings` fixtures. SQL-expressible
  * ones carry a DuckDB oracle; hash-dependent ones (MinHash banding
  * internals, SimHash, SRP-LSH) get the driver's rows-only check plus
  * ScalaTest ground-truth specs.
  */
object LlmQueries {

  /** Shared normalization SQL fragments (must mirror TextOps.normalized —
    * note DuckDB regexp_replace needs the explicit 'g' flag); single
    * definitions in [[Fragments]], shared with Curation's capstone. */
  private val NormSql = Fragments.NormSql
  private val ToksSql = Fragments.ToksSql

  // ------------------------------------------------------------- dedup

  /** Exact dedup by content fingerprint (hash group-by; one shuffle). */
  val dedupExact: Q = (s, dir) =>
    Dedup.exact(Tables.t(s, dir, "documents")).orderBy("keep_id")

  val dedupExactSql: String =
    s"""SELECT md5($NormSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Per-document fingerprint (rolling-hash analog; md5 of normalized text). */
  val docFingerprint: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val docFingerprintSql: String =
    s"SELECT doc_id, md5($NormSql) AS fp FROM documents ORDER BY doc_id"

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified. The oracle is the
    * brute-force all-pairs truth: LSH at b=32,r=4 has ≈1-1e-7 recall at
    * j≥0.8, so candidate generation loses nothing on real corpora while
    * doing no O(n²) work. */
  val dedupMinhash: Q = (s, dir) =>
    Dedup.minhashLsh(Tables.t(s, dir, "documents")).orderBy("doc_a", "doc_b")

  /** Incremental near-dup: today's ingest (sources src15–src19 stand in
    * for the new batch) LSH-probed against the accumulated base corpus —
    * q110's exact incremental dedup relaxed to Jaccard ≥ 0.8, and the
    * batch twin of the streaming admission control
    * ([[graft.streaming.StreamOps.nearDupAlerts]]). The base is never
    * self-joined: candidates come from the batch-bands ⋈ base-bands
    * keyed join of (id, band, hash64) triples, so re-ingestion cost
    * scales with the batch, not the corpus. The oracle is the
    * brute-force batch×base truth (quadratic ACROSS the split only —
    * fine at the sf0.01 gate; sf0.1 re-verification rides
    * [[graft.TruthCheck]] like the other LSH rows). */
  val incrementalNearDup: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
    val isBatch = col("source").isin("src15", "src16", "src17", "src18", "src19")
    Dedup.minhashLshAgainst(docs.filter(!isBatch), docs.filter(isBatch))
      .orderBy("batch_id", "base_id")
  }

  val incrementalNearDupSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, source,
       |    list_distinct([array_to_string(toks[i:i+2], ' ')
       |           for i in range(1, len(toks)-1)]) AS shingles
       |  FROM (SELECT doc_id, source, $ToksSql AS toks FROM documents)
       |  WHERE len(toks) >= 3)
       |SELECT a.doc_id AS batch_id, b.doc_id AS base_id,
       |  round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
       |FROM sh a JOIN sh b
       |  ON a.source IN ('src15', 'src16', 'src17', 'src18', 'src19')
       | AND b.source NOT IN ('src15', 'src16', 'src17', 'src18', 'src19')
       |WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
       |ORDER BY batch_id, base_id""".stripMargin

  /** q177's incremental near-dup SERVED FROM THE INDEX SHAPE
    * ([[Dedup.minhashLshAgainstIndex]] over
    * [[graft.Compact.classIndexOf]]): the base side is the compacted
    * CLASS-LEVEL state — one stored band set + shingle set per content
    * class plus the slim (id, ck) membership sidecar, nothing
    * re-derived from base text, candidates generated at class scale.
    * Must produce exactly q177's answer (same oracle), which is the
    * cross-engine proof that the persisted-index serving path and the
    * from-scratch path cannot drift. */
  val indexedNearDup: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
    val isBatch = col("source").isin("src15", "src16", "src17", "src18", "src19")
    val (classes, members) = graft.Compact.classIndexOf(docs.filter(!isBatch))
    Dedup.minhashLshAgainstIndex(classes, members, docs.filter(isBatch))
      .orderBy("batch_id", "base_id")
  }

  val dedupMinhashSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
       |           for i in range(1, len(toks)-1)]) AS shingles
       |  FROM (SELECT doc_id, $ToksSql AS toks FROM documents)
       |  WHERE len(toks) >= 3)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact duplicated-substring spans ([[Dedup.duplicatedSpans]]): the
    * substring-granular complement to whole-document dedup — a 5-token
    * shingle occurring ≥2 times anywhere in the corpus marks its
    * positions duplicated, and overlapping/adjacent positions merge
    * into maximal per-document spans (Lee et al. ACL '22, expressed
    * relationally: linear positional-shingle explode → map-combinable
    * hash count → hash-keyed rejoin → per-doc sweep-line window). The
    * oracle replays the identical pipeline — positions, islands, span
    * arithmetic — so the hash-compare covers every stage. */
  val dupSpans: Q = (s, dir) =>
    Dedup.duplicatedSpans(Tables.t(s, dir, "documents")).orderBy("doc_id")

  val dupSpansSql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |pos AS (
       |  SELECT doc_id, n_tokens, i AS p,
       |    md5(array_to_string(toks[i:i+4], ' ')) AS h
       |  FROM (SELECT doc_id, len(toks) AS n_tokens, toks,
       |          unnest(range(1, len(toks) - 3)) AS i
       |        FROM t WHERE len(toks) >= 5)),
       |dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT pos.* FROM pos JOIN dup USING (h)),
       |m AS (
       |  SELECT doc_id, n_tokens, p,
       |    max(p + 4) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS me
       |  FROM dp),
       |isl AS (
       |  SELECT doc_id, n_tokens, p,
       |    sum(CASE WHEN me IS NULL OR p > me + 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |  FROM m),
       |sp AS (
       |  SELECT doc_id, n_tokens, isl, min(p) AS s, max(p) + 4 AS e
       |  FROM isl GROUP BY 1, 2, 3)
       |SELECT doc_id, count(*)::INTEGER AS n_spans,
       |  sum(e - s + 1)::BIGINT AS dup_tokens,
       |  max(e - s + 1)::INTEGER AS max_span,
       |  round(sum(e - s + 1)::DOUBLE / n_tokens, 4) AS dup_frac
       |FROM sp GROUP BY doc_id, n_tokens
       |ORDER BY doc_id""".stripMargin

  /** Per-document n-gram novelty ([[Dedup.shingleNovelty]]): the
    * boilerplate-density score dual to q182's span extraction — the
    * fraction of a doc's 5-gram shingles that are corpus-unique, with
    * the `flagged` drop gate decided by integer arithmetic. The oracle
    * replays the same pre-aggregated construction (per-(doc, shingle)
    * counts → corpus totals → per-doc rollup), so the hash-compare
    * covers every stage including the rounding. */
  val ngramNovelty: Q = (s, dir) =>
    Dedup.shingleNovelty(Tables.t(s, dir, "documents")).orderBy("doc_id")

  val ngramNoveltySql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |pos AS (
       |  SELECT doc_id, md5(array_to_string(toks[i:i+4], ' ')) AS h
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
       |        FROM t WHERE len(toks) >= 5)),
       |dh AS (SELECT doc_id, h, count(*) AS c FROM pos GROUP BY 1, 2),
       |tot AS (SELECT h, sum(c) AS tot FROM dh GROUP BY 1)
       |SELECT d.doc_id, sum(c)::BIGINT AS n_shingles,
       |  sum(CASE WHEN tot >= 2 THEN c ELSE 0 END)::BIGINT AS n_dup,
       |  round((sum(c) - sum(CASE WHEN tot >= 2 THEN c ELSE 0 END))::DOUBLE
       |        / sum(c), 4) AS novelty,
       |  ((sum(c) - sum(CASE WHEN tot >= 2 THEN c ELSE 0 END)) * 2 < sum(c))
       |    AS flagged
       |FROM dh d JOIN tot USING (h) GROUP BY 1 ORDER BY 1""".stripMargin

  /** SimHash near-dup pairs (Hamming ≤ 3 via 4×16-bit block LSH), with
    * the MD5-based token hash so the oracle can replay the fingerprint
    * bit-for-bit. The block LSH is pigeonhole-complete for Hamming ≤ 3,
    * so the output provably equals the oracle's all-pairs computation —
    * at any scale, with no O(n²) work on the Spark side. */
  val dedupSimhash: Q = (s, dir) =>
    Dedup.simhashPairs(Tables.t(s, dir, "documents"), tokenHash = "md5")
      .orderBy("doc_a", "doc_b")

  val dedupSimhashSql: String =
    s"""WITH th AS (
       |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
       |  FROM (SELECT doc_id, unnest($ToksSql) AS tok FROM documents)),
       |bits AS (
       |  SELECT doc_id, k.k,
       |    sum(CASE WHEN (h >> k.k) & 1 = 1 THEN 1 ELSE -1 END) AS w
       |  FROM th CROSS JOIN (SELECT unnest(range(64)) AS k) k
       |  GROUP BY doc_id, k.k),
       |fp AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN w >= 0 AND k < 32 THEN (1::BIGINT << k) ELSE 0 END)::BIGINT AS lo,
       |    sum(CASE WHEN w >= 0 AND k >= 32 THEN (1::BIGINT << (k - 32)) ELSE 0 END)::BIGINT AS hi
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INTEGER AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Duplicate clusters: MinHash-LSH pairs → connected components
    * (min-label propagation), on the exact-copy-COLLAPSED graph
    * ([[Dedup.minhashClusters]]): CC runs over representative-level
    * pairs and members inherit their representative's component, so a
    * copy-heavy corpus never materializes its copy-clique edge mass.
    * Oracle: recursive-CTE transitive closure over the brute-force
    * pair truth — the green row is the equivalence proof that the
    * collapsed clustering equals the uncollapsed one. */
  val dedupClusters: Q = (s, dir) =>
    Dedup.minhashClusters(Tables.t(s, dir, "documents"))
      .orderBy("doc_id")

  val dedupClustersSql: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
       |           for i in range(1, len(toks)-1)]) AS shingles
       |  FROM (SELECT doc_id, $ToksSql AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id)
       |SELECT id AS doc_id, min(r) AS cluster_id FROM reach
       |GROUP BY id ORDER BY doc_id""".stripMargin

  /** Duplicate clusters again, but by alternating large-star/small-star
    * ([[Dedup.connectedComponentsAlternating]], Kiveris et al. SoCC '14)
    * instead of min-label propagation: round count is independent of the
    * dup graph's diameter, so this is the safe default when chains of
    * near-dups may be long. Must return EXACTLY q56's answer — the
    * oracle is the identical recursive-CTE transitive closure, so the
    * driver independently proves the two algorithms agree with truth. */
  val dedupClustersAlt: Q = (s, dir) =>
    Dedup.minhashClusters(Tables.t(s, dir, "documents"), alternating = true)
      .orderBy("doc_id")

  /** Partial-duplicate pairs by ALIGNED fixed-size blocks: md5 of each
    * 64-char block of the normalized text; pairs sharing ≥ 2 block
    * fingerprints. The position-aligned little sibling of
    * [[Dedup.partialDupPairs]] (content-defined chunking, spec-tested):
    * weaker against insertions, but every step is plain SQL so the
    * oracle replays it exactly. Discovery is a fingerprint bucket join —
    * work proportional to sharing, never all-pairs. */
  val partialDupAligned: Q = (s, dir) =>
    Dedup.alignedBlockPairs(Tables.t(s, dir, "documents"))
      .orderBy("doc_a", "doc_b")

  val partialDupAlignedSql: String =
    s"""WITH nt AS (SELECT doc_id AS id, $NormSql AS s FROM documents),
       |blocks AS (
       |  SELECT id, md5(substr(s, 1 + k * 64, 64)) AS fp
       |  FROM (SELECT id, s, unnest(range(0, (length(s) + 63) // 64)) AS k FROM nt)
       |  WHERE length(substr(s, 1 + k * 64, 64)) = 64),
       |pairs AS (
       |  SELECT a.id AS doc_a, b.id AS doc_b,
       |         count(DISTINCT a.fp)::INTEGER AS shared_blocks
       |  FROM blocks a JOIN blocks b ON a.fp = b.fp AND a.id < b.id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared_blocks FROM pairs
       |WHERE shared_blocks >= 2 ORDER BY doc_a, doc_b""".stripMargin

  /** End-to-end corpus curation (the capstone pipeline): drop near-dup
    * non-canonical docs (MinHash-LSH → connected components, keep
    * cluster representative), keep English docs above a quality
    * threshold — the selection query a training-data pipeline actually
    * runs. Every stage is individually oracle-proven (q32/q56/q38/q39);
    * this composes them under one oracle. */
  val corpusFilter: Q = (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
    val clusters = Dedup.minhashClusters(docs)
    val drops = clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    docs.join(drops, Seq("doc_id"), "left_anti")
      .filter(TextOps.langId(col("text")) === "en")
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .select("doc_id", "quality")
      .orderBy("doc_id")
  }

  val corpusFilterSql: String = {
    def hits(lst: Seq[String]) =
      s"len(list_filter($ToksSql, t -> list_contains(${lst.mkString("['", "', '", "']")}, t)))"
    val en = hits(TextOps.StopEn); val de = hits(TextOps.StopDe)
    val fr = hits(TextOps.StopFr); val es = hits(TextOps.StopEs)
    val quality = Fragments.qualitySql
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
       |           for i in range(1, len(toks)-1)]) AS shingles
       |  FROM (SELECT doc_id, $ToksSql AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
       |drops AS (
       |  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> min(r))
       |SELECT doc_id, $quality AS quality FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
       |  AND NOT regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
       |  AND $en >= $de AND $en >= $fr AND $en >= $es
       |  AND $quality >= 0.5
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------- similarity

  /** Exact ANN baseline: top-5 cosine neighbors of the first 10 vectors
    * (broadcast queries, corpus scanned once). */
  val annTopK: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .orderBy("query_id", "rk")
  }

  val annTopKSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         round(list_cosine_similarity(qv, cv), 4) AS sim
      |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |    (row_number() OVER (PARTITION BY query_id
      |                        ORDER BY sim DESC, neighbor_id ASC))::INTEGER AS rk
      |  FROM scored)
      |SELECT query_id, neighbor_id, sim, rk FROM ranked
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** Embedding-cosine near-dup with label blocking: exact within blocks —
    * the blocked-exact complement to the SRP-LSH path below. */
  val embNearDup: Q = (s, dir) => {
    val e = Tables.t(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("id_a"), col("label"),
      col("embedding").cast("array<double>").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("label"),
      col("embedding").cast("array<double>").as("v_b"))
    a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        round(Similarity.cosine(col("v_a"), col("v_b")), 4).as("sim"))
      .filter(col("sim") >= 0.4)
      .orderBy("id_a", "id_b")
  }

  val embNearDupSql: String =
    """SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  /** SemDeDup semantic dedup over the embedding corpus
    * ([[Similarity.semDedupClusters]]): nearest-centroid cells →
    * exact within-cell cosine pairs → alternating-CC clusters → keep
    * the min-id representative. The oracle replays the identical
    * pipeline (the q50 cell-assignment arithmetic + a recursive-CTE
    * closure), so cell boundaries, pair sets, and cluster labels are
    * all hash-compared. Quadratic only within cells — the oracle joins
    * the q32/q56-style exclusion list past sf0.01, while the Spark side
    * stays bounded by Σ|cell|². */
  val semDedup: Q = (s, dir) =>
    // nlist PINNED at the fixture's 16: this oracle replays exactly that
    // first-16 model; the operator's default is the corpus-derived
    // autoNlist (IVF discipline) for naive production callers
    Similarity.semDedupClusters(Tables.t(s, dir, "embeddings"), nlist = 16)
      .orderBy("vec_id")

  val semDedupSql: String =
    """WITH RECURSIVE v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (SELECT id AS cell, v AS cv FROM v
      |         WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
      |assigned AS (
      |  SELECT id, v, cell FROM (
      |    SELECT v.id, v.v, c.cell,
      |      row_number() OVER (PARTITION BY v.id
      |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC, c.cell ASC) AS ark
      |    FROM v CROSS JOIN cent c) WHERE ark = 1),
      |pairs AS (
      |  SELECT a.id AS da, b.id AS db
      |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
      |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4),
      |edges AS (SELECT da AS x, db AS y FROM pairs
      |          UNION SELECT db, da FROM pairs),
      |reach(id, r) AS (
      |  SELECT x, x FROM edges
      |  UNION
      |  SELECT e.x, reach.r FROM edges e JOIN reach ON e.y = reach.id),
      |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
      |SELECT v.id AS vec_id, coalesce(lab.cluster_id, v.id) AS cluster_id,
      |  coalesce(lab.cluster_id, v.id) = v.id AS keep
      |FROM v LEFT JOIN lab ON v.id = lab.id
      |ORDER BY vec_id""".stripMargin

  /** Semantic decontamination ([[Similarity.contaminatedBy]]): corpus
    * vectors (vec_id ≥ 50) cosine-close to any held-out eval vector
    * (vec_id < 50) — the paraphrase-leakage complement of q87's
    * verbatim n-gram decontamination. IVF shape: map-side cell
    * assignment, eval set probes 4 cells, cell-keyed scoring join; the
    * oracle replays assignment, probing, scoring, and the best-witness
    * window bit-for-bit (q50's construction with a threshold replacing
    * top-k). */
  val semanticDecontam: Q = (s, dir) => {
    val e = Tables.t(s, dir, "embeddings")
    Similarity.contaminatedBy(e.filter(col("vec_id") < 50),
        e.filter(col("vec_id") >= 50), threshold = 0.35)
      .orderBy("vec_id")
  }

  val semanticDecontamSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
      |           FROM embeddings WHERE vec_id >= 50),
      |cent AS (SELECT id AS cell, v AS cv FROM v
      |         WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
      |assigned AS (
      |  SELECT id, v, cell FROM (
      |    SELECT v.id, v.v, c.cell,
      |      row_number() OVER (PARTITION BY v.id
      |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC, c.cell ASC) AS ark
      |    FROM v CROSS JOIN cent c) WHERE ark = 1),
      |q AS (SELECT vec_id AS test_id, embedding::DOUBLE[] AS qv
      |      FROM embeddings WHERE vec_id < 50),
      |probes AS (
      |  SELECT test_id, qv, cell FROM (
      |    SELECT q.test_id, q.qv, c.cell,
      |      row_number() OVER (PARTITION BY q.test_id
      |        ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cell ASC) AS crk
      |    FROM q CROSS JOIN cent c) WHERE crk <= 4),
      |scored AS (
      |  SELECT a.id, p.test_id,
      |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE round(list_cosine_similarity(p.qv, a.v), 4) >= 0.35),
      |best AS (
      |  SELECT id, test_id, sim,
      |    row_number() OVER (PARTITION BY id ORDER BY sim DESC, test_id ASC) AS rk
      |  FROM scored)
      |SELECT id AS vec_id, test_id, sim FROM best WHERE rk = 1
      |ORDER BY vec_id""".stripMargin

  /** SRP-LSH bucketed approximate near-neighbor pairs (the O(n·bucket)
    * scale path), with explicit first-32-vector hyperplanes so the
    * bucketing arithmetic — and therefore the whole candidate set — is
    * replayable in plain SQL: the oracle runs the same LSH, not a
    * brute-force stand-in, so the hash-compare covers bucketing,
    * candidate generation, and exact-cosine verification end to end.
    * (The hash-derived-plane variant stays as [[Similarity.lshBucketedPairs]],
    * spec-covered in LlmOpsSpec.) */
  val annLsh: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.planeSrpPairs(emb, Similarity.firstNPlanes(emb, 32),
        bits = 8, threshold = 0.3)
      .orderBy("id_a", "id_b")
  }

  val annLshSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |planes AS (
      |  SELECT (row_number() OVER (ORDER BY id) - 1)::INTEGER AS pid, v AS pv
      |  FROM (SELECT id, v FROM v ORDER BY id LIMIT 32)),
      |bucketed AS (
      |  SELECT v.id, (p.pid // 8)::INTEGER AS tab,
      |    sum(CASE WHEN list_dot_product(v.v, p.pv) >= 0
      |             THEN (1::BIGINT << (p.pid % 8)) ELSE 0 END)::BIGINT AS bucket
      |  FROM v CROSS JOIN planes p
      |  GROUP BY v.id, p.pid // 8),
      |cand AS (
      |  SELECT a.id AS id_a, b.id AS id_b
      |  FROM bucketed a JOIN bucketed b
      |    ON a.tab = b.tab AND a.bucket = b.bucket AND a.id < b.id
      |  GROUP BY 1, 2)
      |SELECT c.id_a, c.id_b,
      |  round(list_cosine_similarity(va.v, vb.v), 4) AS sim
      |FROM cand c JOIN v va ON va.id = c.id_a JOIN v vb ON vb.id = c.id_b
      |WHERE round(list_cosine_similarity(va.v, vb.v), 4) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  /** q36's SRP pairs under the QUANTIZE-THEN-COLLAPSE pre-pass
    * ([[Similarity.planeSrpPairsQuantized]]): coordinates snap to the
    * 1/100 grid, exact grid-copies collapse to one representative
    * before bucketing, and pairs expand back through the grid cells —
    * the designed answer to the sf10 embedding wall, where perturbed
    * copies gave the dedup-style collapse nothing exact to merge. The
    * oracle replays the WHOLE pipeline — grid snap, cell collapse,
    * explicit-plane bucketing over quantized representatives,
    * quantized-cosine verification, membership expansion — so the
    * hash-compare pins the collapse algebra, not just the output
    * shape; the ±ε(h) recall band vs RAW cosine is the documented,
    * spec-tested contract (LlmOpsSpec). */
  val annLshQuantized: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.planeSrpPairsQuantized(emb,
        Similarity.firstNQuantizedPlanes(emb, 32), bits = 8, threshold = 0.3)
      .orderBy("id_a", "id_b")
  }

  val annLshQuantizedSql: String =
    """WITH raw AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |g AS (SELECT id, [round(x * 100)::BIGINT for x in v] AS gv FROM raw),
      |q AS (
      |  SELECT id, gv, [x / 100.0 for x in gv] AS qv FROM g
      |  WHERE len(list_filter(gv, x -> x <> 0)) > 0),
      |reps AS (SELECT min(id) AS rid, gv, count(*) AS grp_n FROM q GROUP BY gv),
      |rv AS (SELECT rid AS id, [x / 100.0 for x in gv] AS qv, grp_n FROM reps),
      |members AS (SELECT q.id, r.rid AS rep FROM q JOIN reps r ON q.gv = r.gv),
      |planes AS (
      |  SELECT (row_number() OVER (ORDER BY id) - 1)::INTEGER AS pid, qv AS pv
      |  FROM (SELECT id, qv FROM q ORDER BY id LIMIT 32)),
      |bucketed AS (
      |  SELECT rv.id, (p.pid // 8)::INTEGER AS tab,
      |    sum(CASE WHEN list_dot_product(rv.qv, p.pv) >= 0
      |             THEN (1::BIGINT << (p.pid % 8)) ELSE 0 END)::BIGINT AS bucket
      |  FROM rv CROSS JOIN planes p
      |  GROUP BY rv.id, p.pid // 8),
      |cand AS (
      |  SELECT a.id AS ra, b.id AS rb
      |  FROM bucketed a JOIN bucketed b
      |    ON a.tab = b.tab AND a.bucket = b.bucket AND a.id < b.id
      |  GROUP BY 1, 2),
      |rp AS (
      |  SELECT c.ra, c.rb,
      |    round(list_cosine_similarity(va.qv, vb.qv), 4) AS sim
      |  FROM cand c JOIN rv va ON va.id = c.ra JOIN rv vb ON vb.id = c.rb
      |  WHERE round(list_cosine_similarity(va.qv, vb.qv), 4) >= 0.3),
      |allp AS (
      |  SELECT ra, rb, sim FROM rp
      |  UNION ALL
      |  SELECT rid, rid, 1.0::DOUBLE FROM reps WHERE grp_n > 1)
      |SELECT least(ma.id, mb.id) AS id_a, greatest(ma.id, mb.id) AS id_b, p.sim
      |FROM allp p
      |JOIN members ma ON ma.rep = p.ra
      |JOIN members mb ON mb.rep = p.rb
      |WHERE p.ra <> p.rb OR ma.id < mb.id
      |ORDER BY id_a, id_b""".stripMargin

  /** Tolerant SRP near-dup pairs ([[Similarity.srpTolerantPairs]]):
    * the round-13 answer to COHERENT embedding drift — exact-vector
    * cells, SRP-signature classes, radius-bounded min-id leader
    * groups, and Lipschitz-interval classification of whole group
    * pairs (rep-attributed above the band, member-exact inside it,
    * provably-empty drops below). The oracle replays the ENTIRE
    * pipeline — cell collapse, plane signatures, the set-functional
    * leader rule, measured radii, the group-level bucket join, the
    * three-way classification, and both expansions — so the
    * hash-compare pins the collapse algebra and the band logic, not
    * just output shape. Round 14: `bits = 0` — the AUTO width rule
    * ([[Similarity.autoSrpBits]]: smallest plane-count divisor whose
    * bucket space covers the distinct-cell count with 2 bits of
    * slack), and the oracle's `bsel` CTE replays the rule in the same
    * pure integer arithmetic off the same `count(*)`, so the
    * hash-compare now pins the DEPLOYMENT RULE too — a drifted-width
    * disagreement between the engines fails the row. */
  val annLshTolerant: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.srpTolerantPairs(emb,
        Similarity.firstNPlanes(emb, 32), bits = 0, threshold = 0.3)
      .orderBy("id_a", "id_b", "sim")
  }

  val annLshTolerantSql: String =
    """WITH raw AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |nz AS (SELECT id, v FROM raw WHERE len(list_filter(v, x -> x <> 0)) > 0),
      |cells AS (SELECT min(id) AS eid, v, count(*) AS ex_n FROM nz GROUP BY v),
      |cmem AS (SELECT nz.id, c.eid AS rep FROM nz JOIN cells c ON nz.v = c.v),
      |planes AS (
      |  SELECT (row_number() OVER (ORDER BY id) - 1)::INTEGER AS pid, v AS pv
      |  FROM (SELECT id, v FROM raw ORDER BY id LIMIT 32)),
      |bsel AS (
      |  SELECT coalesce(min(b), 16)::INTEGER AS bits
      |  FROM range(1, 17) t(b), (SELECT count(*)::BIGINT AS n FROM cells) c
      |  WHERE 32 % b = 0 AND b >= 4 AND (1::BIGINT << (b + 4)) >= c.n),
      |sigs AS (
      |  SELECT c.eid AS id, (p.pid // s.bits)::INTEGER AS tab,
      |    sum(CASE WHEN list_dot_product(c.v, p.pv) >= 0
      |             THEN (1::BIGINT << (p.pid % s.bits)) ELSE 0 END)::BIGINT AS bucket
      |  FROM cells c CROSS JOIN planes p CROSS JOIN bsel s
      |  GROUP BY c.eid, p.pid // s.bits),
      |sigv AS (SELECT id, list(bucket ORDER BY tab) AS sig FROM sigs GROUP BY id),
      |cpair AS (
      |  SELECT a.id AS ia, b.id AS ib,
      |    list_cosine_similarity(va.v, vb.v) AS cosr,
      |    round(list_cosine_similarity(va.v, vb.v), 6) AS cos6
      |  FROM sigv a JOIN sigv b ON a.sig = b.sig AND a.id < b.id
      |  JOIN cells va ON va.eid = a.id JOIN cells vb ON vb.eid = b.id),
      |withinc AS (SELECT ia AS ea, ib AS eb, round(cosr, 4) AS sim
      |            FROM cpair WHERE round(cosr, 4) >= 0.3),
      |adm AS (SELECT ia, ib FROM cpair WHERE cos6 >= 0.995),
      |nbmin AS (
      |  SELECT id, min(nb) AS min_nb FROM (
      |    SELECT ia AS id, ib AS nb FROM adm
      |    UNION ALL SELECT ib, ia FROM adm) GROUP BY id),
      |assign AS (
      |  SELECT c.eid AS id, c.ex_n,
      |    least(c.eid, coalesce(n.min_nb, c.eid)) AS leader
      |  FROM cells c LEFT JOIN nbmin n ON n.id = c.eid),
      |mcos AS (
      |  SELECT a.leader, p.cos6 FROM assign a JOIN cpair p
      |    ON least(a.id, a.leader) = p.ia AND greatest(a.id, a.leader) = p.ib
      |  WHERE a.id <> a.leader),
      |grp AS (SELECT leader, sum(ex_n) AS pop, list(id) AS mem
      |        FROM assign GROUP BY leader),
      |grps AS (
      |  SELECT g.leader, g.pop, g.mem,
      |    sqrt(greatest(0, 2 - 2 * coalesce(m.min_cos, 1))) AS radius,
      |    s.sig, c.v AS lv
      |  FROM grp g
      |  LEFT JOIN (SELECT leader, min(cos6) AS min_cos FROM mcos GROUP BY leader) m
      |    ON m.leader = g.leader
      |  JOIN sigv s ON s.id = g.leader
      |  JOIN cells c ON c.eid = g.leader),
      |gb AS (
      |  SELECT leader, t.tab, sig[t.tab + 1] AS bucket
      |  FROM grps CROSS JOIN bsel s
      |  CROSS JOIN (SELECT unnest(range(32)) AS tab) t
      |  WHERE t.tab < 32 // s.bits),
      |cand AS (
      |  SELECT DISTINCT a.leader AS la, b.leader AS lb
      |  FROM gb a JOIN gb b
      |    ON a.tab = b.tab AND a.bucket = b.bucket AND a.leader < b.leader),
      |cls AS (
      |  SELECT c.la, c.lb, ga.mem AS mem_a, g2.mem AS mem_b,
      |    list_cosine_similarity(ga.lv, g2.lv) AS ccr,
      |    round(list_cosine_similarity(ga.lv, g2.lv), 6) AS cc,
      |    ga.radius + g2.radius + ga.radius * g2.radius AS delta
      |  FROM cand c
      |  JOIN grps ga ON ga.leader = c.la
      |  JOIN grps g2 ON g2.leader = c.lb
      |  WHERE ga.sig <> g2.sig),
      |above0 AS (SELECT unnest(mem_a) AS ea, mem_b, round(ccr, 4) AS sim
      |           FROM cls WHERE cc - delta >= 0.3),
      |above AS (SELECT ea, unnest(mem_b) AS eb, sim FROM above0),
      |band0 AS (SELECT unnest(mem_a) AS ea, mem_b FROM cls
      |          WHERE cc - delta < 0.3 AND cc + delta >= 0.3 - 0.00005),
      |band1 AS (SELECT ea, unnest(mem_b) AS eb FROM band0),
      |band AS (
      |  SELECT b.ea, b.eb,
      |    round(list_cosine_similarity(va.v, vb.v), 4) AS sim
      |  FROM band1 b JOIN cells va ON va.eid = b.ea JOIN cells vb ON vb.eid = b.eb
      |  WHERE round(list_cosine_similarity(va.v, vb.v), 4) >= 0.3),
      |allex AS (
      |  SELECT least(ea, eb) AS ra, greatest(ea, eb) AS rb, sim FROM withinc
      |  UNION ALL SELECT least(ea, eb), greatest(ea, eb), sim FROM above
      |  UNION ALL SELECT least(ea, eb), greatest(ea, eb), sim FROM band
      |  UNION ALL SELECT eid, eid, 1.0::DOUBLE FROM cells WHERE ex_n > 1)
      |SELECT least(ma.id, mb.id) AS id_a, greatest(ma.id, mb.id) AS id_b, p.sim
      |FROM allex p
      |JOIN cmem ma ON ma.rep = p.ra
      |JOIN cmem mb ON mb.rep = p.rb
      |WHERE p.ra <> p.rb OR ma.id < mb.id
      |ORDER BY id_a, id_b, sim""".stripMargin

  /** Incremental cross-corpus tolerant SRP
    * ([[Similarity.srpTolerantPairsAgainst]]): the drifted-embedding
    * analog of q177 — batch (vec_id % 5 = 0) against base (the rest),
    * collapsed per (signature class, side), candidates from the
    * cross-side leader bucket join, ball-bound classification with the
    * razor-edged band. The oracle replays BOTH sides' full pipelines —
    * per-side cells, the auto width rule off the summed cell count,
    * per-side leader assignment and radii, the cross-only candidate
    * join, the three-way classification, and the two-sided expansion —
    * so the hash-compare pins the per-side collapse algebra and the
    * side discipline (base never self-joins), not just output shape. */
  val annLshTolerantCross: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.srpTolerantPairsAgainst(
        emb.filter(col("vec_id") % 5 =!= 0),
        emb.filter(col("vec_id") % 5 === 0),
        Similarity.firstNPlanes(emb, 32), bits = 0, threshold = 0.3)
      .orderBy("batch_id", "base_id", "sim")
  }

  val annLshTolerantCrossSql: String =
    """WITH raw AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |nzu AS (SELECT id, v, (id % 5 = 0) AS isb FROM raw
      |        WHERE len(list_filter(v, x -> x <> 0)) > 0),
      |cells AS (SELECT isb, min(id) AS eid, v, count(*) AS ex_n
      |          FROM nzu GROUP BY isb, v),
      |cmem AS (SELECT n.id, c.eid AS rep, n.isb
      |         FROM nzu n JOIN cells c ON n.v = c.v AND n.isb = c.isb),
      |planes AS (
      |  SELECT (row_number() OVER (ORDER BY id) - 1)::INTEGER AS pid, v AS pv
      |  FROM (SELECT id, v FROM raw ORDER BY id LIMIT 32)),
      |bsel AS (
      |  SELECT coalesce(min(b), 16)::INTEGER AS bits
      |  FROM range(1, 17) t(b), (SELECT count(*)::BIGINT AS n FROM cells) c
      |  WHERE 32 % b = 0 AND b >= 4 AND (1::BIGINT << (b + 4)) >= c.n),
      |sigs AS (
      |  SELECT c.isb, c.eid AS id, (p.pid // s.bits)::INTEGER AS tab,
      |    sum(CASE WHEN list_dot_product(c.v, p.pv) >= 0
      |             THEN (1::BIGINT << (p.pid % s.bits)) ELSE 0 END)::BIGINT AS bucket
      |  FROM cells c CROSS JOIN planes p CROSS JOIN bsel s
      |  GROUP BY c.isb, c.eid, p.pid // s.bits),
      |sigv AS (SELECT isb, id, list(bucket ORDER BY tab) AS sig
      |         FROM sigs GROUP BY isb, id),
      |cpair AS (
      |  SELECT a.isb, a.id AS ia, b.id AS ib,
      |    round(list_cosine_similarity(va.v, vb.v), 6) AS cos6
      |  FROM sigv a JOIN sigv b ON a.sig = b.sig AND a.isb = b.isb AND a.id < b.id
      |  JOIN cells va ON va.eid = a.id JOIN cells vb ON vb.eid = b.id),
      |adm AS (SELECT isb, ia, ib FROM cpair WHERE cos6 >= 0.995),
      |nbmin AS (
      |  SELECT isb, id, min(nb) AS min_nb FROM (
      |    SELECT isb, ia AS id, ib AS nb FROM adm
      |    UNION ALL SELECT isb, ib, ia FROM adm) GROUP BY isb, id),
      |assign AS (
      |  SELECT c.isb, c.eid AS id, c.ex_n,
      |    least(c.eid, coalesce(n.min_nb, c.eid)) AS leader
      |  FROM cells c LEFT JOIN nbmin n ON n.id = c.eid AND n.isb = c.isb),
      |mcos AS (
      |  SELECT a.isb, a.leader, p.cos6 FROM assign a JOIN cpair p
      |    ON least(a.id, a.leader) = p.ia AND greatest(a.id, a.leader) = p.ib
      |  WHERE a.id <> a.leader),
      |grp AS (SELECT isb, leader, sum(ex_n) AS pop, list(id) AS mem
      |        FROM assign GROUP BY isb, leader),
      |grps AS (
      |  SELECT g.isb, g.leader, g.pop, g.mem,
      |    sqrt(greatest(0, 2 - 2 * coalesce(m.min_cos, 1))) AS radius,
      |    s.sig, c.v AS lv
      |  FROM grp g
      |  LEFT JOIN (SELECT isb, leader, min(cos6) AS min_cos
      |             FROM mcos GROUP BY isb, leader) m
      |    ON m.leader = g.leader AND m.isb = g.isb
      |  JOIN sigv s ON s.id = g.leader
      |  JOIN cells c ON c.eid = g.leader),
      |gb AS (
      |  SELECT isb, leader, t.tab, sig[t.tab + 1] AS bucket
      |  FROM grps CROSS JOIN bsel s
      |  CROSS JOIN (SELECT unnest(range(32)) AS tab) t
      |  WHERE t.tab < 32 // s.bits),
      |cand AS (
      |  SELECT DISTINCT a.leader AS la, b.leader AS lb
      |  FROM gb a JOIN gb b ON a.tab = b.tab AND a.bucket = b.bucket
      |  WHERE a.isb AND NOT b.isb),
      |cls AS (
      |  SELECT c.la, c.lb, ga.mem AS mem_a, g2.mem AS mem_b,
      |    list_cosine_similarity(ga.lv, g2.lv) AS ccr,
      |    round(list_cosine_similarity(ga.lv, g2.lv), 6) AS cc,
      |    ga.radius + g2.radius + ga.radius * g2.radius AS delta
      |  FROM cand c
      |  JOIN grps ga ON ga.leader = c.la
      |  JOIN grps g2 ON g2.leader = c.lb),
      |above0 AS (SELECT unnest(mem_a) AS ea, mem_b, round(ccr, 4) AS sim
      |           FROM cls WHERE cc - delta >= 0.3),
      |above AS (SELECT ea, unnest(mem_b) AS eb, sim FROM above0),
      |band0 AS (SELECT unnest(mem_a) AS ea, mem_b FROM cls
      |          WHERE cc - delta < 0.3 AND cc + delta >= 0.3 - 0.00005),
      |band1 AS (SELECT ea, unnest(mem_b) AS eb FROM band0),
      |band AS (
      |  SELECT b.ea, b.eb,
      |    round(list_cosine_similarity(va.v, vb.v), 4) AS sim
      |  FROM band1 b JOIN cells va ON va.eid = b.ea JOIN cells vb ON vb.eid = b.eb
      |  WHERE round(list_cosine_similarity(va.v, vb.v), 4) >= 0.3),
      |allex AS (SELECT ea, eb, sim FROM above
      |          UNION ALL SELECT ea, eb, sim FROM band)
      |SELECT ma.id AS batch_id, mb.id AS base_id, p.sim
      |FROM allex p
      |JOIN cmem ma ON ma.rep = p.ea
      |JOIN cmem mb ON mb.rep = p.eb
      |ORDER BY batch_id, base_id, sim""".stripMargin

  /** q306's answer served from the PERSISTED-STATE shape
    * ([[Similarity.srpTolerantServe]] over
    * [[Similarity.tolerantStateOf]]) — the q209 analog for drifted
    * embeddings: the base side is the three-tier tolerant state
    * (groups / exemplars / members), nothing re-collapses or re-signs
    * base vectors at serve time, and the batch collapses alone AT THE
    * STATE'S WIDTH. Two deployment rules differ from q306 and the
    * oracle replays both: the SRP planes and the auto width are pure
    * functions of the BASE corpus (a state is built before future
    * batches exist), so `planes` ranks base ids only and `bsel` counts
    * base-side cells only. [[graft.TolerantCompact]] persists exactly
    * this derivation; TolerantCompactSpec pins disk == in-memory, so
    * this oracle covers the disk path too. */
  val annLshTolerantIndexed: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val planes = Similarity.firstNPlanes(base, 32)
    val state = Similarity.tolerantStateOf(base, planes)
    Similarity.srpTolerantServe(state, batch, planes, threshold = 0.3)
      .orderBy("batch_id", "base_id", "sim")
  }

  val annLshTolerantIndexedSql: String =
    """WITH raw AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |nzu AS (SELECT id, v, (id % 5 = 0) AS isb FROM raw
      |        WHERE len(list_filter(v, x -> x <> 0)) > 0),
      |cells AS (SELECT isb, min(id) AS eid, v, count(*) AS ex_n
      |          FROM nzu GROUP BY isb, v),
      |cmem AS (SELECT n.id, c.eid AS rep, n.isb
      |         FROM nzu n JOIN cells c ON n.v = c.v AND n.isb = c.isb),
      |planes AS (
      |  SELECT (row_number() OVER (ORDER BY id) - 1)::INTEGER AS pid, v AS pv
      |  FROM (SELECT id, v FROM raw WHERE id % 5 <> 0 ORDER BY id LIMIT 32)),
      |bsel AS (
      |  SELECT coalesce(min(b), 16)::INTEGER AS bits
      |  FROM range(1, 17) t(b),
      |    (SELECT count(*)::BIGINT AS n FROM cells WHERE NOT isb) c
      |  WHERE 32 % b = 0 AND b >= 4 AND (1::BIGINT << (b + 4)) >= c.n),
      |sigs AS (
      |  SELECT c.isb, c.eid AS id, (p.pid // s.bits)::INTEGER AS tab,
      |    sum(CASE WHEN list_dot_product(c.v, p.pv) >= 0
      |             THEN (1::BIGINT << (p.pid % s.bits)) ELSE 0 END)::BIGINT AS bucket
      |  FROM cells c CROSS JOIN planes p CROSS JOIN bsel s
      |  GROUP BY c.isb, c.eid, p.pid // s.bits),
      |sigv AS (SELECT isb, id, list(bucket ORDER BY tab) AS sig
      |         FROM sigs GROUP BY isb, id),
      |cpair AS (
      |  SELECT a.isb, a.id AS ia, b.id AS ib,
      |    round(list_cosine_similarity(va.v, vb.v), 6) AS cos6
      |  FROM sigv a JOIN sigv b ON a.sig = b.sig AND a.isb = b.isb AND a.id < b.id
      |  JOIN cells va ON va.eid = a.id JOIN cells vb ON vb.eid = b.id),
      |adm AS (SELECT isb, ia, ib FROM cpair WHERE cos6 >= 0.995),
      |nbmin AS (
      |  SELECT isb, id, min(nb) AS min_nb FROM (
      |    SELECT isb, ia AS id, ib AS nb FROM adm
      |    UNION ALL SELECT isb, ib, ia FROM adm) GROUP BY isb, id),
      |assign AS (
      |  SELECT c.isb, c.eid AS id, c.ex_n,
      |    least(c.eid, coalesce(n.min_nb, c.eid)) AS leader
      |  FROM cells c LEFT JOIN nbmin n ON n.id = c.eid AND n.isb = c.isb),
      |mcos AS (
      |  SELECT a.isb, a.leader, p.cos6 FROM assign a JOIN cpair p
      |    ON least(a.id, a.leader) = p.ia AND greatest(a.id, a.leader) = p.ib
      |  WHERE a.id <> a.leader),
      |grp AS (SELECT isb, leader, sum(ex_n) AS pop, list(id) AS mem
      |        FROM assign GROUP BY isb, leader),
      |grps AS (
      |  SELECT g.isb, g.leader, g.pop, g.mem,
      |    sqrt(greatest(0, 2 - 2 * coalesce(m.min_cos, 1))) AS radius,
      |    s.sig, c.v AS lv
      |  FROM grp g
      |  LEFT JOIN (SELECT isb, leader, min(cos6) AS min_cos
      |             FROM mcos GROUP BY isb, leader) m
      |    ON m.leader = g.leader AND m.isb = g.isb
      |  JOIN sigv s ON s.id = g.leader
      |  JOIN cells c ON c.eid = g.leader),
      |gb AS (
      |  SELECT isb, leader, t.tab, sig[t.tab + 1] AS bucket
      |  FROM grps CROSS JOIN bsel s
      |  CROSS JOIN (SELECT unnest(range(32)) AS tab) t
      |  WHERE t.tab < 32 // s.bits),
      |cand AS (
      |  SELECT DISTINCT a.leader AS la, b.leader AS lb
      |  FROM gb a JOIN gb b ON a.tab = b.tab AND a.bucket = b.bucket
      |  WHERE a.isb AND NOT b.isb),
      |cls AS (
      |  SELECT c.la, c.lb, ga.mem AS mem_a, g2.mem AS mem_b,
      |    list_cosine_similarity(ga.lv, g2.lv) AS ccr,
      |    round(list_cosine_similarity(ga.lv, g2.lv), 6) AS cc,
      |    ga.radius + g2.radius + ga.radius * g2.radius AS delta
      |  FROM cand c
      |  JOIN grps ga ON ga.leader = c.la
      |  JOIN grps g2 ON g2.leader = c.lb),
      |above0 AS (SELECT unnest(mem_a) AS ea, mem_b, round(ccr, 4) AS sim
      |           FROM cls WHERE cc - delta >= 0.3),
      |above AS (SELECT ea, unnest(mem_b) AS eb, sim FROM above0),
      |band0 AS (SELECT unnest(mem_a) AS ea, mem_b FROM cls
      |          WHERE cc - delta < 0.3 AND cc + delta >= 0.3 - 0.00005),
      |band1 AS (SELECT ea, unnest(mem_b) AS eb FROM band0),
      |band AS (
      |  SELECT b.ea, b.eb,
      |    round(list_cosine_similarity(va.v, vb.v), 4) AS sim
      |  FROM band1 b JOIN cells va ON va.eid = b.ea JOIN cells vb ON vb.eid = b.eb
      |  WHERE round(list_cosine_similarity(va.v, vb.v), 4) >= 0.3),
      |allex AS (SELECT ea, eb, sim FROM above
      |          UNION ALL SELECT ea, eb, sim FROM band)
      |SELECT ma.id AS batch_id, mb.id AS base_id, p.sim
      |FROM allex p
      |JOIN cmem ma ON ma.rep = p.ea
      |JOIN cmem mb ON mb.rep = p.eb
      |ORDER BY batch_id, base_id, sim""".stripMargin

  /** Dimension-truncation rerank cascade
    * ([[Similarity.truncRerankTopK]]): first-16-dim cosine prefilter to
    * 20 candidates per query (WindowGroupLimit map-side pruning), then
    * full 64-dim rerank to top-5 — the matryoshka serving pattern. The
    * oracle replays both stages including the 6-dp prefix cut and the
    * 4-dp full-similarity ranking. */
  val annTruncRerank: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.truncRerankTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .orderBy("query_id", "rk")
  }

  val annTruncRerankSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |      FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, v.id AS neighbor_id,
      |    round(list_cosine_similarity(q.qv[1:16], v.v[1:16]), 6) AS sim_prefix,
      |    q.qv, v.v
      |  FROM v CROSS JOIN q WHERE v.id <> q.query_id),
      |cand AS (
      |  SELECT query_id, neighbor_id, sim_prefix, qv, v,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY sim_prefix DESC, neighbor_id ASC) AS crk
      |  FROM scored),
      |reranked AS (
      |  SELECT query_id, neighbor_id, sim_prefix,
      |    round(list_cosine_similarity(qv, v), 4) AS sim
      |  FROM cand WHERE crk <= 20),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim_prefix, sim,
      |    (row_number() OVER (PARTITION BY query_id
      |       ORDER BY sim DESC, neighbor_id ASC))::INTEGER AS rk
      |  FROM reranked)
      |SELECT query_id, neighbor_id, sim_prefix, sim, rk FROM ranked
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** IVF approximate top-k (scale path for ANN; see Similarity.ivfTopK).
    * Deterministic first-N centroids + map-side assignment make the whole
    * index-build-and-probe pipeline oracle-replayable in SQL. */
  val annIvf: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .orderBy("query_id", "rk")
  }

  val annIvfSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (SELECT id AS cell, v AS cv FROM v
      |         WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
      |assigned AS (
      |  SELECT id, v, cell FROM (
      |    SELECT v.id, v.v, c.cell,
      |      row_number() OVER (PARTITION BY v.id
      |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC, c.cell ASC) AS ark
      |    FROM v CROSS JOIN cent c) WHERE ark = 1),
      |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |      FROM embeddings WHERE vec_id < 10),
      |probes AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT q.query_id, q.qv, c.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cell ASC) AS crk
      |    FROM q CROSS JOIN cent c) WHERE crk <= 4),
      |scored AS (
      |  SELECT DISTINCT p.query_id, a.id AS neighbor_id,
      |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE p.query_id <> a.id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |    (row_number() OVER (PARTITION BY query_id
      |                        ORDER BY sim DESC, neighbor_id ASC))::INTEGER AS rk
      |  FROM scored)
      |SELECT query_id, neighbor_id, sim, rk FROM ranked
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** MinHash estimator calibration — q194's "measure, don't guess"
    * discipline applied to the dedup family: for every probe pair with
    * TRUE 3-token-shingle Jaccard ≥ 0.3, the per-pair error of a
    * 32-permutation MinHash estimate (matching-component fraction).
    * The permutations here are md5-salted mins — deliberately a
    * DIFFERENT, fully-SQL-replayable construction from the production
    * xxh64 kernel (whose oracle is truth-based, not replay-based), so
    * the ORACLE can replay estimate AND truth bit-for-bit; the
    * estimator-vs-truth error profile is the same property a user
    * would measure before sizing the q32 band/row configuration.
    *
    * Scale shape: signatures are map-side nested transforms (32 mins
    * over the shingle set, never shuffled); the pair stage is the q53
    * broadcast-probe shape (bounded probe set — eval harness, not a
    * discovery path; discovery stays with q32's banded LSH). */
  val minhashCalibration: Q = (s, dir) => {
    // The 32-permutation signature is deliberately computed AFTER the
    // broadcast-probe join and the true-Jaccard filter: only the
    // handful of surviving pairs ever read a signature, so the corpus
    // never pays 32 md5 calls per shingle per document (the eager form
    // was ~10% of the whole bench; this one is jaccard-only map-side).
    def sig(shCol: String) = expr(
      s"""transform(sequence(0, 31), j ->
         |  array_min(transform($shCol, s ->
         |    md5(concat('mh', cast(j AS string), '|', s)))))""".stripMargin)
    val g = Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val probes = g.select(col("doc_id").as("doc_a"),
      col("shingles").as("g_a")).filter(col("doc_a") < 20)
    g.select(col("doc_id").as("doc_b"), col("shingles").as("g_b"))
      .join(broadcast(probes), col("doc_b") > col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("g_a"), col("g_b"),
        round(TextOps.jaccard(col("g_a"), col("g_b")), 4).as("true_j"))
      .filter(col("true_j") >= 0.3)
      .select(col("doc_a"), col("doc_b"), col("true_j"),
        sig("g_a").as("sig_a"), sig("g_b").as("sig_b"))
      .select(col("doc_a"), col("doc_b"), col("true_j"),
        round(expr("size(filter(sequence(0, 31), j -> sig_a[j] = sig_b[j]))")
          .cast("double") / lit(32.0), 4).as("est"))
      .withColumn("abs_err", round(abs(col("est") - col("true_j")), 4))
      .orderBy("doc_a", "doc_b")
  }

  val minhashCalibrationSql: String = {
    val trueJ = """round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
                  |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4)""".stripMargin
    val est = """round(len([j for j in range(1, 33)
                |            if a.sig[j] = b.sig[j]])::DOUBLE / 32.0, 4)""".stripMargin
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
       |           for i in range(1, len(toks)-1)]) AS shingles
       |  FROM (SELECT doc_id, $ToksSql AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |g AS (
       |  SELECT doc_id, shingles,
       |    [list_min([md5('mh' || j::VARCHAR || '|' || s) for s in shingles])
       |     for j in range(0, 32)] AS sig
       |  FROM sh WHERE len(shingles) > 0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  $trueJ AS true_j, $est AS est,
       |  round(abs($est - $trueJ), 4) AS abs_err
       |FROM g a JOIN g b ON a.doc_id < 20 AND b.doc_id > a.doc_id
       |WHERE $trueJ >= 0.3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Exact-duplicate group-size histogram with token savings — the
    * "what would dedup buy us" report read before running the q30 drop:
    * per duplicate-group size, how many groups/docs exist, how many
    * docs a keep-first policy removes, and exactly how many TOKENS that
    * frees (the budget currency of a training pipeline — group total
    * minus the kept min-doc_id member's tokens). All integer
    * arithmetic; the near-dup (LSH-cluster) variant of the same report
    * is this shape over q56's cluster ids instead of fingerprints.
    *
    * Scale shape: one fingerprint-keyed count (map-combinable, carries
    * (fp, doc_id, n_tok) — never text), one ≤|groups|-row rollup keyed
    * on group size. Linear at any corpus size. */
  val dupHistogram: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    d.groupBy("fp")
      .agg(count(lit(1)).as("group_size"), sum("n_tok").as("tok_total"),
        expr("min_by(n_tok, doc_id)").as("keep_tok"))
      .groupBy("group_size")
      .agg(count(lit(1)).as("n_groups"),
        sum(col("tok_total") - col("keep_tok")).as("removable_tokens"))
      .select(col("group_size"), col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_docs"),
        ((col("group_size") - 1) * col("n_groups")).as("removable_docs"),
        col("removable_tokens"))
      .orderBy("group_size")
  }

  val dupHistogramSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, md5($NormSql) AS fp, len($ToksSql)::BIGINT AS n_tok
       |  FROM documents),
       |g AS (
       |  SELECT fp, count(*) AS group_size, sum(n_tok)::BIGINT AS tok_total,
       |    arg_min(n_tok, doc_id) AS keep_tok
       |  FROM d GROUP BY 1)
       |SELECT group_size, count(*) AS n_groups,
       |  (group_size * count(*))::BIGINT AS n_docs,
       |  ((group_size - 1) * count(*))::BIGINT AS removable_docs,
       |  sum(tok_total - keep_tok)::BIGINT AS removable_tokens
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Asymmetric containment detection (quote/expansion direction — the
    * question q53's symmetric Jaccard cannot answer): for each probe
    * document, the fraction of ITS distinct 5-token shingles found in
    * another document. A short doc pasted into a long one scores
    * containment ≈ 1 in that direction while Jaccard stays small — the
    * signal that distinguishes "B quotes A" from "A and B are
    * near-copies". Shingles travel as md5 hashes (never text); pairs
    * with containment ≥ 0.5 survive.
    *
    * Scale shape: the shared-shingle count is ONE hash-keyed join on
    * the shingle md5 (the q87 decontam shape, probe side filtered
    * first) + a keyed pair count; per-doc sizes rejoin by key. No
    * all-pairs stage — a pair only materializes if it shares a
    * shingle, and stop-shingle fan-out is bounded by the same
    * df-cap/accumulator discipline as the LSH family if a real corpus
    * demands it. */
  val containmentDup: Q = (s, dir) => {
    val sh = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 5)).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("h"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val probes = sh.filter(col("doc_id") < 20)
      .select(col("doc_id").as("doc_a"), col("h"))
    probes.join(sh.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_b") =!= col("doc_a"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        round(col("shared").cast("double") / col("n_a").cast("double"), 4)
          .as("containment"))
      .filter(col("containment") >= lit(0.5))
      .orderBy("doc_a", "doc_b")
  }

  val containmentDupSql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    md5(unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
       |      for i in range(1, len(toks) - 3)]))) AS h
       |  FROM t),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM sh a JOIN sh b USING (h)
       |  WHERE a.doc_id < 20 AND b.doc_id <> a.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared,
       |  round(shared::DOUBLE / n_sh::DOUBLE, 4) AS containment
       |FROM pairs JOIN sz ON sz.doc_id = pairs.doc_a
       |WHERE round(shared::DOUBLE / n_sh::DOUBLE, 4) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Embedding dimension covariance diagnostics (the PCA-input health
    * check next to q37's per-dim stats): the upper-triangle covariance
    * matrix of the embedding dimensions, E[x_i·x_j] − E[x_i]·E[x_j],
    * flattened to (i, j, cov) rows. An embedding space whose
    * off-diagonal mass is large wastes capacity (dimensions are
    * redundant) — this is the one-query answer to "should I truncate
    * or rotate before the q185 cascade?".
    *
    * Scale shape: the pair products are generated MAP-SIDE by one
    * nested-transform explode (no self-join of the dimension stream —
    * deliberately not the (vec, dim)⋈(vec, dim) formulation, which
    * shuffles the corpus twice); the d(d+1)/2-key aggregate is
    * map-combinable; per-dim means are a 64-row broadcast. One corpus
    * scan, output bounded by dims², independent of corpus size. */
  val embCovariance: Q = (s, dir) => {
    val e = Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // pair products via two stacked posexplodes (row → (i, x_i) → the
    // j ≥ i tail of the array) instead of one nested
    // transform/transform/flatten expression: higher-order-function
    // lambdas are CodegenFallback in Spark — the old form built a
    // d(d+1)/2-struct array per row in INTERPRETED eval inside the only
    // heavy stage. Generate(PosExplode) and slice() are codegen, so the
    // whole scan → generate → generate → partial-agg stage now stays in
    // one WholeStageCodegen span. Same (i, j, x_i·x_j) multiset — the
    // identical double products, grouped by the identical keys.
    // Measured solo at sf0.1 (min-of-2): 2.48 → 0.74 s, and the
    // downstream q261 (which collects this frame) 2.90 → 0.90 s.
    val pairs = e
      .select(col("v"), posexplode(col("v")).as(Seq("p0", "xi")))
      .select(col("p0"), col("xi"),
        posexplode(slice(col("v"), col("p0") + 1, size(col("v")) - col("p0")))
          .as(Seq("q", "xj")))
      .select((col("p0") + 1).as("i"), (col("p0") + col("q") + 1).as("j"),
        (col("xi") * col("xj")).as("xy"))
      .groupBy("i", "j").agg(avg("xy").as("exy"))
    val means = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg("x").as("mu"))
      .select((col("pos") + 1).as("pos"), col("mu"))
    pairs
      .join(broadcast(means.select(col("pos").as("i"), col("mu").as("mu_i"))), "i")
      .join(broadcast(means.select(col("pos").as("j"), col("mu").as("mu_j"))), "j")
      .select(col("i"), col("j"),
        // + 0.0 collapses IEEE negative zero: near-uncorrelated dims
        // round to -0.0 or +0.0 depending on the engine's summation
        // order, and the driver's value hash distinguishes the two
        (round(col("exy") - col("mu_i") * col("mu_j"), 4) + lit(0.0)).as("cov"))
      .orderBy("i", "j")
  }

  /** q197's covariance by the matrix-accumulator path
    * ([[Similarity.covarianceMatrix]]) — same output contract, same
    * oracle; registered separately so the scale-path formulation rides
    * its own green correctness row. */
  val embCovarianceAccum: Q = (s, dir) =>
    Similarity.covarianceMatrix(Tables.t(s, dir, "embeddings"))

  val embCovarianceSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (
      |  SELECT vec_id, i, v[i] AS x
      |  FROM e, unnest(range(1, len(v) + 1)) AS t(i)),
      |m AS (SELECT i, avg(x) AS mu FROM x GROUP BY 1),
      |p AS (
      |  SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS exy
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
      |  GROUP BY 1, 2)
      |SELECT p.i::INT AS i, p.j::INT AS j,
      |  round(p.exy - mi.mu * mj.mu, 4) + 0.0 AS cov
      |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j
      |ORDER BY p.i, p.j""".stripMargin

  /** ANN recall@5 evaluation harness — the "measure, don't guess"
    * companion to the q50 IVF path: per query, how many of the TRUE
    * cosine top-5 (q34's brute-force leg, the ground truth) the
    * IVF(nlist=16, nprobe=4) search actually returned. Both legs use
    * the repo's deterministic 6-dp cell assignment and 4-dp scoring
    * ties, so "recall" is a well-defined integer, not a float artifact.
    * This is the query a user runs before trusting an nprobe setting —
    * the recall/probe-fraction trade-off made measurable in one place.
    *
    * Scale shape: the brute-force truth leg is the eval harness's cost
    * (queries×corpus with broadcast queries — affordable for an EVAL
    * SAMPLE of queries, never run corpus×corpus); the IVF leg and the
    * hit-counting joins are keyed on (query_id, neighbor_id) with
    * ≤5-per-query bounded sides. At 100 TB you run this on a few
    * thousand sampled queries to pick nprobe, then serve with q50. */
  val annRecall: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(q, emb, 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.ivfTopK(q, emb, 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).cast("int").as("n_hit"))
    q.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0)).cast("double") / lit(5.0), 2)
          .as("recall_at_5"))
      .orderBy("query_id")
  }

  val annRecallSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (SELECT id AS cell, v AS cv FROM v
      |         WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
      |assigned AS (
      |  SELECT id, v, cell FROM (
      |    SELECT v.id, v.v, c.cell,
      |      row_number() OVER (PARTITION BY v.id
      |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC, c.cell ASC) AS ark
      |    FROM v CROSS JOIN cent c) WHERE ark = 1),
      |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |      FROM embeddings WHERE vec_id < 10),
      |probes AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT q.query_id, q.qv, c.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cell ASC) AS crk
      |    FROM q CROSS JOIN cent c) WHERE crk <= 4),
      |ivf_scored AS (
      |  SELECT DISTINCT p.query_id, a.id AS neighbor_id,
      |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE p.query_id <> a.id),
      |ivf AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY sim DESC, neighbor_id ASC) AS rk
      |    FROM ivf_scored) WHERE rk <= 5),
      |bf_scored AS (
      |  SELECT q.query_id, v.id AS neighbor_id,
      |    round(list_cosine_similarity(q.qv, v.v), 4) AS sim
      |  FROM v CROSS JOIN q WHERE v.id <> q.query_id),
      |bf AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY sim DESC, neighbor_id ASC) AS rk
      |    FROM bf_scored) WHERE rk <= 5),
      |h AS (
      |  SELECT bf.query_id, count(*) AS n_hit
      |  FROM bf JOIN ivf USING (query_id, neighbor_id) GROUP BY 1)
      |SELECT qq.query_id, coalesce(h.n_hit, 0)::INT AS n_hit,
      |  round(coalesce(h.n_hit, 0)::DOUBLE / 5.0, 2) AS recall_at_5
      |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) qq
      |LEFT JOIN h USING (query_id)
      |ORDER BY query_id""".stripMargin

  /** Trained-vs-placeholder IVF recall (SCALE.md caveat 3 closed by
    * measurement): the q194 recall harness run twice per query — once
    * with [[Similarity.trainCentroidsReplayable]]'s sampled-k-means
    * centroids, once with the first-N placeholder — so the choice
    * "train or not" is a green oracle row, not advice. The trainer is
    * integer-exact (6-dp micro-units, exact integer dots and sums), so
    * the oracle replays BOTH the two Lloyd iterations and the serving
    * path bit-for-bit.
    *
    * Measured verdict on THIS fixture: first-N wins (46 vs 37 of 50 at
    * sf0.01; every (nlist, nprobe) in a 6-config sweep agrees). The
    * fixture's embeddings have no cosine cluster structure (within- vs
    * cross-label mean cosine both ≈ 0), and on structureless data
    * data-point centroids preserve the query↔neighbor cell-rank
    * correlation that mean-centroids destroy. The planted-corpus spec
    * (LlmOpsSpec) shows the opposite on a clustered, sampling-biased
    * corpus — trained 50 vs first-N 44 — which is exactly why this
    * harness exists: run it on YOUR corpus before choosing.
    *
    * Scale shape: training is bounded by the seeded sample (≤256
    * vectors to the driver — the offline-training contract); both
    * serving legs are the q50 IVF plan (map-side assignment against
    * broadcast centroids, one cell-keyed join); the brute-force truth
    * leg is the eval harness's bounded probe set, never a serving
    * path. */
  val annTrainedRecall: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val trained = Similarity.trainCentroidsReplayable(emb)
    val truth = Similarity.bruteForceTopK(q, emb, 5)
      .select(col("query_id"), col("neighbor_id"))
    def hits(approx: org.apache.spark.sql.DataFrame, name: String) =
      truth.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).cast("int").as(name))
    val ht = hits(Similarity.ivfTopK(q, emb, 5, centroids = Some(trained)), "hit_trained")
    val hf = hits(Similarity.ivfTopK(q, emb, 5), "hit_firstn")
    q.select(col("vec_id").as("query_id"))
      .join(ht, Seq("query_id"), "left")
      .join(hf, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hit_trained"), lit(0)).as("hit_trained"),
        coalesce(col("hit_firstn"), lit(0)).as("hit_firstn"))
      .orderBy("query_id")
  }

  val annTrainedRecallSql: String = {
    // one unrolled Lloyd iteration: assign (exact integer dot, ties to
    // the lowest cell), per-(cell, dim) integer sums, re-normalize +
    // re-quantize; empty cells keep the previous centroid
    def iter(n: Int, prev: String): String =
      s"""a$n AS (
         |  SELECT sn, q, cell FROM (
         |    SELECT u.sn, u.q, c.cell,
         |      row_number() OVER (PARTITION BY u.sn
         |        ORDER BY list_sum([u.q[i] * c.cq[i]
         |                 for i in range(1, len(u.q)+1)]) DESC,
         |                 c.cell ASC) AS rk
         |    FROM u CROSS JOIN $prev c) WHERE rk = 1),
         |s$n AS (
         |  SELECT cell, t.i AS i, sum(q[t.i])::BIGINT AS s
         |  FROM a$n, unnest(range(1, len(q)+1)) AS t(i)
         |  GROUP BY cell, t.i),
         |n$n AS (SELECT cell, list(s ORDER BY i) AS sv FROM s$n GROUP BY cell),
         |c$n AS (
         |  SELECT p.cell,
         |    CASE WHEN n$n.cell IS NULL THEN p.cq
         |         ELSE [round(s / sqrt(list_sum([x*x for x in n$n.sv])::DOUBLE)
         |                 * 1e6)::BIGINT for s in n$n.sv]
         |    END AS cq
         |  FROM $prev p LEFT JOIN n$n ON p.cell = n$n.cell)""".stripMargin
    // one IVF serving leg + hit count against the shared brute-force top-5
    def leg(tag: String, centCte: String): String =
      s"""assigned_$tag AS (
         |  SELECT id, v, cell FROM (
         |    SELECT v.id, v.v, c.cell,
         |      row_number() OVER (PARTITION BY v.id
         |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC,
         |                 c.cell ASC) AS ark
         |    FROM v CROSS JOIN $centCte c) WHERE ark = 1),
         |probes_$tag AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, c.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC,
         |                 c.cell ASC) AS crk
         |    FROM q CROSS JOIN $centCte c) WHERE crk <= 4),
         |scored_$tag AS (
         |  SELECT DISTINCT p.query_id, a.id AS neighbor_id,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
         |  FROM probes_$tag p JOIN assigned_$tag a ON p.cell = a.cell
         |  WHERE p.query_id <> a.id),
         |top_$tag AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rk
         |    FROM scored_$tag) WHERE rk <= 5),
         |h_$tag AS (
         |  SELECT bf.query_id, count(*) AS n_hit
         |  FROM bf JOIN top_$tag USING (query_id, neighbor_id) GROUP BY 1)""".stripMargin
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |samp AS (
       |  SELECT id, v, row_number() OVER (ORDER BY id) AS sn
       |  FROM v
       |  WHERE (('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % 100) < 40
       |    AND list_sum([y*y for y in v]) > 0
       |  ORDER BY id LIMIT 256),
       |u AS (
       |  SELECT sn, [round(x / sqrt(list_sum([y*y for y in v])) * 1e6)::BIGINT
       |              for x in v] AS q
       |  FROM samp),
       |c0 AS (SELECT sn - 1 AS cell, q AS cq FROM u WHERE sn <= 16),
       |${iter(1, "c0")},
       |${iter(2, "c1")},
       |cent_t AS (SELECT cell, [x / 1000000.0 for x in cq] AS cv FROM c2),
       |cent_f AS (SELECT id AS cell, v AS cv FROM v
       |           WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
       |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |      FROM embeddings WHERE vec_id < 10),
       |bf_scored AS (
       |  SELECT q.query_id, v.id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv, v.v), 4) AS sim
       |  FROM v CROSS JOIN q WHERE v.id <> q.query_id),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY sim DESC, neighbor_id ASC) AS rk
       |    FROM bf_scored) WHERE rk <= 5),
       |${leg("t", "cent_t")},
       |${leg("f", "cent_f")}
       |SELECT qq.query_id,
       |  coalesce(h_t.n_hit, 0)::INT AS hit_trained,
       |  coalesce(h_f.n_hit, 0)::INT AS hit_firstn
       |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) qq
       |LEFT JOIN h_t USING (query_id)
       |LEFT JOIN h_f USING (query_id)
       |ORDER BY query_id""".stripMargin
  }

  /** One PQ block distance as an explicit left-assoc 8-term SQL sum —
    * the exact accumulation order of [[graft.functions.PqKernel]], so
    * the oracle replays the kernel bit-for-bit. `b.b` is the block index
    * column from the `blocks` CTE; indexes are 1-based. */
  private def pqBlockDistSql(xCol: String, cCol: String): String =
    (0 until 8).map { i =>
      val idx = s"b.b*8 + ${i + 1}"
      s"($xCol[$idx]::DOUBLE - $cCol[$idx]::DOUBLE) * ($xCol[$idx]::DOUBLE - $cCol[$idx]::DOUBLE)"
    }.mkString(" + ")

  /** Product-quantization approximate top-k (the compression half of the
    * FAISS-style ANN stack; q50 IVF is the pruning half). Deterministic
    * first-16 codebook + rounded block distances make encode AND ADC
    * scoring fully SQL-replayable — the oracle runs the same PQ, not a
    * brute-force stand-in. */
  val annPq: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .orderBy("query_id", "rk")
  }

  val annPqSql: String = {
    val vDist = pqBlockDistSql("v.embedding", "cb.cv")
    val qDist = pqBlockDistSql("q.qv", "cb.cv")
    s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings),
       |cb AS (SELECT id AS code, embedding AS cv FROM v
       |       WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
       |blocks AS (SELECT unnest(range(8)) AS b),
       |bd AS (
       |  SELECT v.id, cb.code, b.b AS b, round($vDist, 6) AS d2
       |  FROM v CROSS JOIN cb CROSS JOIN blocks b),
       |codes AS (
       |  SELECT id, b, code FROM (
       |    SELECT id, b, code,
       |      row_number() OVER (PARTITION BY id, b ORDER BY d2 ASC, code ASC) AS rn
       |    FROM bd) WHERE rn = 1),
       |q AS (SELECT id AS query_id, embedding AS qv FROM v WHERE id < 10),
       |qbd AS (
       |  SELECT q.query_id, cb.code, b.b AS b, round($qDist, 6) AS d2
       |  FROM q CROSS JOIN cb CROSS JOIN blocks b),
       |blk AS (
       |  SELECT qbd.query_id, codes.id, codes.b, qbd.d2
       |  FROM codes JOIN qbd ON qbd.code = codes.code AND qbd.b = codes.b),
       |pv AS (
       |  SELECT query_id, id,
       |    max(CASE WHEN b = 0 THEN d2 END) AS d0,
       |    max(CASE WHEN b = 1 THEN d2 END) AS d1,
       |    max(CASE WHEN b = 2 THEN d2 END) AS d2,
       |    max(CASE WHEN b = 3 THEN d2 END) AS d3,
       |    max(CASE WHEN b = 4 THEN d2 END) AS d4,
       |    max(CASE WHEN b = 5 THEN d2 END) AS d5,
       |    max(CASE WHEN b = 6 THEN d2 END) AS d6,
       |    max(CASE WHEN b = 7 THEN d2 END) AS d7
       |  FROM blk GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, id AS neighbor_id,
       |    round(d0 + d1 + d2 + d3 + d4 + d5 + d6 + d7, 4) AS adist
       |  FROM pv WHERE query_id <> id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    (row_number() OVER (PARTITION BY query_id
       |       ORDER BY adist ASC, neighbor_id ASC))::INTEGER AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, adist, rk FROM ranked
       |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  }

  /** IVF+PQ composed top-k: q50's cell pruning feeding q78's compressed
    * scoring — the full FAISS-style stack, replayed end to end by the
    * oracle (cosine cell assignment + probes, L2 block codes, ADC). */
  val annIvfPq: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .orderBy("query_id", "rk")
  }

  val annIvfPqSql: String = {
    val vDist = pqBlockDistSql("v.embedding", "cb.cv")
    val qDist = pqBlockDistSql("q.qv", "cb.cv")
    s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings),
       |cent AS (SELECT id AS cell, embedding::DOUBLE[] AS cv FROM v
       |         WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
       |assigned AS (
       |  SELECT id, cell FROM (
       |    SELECT v.id, c.cell,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY round(list_cosine_similarity(v.embedding::DOUBLE[], c.cv), 6) DESC,
       |                 c.cell ASC) AS ark
       |    FROM v CROSS JOIN cent c) WHERE ark = 1),
       |cb AS (SELECT id AS code, embedding AS cv FROM v
       |       WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
       |blocks AS (SELECT unnest(range(8)) AS b),
       |bd AS (
       |  SELECT v.id, cb.code, b.b AS b, round($vDist, 6) AS d2
       |  FROM v CROSS JOIN cb CROSS JOIN blocks b),
       |codes AS (
       |  SELECT id, b, code FROM (
       |    SELECT id, b, code,
       |      row_number() OVER (PARTITION BY id, b ORDER BY d2 ASC, code ASC) AS rn
       |    FROM bd) WHERE rn = 1),
       |q AS (SELECT id AS query_id, embedding AS qv FROM v WHERE id < 10),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qv::DOUBLE[], c.cv), 6) DESC,
       |                 c.cell ASC) AS crk
       |    FROM q CROSS JOIN cent c) WHERE crk <= 4),
       |qbd AS (
       |  SELECT q.query_id, cb.code, b.b AS b, round($qDist, 6) AS d2
       |  FROM q CROSS JOIN cb CROSS JOIN blocks b),
       |cand AS (
       |  SELECT p.query_id, a.id FROM probes p JOIN assigned a ON p.cell = a.cell
       |  WHERE p.query_id <> a.id),
       |blk AS (
       |  SELECT c.query_id, c.id, codes.b, qbd.d2
       |  FROM cand c JOIN codes ON codes.id = c.id
       |  JOIN qbd ON qbd.query_id = c.query_id AND qbd.code = codes.code
       |          AND qbd.b = codes.b),
       |pv AS (
       |  SELECT query_id, id,
       |    max(CASE WHEN b = 0 THEN d2 END) AS d0,
       |    max(CASE WHEN b = 1 THEN d2 END) AS d1,
       |    max(CASE WHEN b = 2 THEN d2 END) AS d2,
       |    max(CASE WHEN b = 3 THEN d2 END) AS d3,
       |    max(CASE WHEN b = 4 THEN d2 END) AS d4,
       |    max(CASE WHEN b = 5 THEN d2 END) AS d5,
       |    max(CASE WHEN b = 6 THEN d2 END) AS d6,
       |    max(CASE WHEN b = 7 THEN d2 END) AS d7
       |  FROM blk GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, id AS neighbor_id,
       |    round(d0 + d1 + d2 + d3 + d4 + d5 + d6 + d7, 4) AS adist
       |  FROM pv),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    (row_number() OVER (PARTITION BY query_id
       |       ORDER BY adist ASC, neighbor_id ASC))::INTEGER AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, adist, rk FROM ranked
       |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  }

  /** Hybrid text+vector retrieval (the RAG-serving capstone): rank the
    * corpus against a query document by term overlap (integer hits vs
    * the query's distinct tokens, a BM25-ish lexical leg) combined with
    * embedding cosine (the semantic leg), `hybrid = hits + 2·cos`. Both
    * query legs broadcast; the corpus is scanned once; ranking is
    * top-k. The score arithmetic is an integer plus a rounded double —
    * deterministic across engines. */
  val hybridSearch: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val e = Tables.t(s, dir, "embeddings")
    val qTerms = d.filter(col("doc_id") === 0)
      .select(explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
    val qVec = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    val docTerms = d.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
    val textScore = docTerms.join(broadcast(qTerms), "term")
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("text_hits"))
    d.select(col("doc_id"))
      .join(textScore, Seq("doc_id"), "left")
      .join(e.select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("v")), "doc_id")
      .crossJoin(broadcast(qVec))
      .select(col("doc_id"),
        coalesce(col("text_hits"), lit(0)).as("text_hits"),
        round(Similarity.cosine(col("v"), col("qv")), 4).as("vec_sim"))
      .filter(col("doc_id") =!= 0)
      .withColumn("hybrid", col("text_hits") + col("vec_sim") * 2)
      .orderBy(col("hybrid").desc, col("doc_id").asc)
      .limit(20)
  }

  val hybridSearchSql: String =
    s"""WITH qt AS (
       |  SELECT DISTINCT unnest(list_distinct($ToksSql)) AS term
       |  FROM documents WHERE doc_id = 0),
       |dt AS (
       |  SELECT doc_id, unnest(list_distinct($ToksSql)) AS term FROM documents),
       |th AS (
       |  SELECT dt.doc_id, count(*)::INTEGER AS text_hits
       |  FROM dt JOIN qt USING (term) GROUP BY 1),
       |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT d.doc_id, coalesce(th.text_hits, 0) AS text_hits,
       |  round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qv), 4) AS vec_sim,
       |  coalesce(th.text_hits, 0) +
       |    round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qv), 4) * 2 AS hybrid
       |FROM documents d
       |JOIN embeddings e ON e.vec_id = d.doc_id
       |CROSS JOIN qv
       |LEFT JOIN th ON th.doc_id = d.doc_id
       |WHERE d.doc_id <> 0
       |ORDER BY hybrid DESC, d.doc_id ASC LIMIT 20""".stripMargin

  /** BM25 top-20 retrieval (Robertson–Spärck Jones; the full-idf
    * upgrade of q86's term-hit lexical leg, k1 = 1.2, b = 0.75 — the
    * Lucene-default parameterization): score the corpus against a
    * 3-term query with the standard
    * idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) sum. The idf's `ln` and
    * the score divisions are the one libm call the repo's exactness
    * discipline allows (precedent: q25's ln battery) — both engines
    * round the summed score to 4 dp, and the top-20 cut sorts on the
    * ROUNDED score with a doc_id tie-break so the boundary is
    * deterministic. `dl/avgdl` is written `dl·N/Σdl` in BOTH engines so
    * the float ops associate identically.
    *
    * Scale shape: the token explode filters to the query terms
    * IMMEDIATELY (the shuffle carries only query-term hits — a 3-term
    * query touches a vanishing fraction of a 100 TB corpus after the
    * map stage); df is a ≤|query| row broadcast, corpus stats a
    * single-row broadcast; the final cut is TakeOrderedAndProject. An
    * inverted-index serving path would replace the scan with a
    * term-keyed lookup, but the scoring contract stays this one. */
  val bm25TopK: Q = (s, dir) => {
    val qTerms = Seq("vector", "spark", "customer")
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val stats = d.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) * (col("dl") * col("n_docs") / col("sum_dl")))))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("matched"),
        round(sum("contrib"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
  }

  val bm25TopKSql: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |d AS (SELECT doc_id, len(toks)::BIGINT AS dl, toks FROM t),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
       |  WHERE term IN ('vector', 'spark', 'customer')
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
       |SELECT doc_id, count(*)::INT AS matched,
       |  round(sum(
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
       |    (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl * n_docs / sum_dl)))), 4) AS score
       |FROM tf JOIN df USING (term) CROSS JOIN stats
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Per-label embedding centroids (class prototypes): element-wise mean
    * per label via posexplode → one map-combinable (label, pos) agg —
    * the distributed array-aggregation shape (also the inner step of
    * [[Similarity.trainCentroidsDistributed]]). Flattened to
    * (label, pos, m) rows so the oracle can hash it. */
  val labelCentroids: Q = (s, dir) =>
    Tables.t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy("label", "pos")
      // + 0.0 folds IEEE negative zero into positive zero, which the two
      // engines otherwise produce on opposite sides of round()
      .agg((round(avg("col"), 4) + lit(0.0)).as("m"))
      .orderBy("label", "pos")

  val labelCentroidsSql: String =
    """SELECT label, k::INTEGER AS pos,
      |       round(avg((embedding::DOUBLE[])[k + 1]), 4) + 0.0 AS m
      |FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS k)
      |GROUP BY label, k ORDER BY label, pos""".stripMargin

  /** Per-label embedding stats: count + mean L2 norm (sanity/profiling op). */
  val embStats: Q = (s, dir) => {
    val e = Tables.t(s, dir, "embeddings")
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
    e.select(col("label"), norm.as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("nrm"), 4).as("avg_norm"))
      .orderBy("label")
  }

  val embStatsSql: String =
    """SELECT label, count(*) AS n,
      |  round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4) AS avg_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  /** Exact character-n-gram Jaccard scoring: a small query set (broadcast)
    * against the corpus — the exact complement to the MinHash-LSH
    * discovery path (which finds corpus-wide pairs without O(n²) work). */
  val ngramJaccard: Q = (s, dir) => {
    // grams are hashed to sorted long sets ONCE per document
    // (GramHashKernel), so the broadcast scoring loop is a primitive
    // merge per pair — no per-pair string hashing (that per-pair HashSet
    // build dominated this query before)
    val g = Tables.t(s, dir, "documents")
      .select(col("doc_id"), graft.functions.Hashing.gramHashes(col("text"), 4).as("grams"))
      .filter(size(col("grams")) > 0)
    val qset = g.filter(col("doc_id") < 20)
      .select(col("doc_id").as("doc_a"), col("grams").as("g_a"))
    val corpus = g.select(col("doc_id").as("doc_b"), col("grams").as("g_b"))
    corpus.join(broadcast(qset), col("doc_b") > col("doc_a"))
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.Hashing.jaccardSimHashed(col("g_a"), col("g_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardSql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct([nt[i:i+3] for i in range(1, len(nt)-2)]) AS grams
      |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
      |        FROM documents)
      |  WHERE len(nt) >= 4)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(len(list_intersect(a.grams, b.grams))::DOUBLE /
      |        len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
      |FROM g a JOIN g b ON a.doc_id < 20 AND b.doc_id > a.doc_id
      |WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
      |        len(list_distinct(list_concat(a.grams, b.grams))), 4) >= 0.3
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------ text analysis

  /** Language ID heuristic vs the fixture's ground-truth lang column. */
  val langId: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))
      .withColumn("hit", col("lang") === col("lang_pred"))
      .orderBy("doc_id")

  val langIdSql: String = {
    def hits(lst: Seq[String]) =
      s"len(list_filter($ToksSql, t -> list_contains(${lst.mkString("['", "', '", "']")}, t)))"
    val en = hits(TextOps.StopEn); val de = hits(TextOps.StopDe)
    val fr = hits(TextOps.StopFr); val es = hits(TextOps.StopEs)
    s"""SELECT doc_id, lang, lang_pred, lang = lang_pred AS hit FROM (
       |  SELECT doc_id, lang,
       |    CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |         WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       |         WHEN $de >= $fr AND $de >= $es THEN 'de'
       |         WHEN $fr >= $es THEN 'fr'
       |         ELSE 'es' END AS lang_pred
       |  FROM documents) ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: token counts, punctuation/stopword ratios, composite
    * score — the standard cheap pre-filters of corpus curation. */
  val qualityScore: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        round(TextOps.punctRatio(col("text")), 4).as("punct_ratio"),
        round(TextOps.stopwordRatio(col("text")), 4).as("stop_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val qualityScoreSql: String = {
    val nTok = s"len($ToksSql)"
    val punct = "len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE / greatest(length(text), 1)"
    val stopHits =
      s"len(list_filter($ToksSql, t -> list_contains(${TextOps.StopEn.mkString("['", "', '", "']")}, t)))"
    val stopR = s"$stopHits::DOUBLE / greatest($nTok, 1)"
    s"""SELECT doc_id, $nTok::INTEGER AS n_tokens,
       |  round($punct, 4) AS punct_ratio,
       |  round($stopR, 4) AS stop_ratio,
       |  ${Fragments.qualitySql} AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens + BPE-ish regex pre-tokenizer count. */
  val tokenCount: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("bpe_tokens"),
        length(col("text")).as("n_chars_str"),
        round(length(col("text")).cast("double") /
          greatest(TextOps.bpeTokenCount(col("text")), lit(1)), 4).as("chars_per_bpe"))
      .orderBy("doc_id")

  val tokenCountSql: String = {
    val bpe = "len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))"
    s"""SELECT doc_id,
       |  len($ToksSql)::INTEGER AS ws_tokens,
       |  $bpe::INTEGER AS bpe_tokens,
       |  length(text)::INTEGER AS n_chars_str,
       |  round(length(text)::DOUBLE / greatest($bpe, 1), 4) AS chars_per_bpe
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** True BPE subword tokenization under the `en16` published-merges
    * table ([[TextOps.bpeSubwords]] / [[graft.functions.BpeKernel]]):
    * per document, the a-z word count, the subword count the budget
    * family should be denominated in, and subwords-per-word (the
    * fertility statistic tokenizer evaluations report). The oracle
    * replays the merge loop itself — one `list_reduce` pass per rule,
    * unrolled from the same Scala merges table — so the hash compare
    * covers the tokenizer's exact output, not just its count.
    *
    * Scale shape: one codegen'd kernel pass per document, no shuffle
    * until the presentation sort. O(merges × word length) per doc. */
  val bpeSubwordStats: Q = (s, dir) => {
    val words = filter(
      transform(TextOps.tokens(col("text")),
        t => regexp_replace(t, lit("[^a-z]"), lit(""))),
      w => w =!= "")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), size(words).cast("long").as("n_words"),
        size(TextOps.bpeSubwords(col("text"))).cast("long").as("n_subwords"))
      .withColumn("spw", when(col("n_words") > 0,
        round(col("n_subwords").cast("double") / col("n_words").cast("double"), 4)))
      .orderBy("doc_id")
  }

  /** Corpus subword vocabulary — the tokenizer-evaluation companion to
    * q205: the 30 most frequent BPE subwords with document frequency,
    * the table a tokenizer owner reads to see whether the merges fit
    * the corpus (high-rank single chars ⇒ missing merges). One kernel
    * pass + explode to (doc, subword), map-combinable counts, top-30 by
    * count with deterministic ties. */
  val bpeVocab: Q = (s, dir) => {
    val sw = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.bpeSubwords(col("text"))).as("subword"))
    sw.groupBy("subword")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("subword").asc)
      .limit(30)
  }

  val bpeVocabSql: String = {
    val chain = Fragments.bpeWordSql()
    s"""WITH wd AS (
       |  SELECT doc_id, ${Fragments.BpeWordsSql} AS words FROM documents),
       |sw AS (
       |  SELECT doc_id, unnest(flatten([string_split($chain, '${Fragments.BpeSep}')
       |    for w in words])) AS subword
       |  FROM wd)
       |SELECT subword, count(*) AS n_occurrences,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM sw GROUP BY subword
       |ORDER BY n_occurrences DESC, subword ASC LIMIT 30""".stripMargin
  }

  /** Per-language BPE fertility (q215) — a-z characters consumed per
    * emitted subword, the tokenizer-efficiency metric a pipeline owner
    * tracks per language before committing a merges table (high
    * fertility = long subwords = the merges fit; near-1.0 = the
    * tokenizer degenerates to characters for that language). Char and
    * subword counts are exact integers derived from the same
    * normalization the kernel applies (a-z stripping), aggregated
    * map-combinably per language; the single division is the only
    * float op. Embarrassment-parallel at any corpus size. */
  val bpeFertility: Q = (s, dir) => {
    val base = Tables.t(s, dir, "documents").select(col("lang"),
      length(regexp_replace(TextOps.normalized(col("text")), "[^a-z]", ""))
        .cast("long").as("n_az"),
      size(TextOps.bpeSubwords(col("text"))).cast("long").as("n_sub"))
    base.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_az").as("n_az_chars"),
      sum("n_sub").as("n_subwords"))
      .select(col("lang"), col("n_docs"), col("n_az_chars"), col("n_subwords"),
        when(col("n_subwords") > 0,
          round(col("n_az_chars").cast("double") /
            col("n_subwords").cast("double"), 6)).as("fertility"))
      .orderBy("lang")
  }

  val bpeFertilitySql: String = {
    val chain = Fragments.bpeWordSql()
    s"""WITH wd AS (
       |  SELECT lang, ${Fragments.BpeWordsSql} AS words FROM documents),
       |b AS (
       |  SELECT lang,
       |    coalesce(list_sum([len(w) for w in words]), 0)::BIGINT AS n_az,
       |    coalesce(list_sum([len(string_split($chain, '${Fragments.BpeSep}'))
       |      for w in words]), 0)::BIGINT AS n_sub
       |  FROM wd)
       |SELECT lang, count(*)::BIGINT AS n_docs, sum(n_az)::BIGINT AS n_az_chars,
       |  sum(n_sub)::BIGINT AS n_subwords,
       |  CASE WHEN sum(n_sub) > 0
       |       THEN round(sum(n_az)::DOUBLE / sum(n_sub)::DOUBLE, 6) END AS fertility
       |FROM b GROUP BY lang ORDER BY lang""".stripMargin
  }

  val bpeSubwordStatsSql: String = {
    val chain = Fragments.bpeWordSql()
    s"""WITH wd AS (
       |  SELECT doc_id, ${Fragments.BpeWordsSql} AS words FROM documents),
       |b AS (
       |  SELECT doc_id, len(words)::BIGINT AS n_words,
       |    coalesce(list_sum([len(string_split($chain, '${Fragments.BpeSep}'))
       |      for w in words]), 0)::BIGINT AS n_subwords
       |  FROM wd)
       |SELECT doc_id, n_words, n_subwords,
       |  CASE WHEN n_words > 0
       |       THEN round(n_subwords::DOUBLE / n_words::DOUBLE, 4) END AS spw
       |FROM b ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- q229

  /** Source-profile cosine matrix (q229): pairwise cosine similarity
    * between the unigram term-count profiles of every source pair —
    * "which crawl slices speak the same language?" for mix design
    * (the source-level complement of q181's doc-level SemDeDup). Term
    * counts and squared norms are exact BIGINTs; the dot product is a
    * TERM-KEYED self-join of the aggregated profile table (per term at
    * most |sources|² pair rows — bounded fan-out, never an all-pairs
    * doc join), and cosine is one division by two correctly-rounded
    * sqrts. Data-scale work: the single token-explode aggregate. */
  val sourceProfileSim: Q = (s, dir) => {
    // the profile table is read by the norms aggregate and BOTH
    // self-join sides — one token explode, not three. Materialized via
    // the IterFrame width guard keyed on term (round-11 sweep: a bare
    // checkpoint of this shuffle output AQE-collapses and every
    // consumer rescans it single-threaded); keying on term also
    // co-partitions both self-join sides
    val tf = graft.common.IterFrame.keyed(
      Tables.t(s, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("source", "term").agg(count(lit(1)).as("c")),
      col("term"))
    val norms = tf.groupBy("source").agg(sum(col("c") * col("c")).as("n2"))
    val dots = tf.as("a").join(tf.as("b"), "term")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
    dots
      .join(broadcast(norms.select(col("source").as("source_a"),
        col("n2").as("na2"))), "source_a")
      .join(broadcast(norms.select(col("source").as("source_b"),
        col("n2").as("nb2"))), "source_b")
      .select(col("source_a"), col("source_b"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))),
          6).as("cos"))
      .orderBy("source_a", "source_b")
  }

  val sourceProfileSimSql: String =
    s"""WITH tf AS (
       |  SELECT source, term, count(*)::BIGINT AS c FROM (
       |    SELECT source, unnest($ToksSql) AS term FROM documents)
       |  WHERE term <> '' GROUP BY 1, 2),
       |norms AS (SELECT source, sum(c * c)::BIGINT AS n2 FROM tf GROUP BY 1),
       |dots AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    sum(a.c * b.c)::BIGINT AS dot
       |  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b,
       |  round(dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6)
       |    AS cos
       |FROM dots
       |JOIN norms na ON na.source = source_a
       |JOIN norms nb ON nb.source = source_b
       |ORDER BY source_a, source_b""".stripMargin

  // -------------------------------------------------------------- q233

  /** Reciprocal-rank fusion (q233): fuse q86's two retrieval legs — the
    * lexical term-hit ranking and the embedding-cosine ranking — with
    * the standard RRF(d) = Σ 1/(60 + rank_leg(d)) over the legs that
    * retrieved d (Cormack et al.'s rank-only fusion: no score
    * calibration between legs needed, which is the whole point). Each
    * leg contributes its TOP-50 only (TakeOrderedAndProject — the
    * serving cut, so corpus size never enters the fusion stage), ranks
    * are row_numbers with doc-id tie-breaks over the rounded leg scores
    * (total order, engine-independent), and the fused score is a fixed
    * two-term IEEE sum of exact-integer reciprocals. */
  val rrfFusion: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val e = Tables.t(s, dir, "embeddings")
    val qTerms = d.filter(col("doc_id") === 0)
      .select(explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
    val qVec = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    val lexTop = d.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .filter(col("doc_id") =!= 0)
      .orderBy(col("hits").desc, col("doc_id").asc).limit(50)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("hits").desc, col("doc_id").asc)).cast("long"))
    val vecTop = e.select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("v"))
      .filter(col("doc_id") =!= 0)
      .crossJoin(broadcast(qVec))
      .select(col("doc_id"),
        round(Similarity.cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(50)
      .withColumn("r_vec", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
    lexTop.select(col("doc_id"), col("r_lex"))
      .join(vecTop.select(col("doc_id"), col("r_vec")), Seq("doc_id"),
        "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_vec"),
        round(
          when(col("r_lex").isNotNull,
            lit(1.0) / (lit(60) + col("r_lex")).cast("double"))
            .otherwise(lit(0.0)) +
          when(col("r_vec").isNotNull,
            lit(1.0) / (lit(60) + col("r_vec")).cast("double"))
            .otherwise(lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(20)
  }

  val rrfFusionSql: String =
    s"""WITH qt AS (
       |  SELECT DISTINCT unnest(list_distinct($ToksSql)) AS term
       |  FROM documents WHERE doc_id = 0),
       |dt AS (
       |  SELECT doc_id, unnest(list_distinct($ToksSql)) AS term FROM documents),
       |lex AS (
       |  SELECT dt.doc_id, count(*)::BIGINT AS hits
       |  FROM dt JOIN qt USING (term) WHERE dt.doc_id <> 0 GROUP BY 1
       |  ORDER BY hits DESC, doc_id ASC LIMIT 50),
       |lexr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY hits DESC, doc_id ASC)::BIGINT
       |      AS r_lex
       |  FROM lex),
       |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |vec AS (
       |  SELECT vec_id AS doc_id,
       |    round(list_cosine_similarity(embedding::DOUBLE[], qv.qv), 4) AS cos
       |  FROM embeddings CROSS JOIN qv WHERE vec_id <> 0
       |  ORDER BY cos DESC, doc_id ASC LIMIT 50),
       |vecr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY cos DESC, doc_id ASC)::BIGINT AS r_vec
       |  FROM vec)
       |SELECT coalesce(lexr.doc_id, vecr.doc_id) AS doc_id,
       |  r_lex, r_vec,
       |  round(
       |    (CASE WHEN r_lex IS NOT NULL
       |          THEN 1.0::DOUBLE / (60 + r_lex)::DOUBLE ELSE 0.0 END) +
       |    (CASE WHEN r_vec IS NOT NULL
       |          THEN 1.0::DOUBLE / (60 + r_vec)::DOUBLE ELSE 0.0 END), 6)
       |    AS rrf
       |FROM lexr FULL OUTER JOIN vecr ON lexr.doc_id = vecr.doc_id
       |ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------- q240

  /** Centroid silhouette score (q240): per-label clustering quality of
    * the labeled embedding space — for each point, a = distance to its
    * OWN label centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b) (the simplified/centroid silhouette; the
    * classic all-pairs form is corpus-quadratic and adds nothing at
    * this granularity). Determinism without any order-sensitive float
    * sum: components quantize to micro-ints, centroid SUMS stay exact
    * BIGINTs (order-free), and the squared distance to centroid L is
    * the cross-multiplied integer Σ(x·n_L − S_L)² accumulated in
    * DECIMAL(38,0)/HUGEINT — sqrt and the two divisions are the only
    * float ops, one fixed sequence per (point, centroid). Per-point
    * silhouettes micro-quantize before the per-label mean, so the final
    * aggregate is order-free integer addition. Plan: one posexplode
    * pass, a 640-row broadcast of centroid sums, map-side distance
    * terms, keyed aggregates — no data-scale window, no pair join. */
  val silhouette: Q = (s, dir) => {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pts = Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(transform(col("embedding").cast("array<double>"),
          x => round(x * 1e6).cast("long"))))
      .withColumnRenamed("col", "x6")
      .localCheckpoint(true)
    val cents = pts.groupBy(col("label").as("label_c"), col("pos"))
      .agg(sum("x6").as("sl"), count(lit(1)).as("nl"))
    val d2 = pts.join(broadcast(cents), Seq("pos"))
      .withColumn("diff",
        (col("x6") * col("nl") - col("sl")).cast(dec))
      .groupBy("vec_id", "label", "label_c")
      .agg(sum(col("diff") * col("diff")).as("d2"), max("nl").as("nl"))
      .withColumn("dist",
        sqrt(col("d2").cast("double")) /
          (col("nl").cast("double") * 1e6))
    val perPoint = d2.groupBy("vec_id", "label")
      .agg(max(when(col("label") === col("label_c"), col("dist"))).as("a"),
        min(when(col("label") =!= col("label_c"), col("dist"))).as("b"))
      .withColumn("s_micro",
        when(greatest(col("a"), col("b")) > 0,
          round((col("b") - col("a")) / greatest(col("a"), col("b")) * 1e6))
          .otherwise(lit(0.0)).cast("long"))
    perPoint.groupBy("label")
      .agg(count(lit(1)).as("n"), sum("s_micro").as("sm"),
        sum(when(col("s_micro") < 0, 1L).otherwise(0L)).as("n_neg"))
      .select(col("label"), col("n"),
        round(col("sm").cast("double") / (col("n").cast("double") * 1e6), 4)
          .as("mean_sil"),
        col("n_neg"))
      .orderBy("label")
  }

  val silhouetteSql: String =
    """WITH pts AS (
      |  SELECT vec_id, label, k::INTEGER AS pos,
      |    round((embedding::DOUBLE[])[k + 1] * 1e6)::BIGINT AS x6
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS k)),
      |cents AS (
      |  SELECT label AS label_c, pos, sum(x6)::BIGINT AS sl,
      |    count(*)::BIGINT AS nl
      |  FROM pts GROUP BY 1, 2),
      |d2 AS (
      |  SELECT vec_id, label, label_c,
      |    sum((p.x6 * c.nl - c.sl)::HUGEINT * (p.x6 * c.nl - c.sl)::HUGEINT)
      |      AS d2,
      |    max(c.nl) AS nl
      |  FROM pts p JOIN cents c USING (pos)
      |  GROUP BY 1, 2, 3),
      |dist AS (
      |  SELECT vec_id, label, label_c,
      |    sqrt(d2::DOUBLE) / (nl::DOUBLE * 1e6) AS dist
      |  FROM d2),
      |pp AS (
      |  SELECT vec_id, label,
      |    max(CASE WHEN label = label_c THEN dist END) AS a,
      |    min(CASE WHEN label <> label_c THEN dist END) AS b
      |  FROM dist GROUP BY 1, 2),
      |sm AS (
      |  SELECT label,
      |    CASE WHEN greatest(a, b) > 0
      |         THEN round((b - a) / greatest(a, b) * 1e6)
      |         ELSE 0.0 END::BIGINT AS s_micro
      |  FROM pp)
      |SELECT label, count(*)::BIGINT AS n,
      |  round(sum(s_micro)::DOUBLE / (count(*)::DOUBLE * 1e6), 4)
      |    AS mean_sil,
      |  sum(CASE WHEN s_micro < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg
      |FROM sm GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------------------- q252

  /** Positional phrase search (q252): documents containing the exact
    * two-token phrase "the data", found through POSITIONAL postings —
    * the adjacency join (doc, pos) ⋈ (doc, pos+1) the q143 inverted
    * index cannot answer (it stores no positions). Both term filters
    * push into the posting explode, so the join sides carry only the
    * two terms' postings — at corpus scale the shuffle is proportional
    * to the PHRASE TERMS' frequency, never the corpus. Emits match
    * counts and first match position per doc — exact integers. */
  val phraseSearch: Q = (s, dir) => {
    val post = Tables.t(s, dir, "documents")
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .withColumnRenamed("col", "term")
    val a = post.filter(col("term") === "the")
      .select(col("doc_id"), col("pos").as("pa"))
    val b = post.filter(col("term") === "data")
      .select(col("doc_id"), col("pos").as("pb"))
    a.join(b, a("doc_id") === b("doc_id") && col("pb") === col("pa") + 1)
      .groupBy(a("doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min("pa").cast("int").as("first_pos"))
      .orderBy("doc_id")
  }

  val phraseSearchSql: String =
    s"""WITH post AS (
       |  SELECT doc_id, term, pos::INTEGER AS pos FROM (
       |    SELECT doc_id, unnest($ToksSql) AS term,
       |      generate_subscripts($ToksSql, 1) - 1 AS pos
       |    FROM documents) u),
       |a AS (SELECT doc_id, pos AS pa FROM post WHERE term = 'the'),
       |b AS (SELECT doc_id, pos AS pb FROM post WHERE term = 'data')
       |SELECT a.doc_id, count(*)::BIGINT AS n_matches,
       |  min(pa)::INTEGER AS first_pos
       |FROM a JOIN b ON a.doc_id = b.doc_id AND b.pb = a.pa + 1
       |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin

  // ------------------------------------------------------- q255 / q256

  /** Shared q233 legs: the lexical term-hit top-50 and the embedding-
    * cosine top-50 against query doc 0, each with a total-order rank. */
  private def retrievalLegs(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val d = Tables.t(s, dir, "documents")
    val e = Tables.t(s, dir, "embeddings")
    val qTerms = d.filter(col("doc_id") === 0)
      .select(explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
    val qVec = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    val lexTop = d.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .filter(col("doc_id") =!= 0)
      .orderBy(col("hits").desc, col("doc_id").asc).limit(50)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("hits").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "r_lex")
    val vecTop = e.select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("v"))
      .filter(col("doc_id") =!= 0)
      .crossJoin(broadcast(qVec))
      .select(col("doc_id"),
        round(Similarity.cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(50)
      .withColumn("r_vec", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "r_vec")
    (lexTop, vecTop)
  }

  /** The DuckDB twin of [[retrievalLegs]] as `lexr` / `vecr` CTE bodies
    * (prefix with WITH; column sets (doc_id, r_lex) / (doc_id, r_vec)). */
  private val RetrievalLegsSql: String =
    s"""qt AS (
       |  SELECT DISTINCT unnest(list_distinct($ToksSql)) AS term
       |  FROM documents WHERE doc_id = 0),
       |dt AS (
       |  SELECT doc_id, unnest(list_distinct($ToksSql)) AS term FROM documents),
       |lex AS (
       |  SELECT dt.doc_id, count(*)::BIGINT AS hits
       |  FROM dt JOIN qt USING (term) WHERE dt.doc_id <> 0 GROUP BY 1
       |  ORDER BY hits DESC, doc_id ASC LIMIT 50),
       |lexr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY hits DESC, doc_id ASC)::BIGINT
       |      AS r_lex
       |  FROM lex),
       |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |vec AS (
       |  SELECT vec_id AS doc_id,
       |    round(list_cosine_similarity(embedding::DOUBLE[], qv.qv), 4) AS cos
       |  FROM embeddings CROSS JOIN qv WHERE vec_id <> 0
       |  ORDER BY cos DESC, doc_id ASC LIMIT 50),
       |vecr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY cos DESC, doc_id ASC)::BIGINT AS r_vec
       |  FROM vec)""".stripMargin

  /** Rank-biased overlap (q255): how much do the two retrieval legs
    * agree, weighted toward the top — RBO with persistence p = 1/2, so
    * every depth weight is an exact power of two (the same no-libm move
    * as q202's half-life): RBO = Σ_d A_d/2^d with A_d the fractional
    * overlap of the depth-d prefixes. Per-depth terms are one fixed
    * division each, quantized to pico-units before the order-free
    * integer sum (terms past d≈40 round to 0 — exactly the tail RBO's
    * geometric weighting discards). Depth prefixes come from a
    * rank-pair cross of the two 50-row lists — bounded, never
    * corpus-sized. */
  val rboAgreement: Q = (s, dir) => {
    val (lexTop, vecTop) = retrievalLegs(s, dir)
    val both = lexTop.join(vecTop, "doc_id").localCheckpoint(true)
    // overlap at depth d = # common docs with BOTH ranks <= d
    val depths = s.range(1, 51).toDF("d")
    val ad = depths.join(broadcast(both),
        col("r_lex") <= col("d") && col("r_vec") <= col("d"), "left")
      .groupBy("d").agg(count(col("doc_id")).as("ov"))
      .select(col("d"),
        // 2^d via integer shift — exact, no libm pow anywhere
        round(col("ov").cast("double") / col("d").cast("double") /
          expr("shiftleft(CAST(1 AS BIGINT), CAST(d AS INT))")
            .cast("double") * 1e12).cast("long")
          .as("pico"))
    ad.agg(sum("pico").as("sp"))
      .select(round(col("sp").cast("double") / 1e12, 6).as("rbo"))
      .crossJoin(broadcast(both.agg(count(lit(1)).as("n_common"))))
      .select(col("n_common"), col("rbo"))
  }

  val rboAgreementSql: String =
    s"""WITH $RetrievalLegsSql,
       |both_r AS (
       |  SELECT lexr.doc_id, r_lex, r_vec
       |  FROM lexr JOIN vecr ON lexr.doc_id = vecr.doc_id),
       |ad AS (
       |  SELECT d,
       |    round((SELECT count(*) FROM both_r
       |           WHERE r_lex <= d AND r_vec <= d)::DOUBLE
       |      / d::DOUBLE / ((1::BIGINT << d)::DOUBLE) * 1e12)::BIGINT AS pico
       |  FROM (SELECT unnest(range(1, 51))::BIGINT AS d) ds)
       |SELECT (SELECT count(*)::BIGINT FROM both_r) AS n_common,
       |  round(sum(pico)::DOUBLE / 1e12, 6) AS rbo
       |FROM ad""".stripMargin

  /** Kendall tau-a (q256): rank agreement of the two retrieval
    * measures over a SHARED candidate pool — the lexical top-50, each
    * member ranked by term hits AND by embedding cosine against the
    * query, then concordant minus discordant pairs over all pool
    * pairs, entirely exact integers (the pair stage is quadratic in
    * the ≤50-row pool, bounded). τ = +1 when the measures order the
    * pool identically, −1 when reversed — the complementary
    * whole-ranking view to q255's top-weighted RBO.
    *
    * Pool-based on purpose (round-9 verdict): intersecting the two
    * legs' independent top-50s shrinks with the corpus — at sf1
    * (50 k docs) the intersection is EMPTY, so the old τ compared zero
    * pairs and its sf1 oracle row was vacuously green. Ranking one
    * fixed pool by both measures keeps n_pairs = C(|pool|, 2) at any
    * scale, so every verification tier exercises the τ arithmetic. */
  val kendallTau: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val e = Tables.t(s, dir, "embeddings")
    val qTerms = d.filter(col("doc_id") === 0)
      .select(explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
    val qVec = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    val pool = d.select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .filter(col("doc_id") =!= 0)
      .orderBy(col("hits").desc, col("doc_id").asc).limit(50)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("hits").desc, col("doc_id").asc)).cast("long"))
    val both = pool
      .join(e.select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("v")), "doc_id")
      .crossJoin(broadcast(qVec))
      .select(col("doc_id"), col("r_lex"),
        round(Similarity.cosine(col("v"), col("qv")), 4).as("cos"))
      .withColumn("r_vec", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "r_lex", "r_vec")
      .localCheckpoint(true)
    // the checkpointed frame is ≤ 50 rows but its LogicalRDD carries no
    // size stats — broadcast the inner side explicitly so the non-equi
    // pair join plans as BroadcastNestedLoopJoin, never CartesianProduct
    val pairs = both.as("x").join(broadcast(both.as("y")),
        col("x.doc_id") < col("y.doc_id"))
      .select(
        ((col("x.r_lex") < col("y.r_lex")) === (col("x.r_vec") < col("y.r_vec")))
          .as("conc"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("conc"), 1L).otherwise(0L)).as("nc"))
      .filter(col("n_pairs") > 0)
      .select(col("n_pairs"),
        round((lit(2) * col("nc") - col("n_pairs")).cast("double") /
          col("n_pairs").cast("double"), 6).as("tau"))
  }

  val kendallTauSql: String =
    s"""WITH qt AS (
       |  SELECT DISTINCT unnest(list_distinct($ToksSql)) AS term
       |  FROM documents WHERE doc_id = 0),
       |dt AS (
       |  SELECT doc_id, unnest(list_distinct($ToksSql)) AS term FROM documents),
       |pool AS (
       |  SELECT dt.doc_id, count(*)::BIGINT AS hits
       |  FROM dt JOIN qt USING (term) WHERE dt.doc_id <> 0 GROUP BY 1
       |  ORDER BY hits DESC, doc_id ASC LIMIT 50),
       |poolr AS (
       |  SELECT doc_id, hits,
       |    row_number() OVER (ORDER BY hits DESC, doc_id ASC)::BIGINT AS r_lex
       |  FROM pool),
       |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |both_r AS (
       |  SELECT doc_id, r_lex,
       |    row_number() OVER (
       |      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qv), 4)
       |        DESC, doc_id ASC)::BIGINT AS r_vec
       |  FROM poolr JOIN embeddings e ON e.vec_id = poolr.doc_id
       |  CROSS JOIN qv),
       |p AS (
       |  SELECT ((x.r_lex < y.r_lex) = (x.r_vec < y.r_vec)) AS conc
       |  FROM both_r x JOIN both_r y ON x.doc_id < y.doc_id)
       |SELECT count(*)::BIGINT AS n_pairs,
       |  round((2 * sum(CASE WHEN conc THEN 1 ELSE 0 END) - count(*))::DOUBLE
       |    / count(*)::DOUBLE, 6) AS tau
       |FROM p HAVING count(*) > 0""".stripMargin

  // ------------------------------------------------------------- registry

  // -------------------------------------------------------------- q261

  /** Top principal component of the embedding covariance (q261): eight
    * power-iteration rounds on the ORACLE-VERIFIED 4-dp covariance
    * matrix (q197's output contract), every step in exact integer
    * micro-units so the iteration is bit-replayable in any engine —
    * C entries as c4 = cov·10⁴ BIGINTs, the vector as v6 = v·10⁶
    * BIGINTs, w = C·v exact integer sums, and ONE quantized
    * float op per entry per round (round(w·10⁶ / √Σw²), the q221
    * quantize-then-sum discipline applied to linear algebra). Output:
    * the unit eigenvector (integer micro-units — no float compare at
    * all) plus the Rayleigh-quotient eigenvalue at 4 dp.
    *
    * Scale shape: the covariance build is the distributed part (q197 /
    * q207's matrix accumulator — partial-aggregated, combine input
    * partitions × d²); the iteration itself runs on the collected d×d
    * matrix (d = 64 ⇒ 2 080 rows — the AnnIndex bounded-model-collect
    * rule: bounded by DIMENSION, never by corpus). The oracle unrolls
    * the identical eight rounds as CTEs over the same covariance SQL. */
  val pcaTopComponent: Q = (s, dir) => {
    val covRows = embCovariance(s, dir).collect()
    val d = covRows.iterator.map(_.getInt(1)).max
    val c = Array.ofDim[Long](d + 1, d + 1)
    covRows.foreach { r =>
      val c4 = math.round(r.getDouble(2) * 1e4)
      c(r.getInt(0))(r.getInt(1)) = c4
      c(r.getInt(1))(r.getInt(0)) = c4
    }
    var v = Array.fill(d)(1000000L)
    def mul(vec: Array[Long]): Array[Long] =
      Array.tabulate(d) { i =>
        var sum = 0L; var j = 0
        while (j < d) { sum += c(i + 1)(j + 1) * vec(j); j += 1 }; sum
      }
    for (_ <- 1 to 8) {
      val w = mul(v)
      val norm2 = w.foldLeft(BigInt(0))((acc, x) => acc + BigInt(x) * x)
      val nrm = math.sqrt(norm2.toDouble)
      v = w.map(x => BigDecimal(x.toDouble * 1e6 / nrm)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val w = mul(v)
    val num = v.indices.foldLeft(BigInt(0))((a, i) => a + BigInt(v(i)) * w(i))
    val den = v.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * x)
    val eig4 = math.round(num.toDouble / den.toDouble) / 1e4
    import s.implicits._
    v.zipWithIndex.map { case (v6, i) => (i + 1, v6, eig4) }.toSeq
      .toDF("dim", "v6", "eig4").orderBy("dim")
  }

  val pcaTopComponentSql: String = {
    // split q197's SQL into its CTE chain and final SELECT, so the
    // SELECT can become one more CTE (covq) in this query's chain
    val q197 = embCovarianceSql.stripSuffix("\nORDER BY p.i, p.j")
    val sel = q197.lastIndexOf("SELECT p.i::INT")
    val covPrefix = q197.substring("WITH ".length, sel).trim.stripSuffix(",")
    val covSelect = q197.substring(sel)
    // the q197 SELECT becomes a CTE body; mirror the upper triangle and
    // quantize to c4 BIGINTs, then unroll 8 identical rounds
    val rounds = (1 to 8).map { k =>
      s"""w$k AS (
         |  SELECT c.i AS dim, sum(c.c4 * v${k - 1}.v6)::BIGINT AS w
         |  FROM c JOIN v${k - 1} ON c.j = v${k - 1}.dim GROUP BY 1),
         |n$k AS (SELECT sum(w::HUGEINT * w::HUGEINT) AS n2 FROM w$k),
         |v$k AS (
         |  SELECT dim, round((w::DOUBLE * 1e6) / sqrt(n2::DOUBLE))::BIGINT
         |    AS v6 FROM w$k, n$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $covPrefix,
       |covq AS MATERIALIZED ($covSelect),
       |c AS MATERIALIZED (
       |  SELECT i, j, round(cov * 10000)::BIGINT AS c4 FROM covq
       |  UNION ALL
       |  SELECT j AS i, i AS j, round(cov * 10000)::BIGINT AS c4
       |  FROM covq WHERE i <> j),
       |v0 AS (SELECT unnest(range(1, 65))::INT AS dim, 1000000::BIGINT AS v6),
       |$rounds,
       |wf AS (
       |  SELECT c.i AS dim, sum(c.c4 * v8.v6)::BIGINT AS w
       |  FROM c JOIN v8 ON c.j = v8.dim GROUP BY 1),
       |ray AS (
       |  SELECT sum(v8.v6::HUGEINT * wf.w::HUGEINT) AS num,
       |    (SELECT sum(v6::HUGEINT * v6::HUGEINT) FROM v8) AS den
       |  FROM v8 JOIN wf USING (dim))
       |SELECT v8.dim::INT AS dim, v8.v6,
       |  round(num::DOUBLE / den::DOUBLE) / 10000 AS eig4
       |FROM v8, ray ORDER BY dim""".stripMargin
  }

  // -------------------------------------------------------------- q262

  /** Jensen–Shannon divergence of each source's unigram distribution
    * against the REST of the corpus (q262) — the data-mixture
    * diagnostic behind domain-weighting decisions: a source with
    * jsd ≈ 0 duplicates the mixture, a high-jsd source contributes
    * genuinely different text (the q223 source-vs-rest shape applied to
    * distributions instead of CDFs). Both KL legs share one integer
    * denominator D = c·N_r + r·N_s per (source, token); the only float
    * ops are one ln per present term — micro-quantized to l6 BEFORE the
    * weighted sums (the q246 quantize-then-sum discipline), so the sums
    * are exact BIGINTs — and the final assembled expression. Tokens
    * absent from the source contribute the closed-form ln 2 mass
    * (l6 = 693147), a SCALAR per source — no source × vocabulary cross
    * product anywhere. Plan: one (source, tok) count, two keyed joins
    * (token totals, broadcast source totals), one grouped sum. */
  val jsDivergence: Q = (s, dir) => {
    val toks = Tables.t(s, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    // IterFrame keyed on tok (round-11 sweep): the (source, tok) table
    // feeds the token totals, the source totals, and the scoring join —
    // keying on tok co-partitions the tok-keyed consumers
    val st = graft.common.IterFrame.keyed(
      toks.groupBy("source", "tok").agg(count(lit(1)).as("c")), col("tok"))
    val tot = st.groupBy("tok").agg(sum("c").as("t"))
    val ns = st.groupBy("source").agg(sum("c").as("n_s"))
    val nAll = ns.agg(sum("n_s").as("n_all"))
    val j = st.join(tot, "tok")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nAll))
      .withColumn("r", col("t") - col("c"))
      .withColumn("n_r", col("n_all") - col("n_s"))
      .withColumn("d", col("c") * col("n_r") + col("r") * col("n_s"))
      .withColumn("l6p", round(log((lit(2) * col("c") * col("n_r"))
        .cast("double") / col("d").cast("double")) * 1e6).cast("long"))
      .withColumn("l6q", when(col("r") > 0,
        round(log((lit(2) * col("r") * col("n_s")).cast("double") /
          col("d").cast("double")) * 1e6).cast("long")).otherwise(0L))
    j.groupBy("source", "n_s", "n_r").agg(
        sum(col("c") * col("l6p")).as("s1"),
        sum(col("r") * col("l6q")).as("s2"),
        sum(col("r")).as("rsum"))
      .select(col("source"), col("n_s"),
        round((col("s1").cast("double") / col("n_s").cast("double") +
          (col("s2").cast("double") + lit(693147.0) *
            (col("n_r") - col("rsum")).cast("double")) /
            col("n_r").cast("double")) / 2e6, 6).as("jsd6"))
      .orderBy("source")
  }

  val jsDivergenceSql: String =
    s"""WITH toks AS (SELECT source, unnest($ToksSql) AS tok FROM documents),
       |st AS MATERIALIZED (
       |  SELECT source, tok, count(*)::BIGINT AS c FROM toks
       |  WHERE tok <> '' GROUP BY 1, 2),
       |tot AS (SELECT tok, sum(c)::BIGINT AS t FROM st GROUP BY 1),
       |ns AS (SELECT source, sum(c)::BIGINT AS n_s FROM st GROUP BY 1),
       |na AS (SELECT sum(c)::BIGINT AS n_all FROM st),
       |j AS (
       |  SELECT st.source, st.c, tot.t - st.c AS r, ns.n_s,
       |    na.n_all - ns.n_s AS n_r,
       |    st.c * (na.n_all - ns.n_s) + (tot.t - st.c) * ns.n_s AS d
       |  FROM st JOIN tot USING (tok) JOIN ns USING (source), na),
       |l AS (
       |  SELECT source, n_s, n_r, c, r,
       |    round(ln((2 * c * n_r)::DOUBLE / d::DOUBLE) * 1e6)::BIGINT AS l6p,
       |    CASE WHEN r > 0 THEN
       |      round(ln((2 * r * n_s)::DOUBLE / d::DOUBLE) * 1e6)::BIGINT
       |    ELSE 0 END AS l6q
       |  FROM j),
       |a AS (
       |  SELECT source, n_s, n_r, sum(c * l6p)::BIGINT AS s1,
       |    sum(r * l6q)::BIGINT AS s2, sum(r)::BIGINT AS rsum
       |  FROM l GROUP BY 1, 2, 3)
       |SELECT source, n_s,
       |  round((s1::DOUBLE / n_s::DOUBLE +
       |    (s2::DOUBLE + 693147.0 * (n_r - rsum)::DOUBLE) / n_r::DOUBLE)
       |    / 2e6, 6) AS jsd6
       |FROM a ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q263

  /** ANN index occupancy drift (q263): the [[graft.llm.AnnIndex]]
    * retrain guard run through the correctness gate. The first 350
    * vectors play the build-time corpus (they contain the first-16
    * frozen model, so build and serve assign with the SAME centroids —
    * the q50-verified 6-dp rule); the full fixture plays the drifted
    * serving state. Per cell: build/now counts, 6-dp occupancy shares,
    * absolute share drift, and the retrain flag at threshold 0.1 —
    * computed by the SAME [[graft.llm.AnnIndex.driftFrom]] arithmetic
    * the persisted-index guard uses, so what the oracle hash-verifies
    * here IS what a deployment trusts. Counts only — no vector math
    * after the one assignment pass. */
  val annDrift: Q = (s, dir) => {
    val emb = Tables.t(s, dir, "embeddings")
    val base = emb.filter(col("vec_id") < 350)
    val cents = Similarity.firstNCentroids(base, 16)
    val assigned = emb
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .transform(Similarity.assignCells(_, cents, "v"))
      .localCheckpoint(true)
    graft.llm.AnnIndex.driftFrom(
      assigned.filter(col("id") < 350).groupBy("cell")
        .agg(count(lit(1)).as("n_build")),
      assigned.groupBy("cell").agg(count(lit(1)).as("n_now")))
  }

  val annDriftSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |b0 AS (SELECT id, v FROM v WHERE id < 350),
      |cent AS (SELECT id AS cell, v AS cv FROM b0
      |         WHERE id IN (SELECT id FROM b0 ORDER BY id LIMIT 16)),
      |assigned AS MATERIALIZED (
      |  SELECT id, cell FROM (
      |    SELECT v.id, c.cell,
      |      row_number() OVER (PARTITION BY v.id
      |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC,
      |                 c.cell ASC) AS ark
      |    FROM v CROSS JOIN cent c) WHERE ark = 1),
      |b AS (SELECT cell, count(*)::BIGINT AS n_build FROM assigned
      |      WHERE id < 350 GROUP BY 1),
      |n AS (SELECT cell, count(*)::BIGINT AS n_now FROM assigned GROUP BY 1),
      |t AS (SELECT (SELECT sum(n_build) FROM b)::BIGINT AS tb,
      |             (SELECT sum(n_now) FROM n)::BIGINT AS tn),
      |j AS (SELECT coalesce(b.cell, n.cell) AS cell,
      |        coalesce(n_build, 0)::BIGINT AS n_build,
      |        coalesce(n_now, 0)::BIGINT AS n_now
      |      FROM b FULL OUTER JOIN n ON b.cell = n.cell),
      |sh AS (SELECT cell, n_build, n_now,
      |        round(n_build::DOUBLE / tb, 6) AS share_build6,
      |        round(n_now::DOUBLE / tn, 6) AS share_now6
      |      FROM j, t)
      |SELECT cell, n_build, n_now, share_build6, share_now6,
      |  round(abs(share_now6 - share_build6), 6) AS drift6,
      |  round(abs(share_now6 - share_build6), 6) > 0.1 AS retrain
      |FROM sh ORDER BY cell""".stripMargin

  // -------------------------------------------------------------- q269

  /** nDCG@10 of the IVF search against brute-force truth (q269):
    * completes the retrieval-eval battery — recall@5 (q194) counts hits,
    * RBO (q255) and Kendall τ (q256) compare orderings, nDCG weights
    * hits by POSITION, the metric an actual search team reports. The
    * log2 discount table is ten integer micro-constants computed once
    * in Scala and embedded verbatim in the oracle (zero libm-portability
    * surface — the BpeKernel embed-the-model discipline), so the DCG
    * sums are exact BIGINTs and the one float op is the final
    * DCG/IDCG division. Truth leg is the bounded eval-sample
    * brute-force (q194's contract: queries × corpus with broadcast
    * queries, an EVAL harness, never a serving path); the IVF leg is
    * the q50 serving plan. */
  val ndcgEval: Q = (s, dir) => {
    val k = 10
    val d6 = Seq.tabulate(k)(i =>
      math.round(1e6 / (math.log(i + 2) / math.log(2))))
    val idcg = d6.sum
    val emb = Tables.t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(q, emb, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.ivfTopK(q, emb, k)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
    val scored = approx
      .join(truth.withColumn("rel", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .withColumn("d6", element_at(typedLit(d6), col("rk").cast("int")))
      .groupBy("query_id").agg(
        sum(when(col("rel").isNotNull, col("d6")).otherwise(0L)).as("dcg6"),
        sum(when(col("rel").isNotNull, 1L).otherwise(0L)).cast("int")
          .as("n_hit"))
    q.select(col("vec_id").as("query_id"))
      .join(scored, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0)).as("n_hit"),
        coalesce(col("dcg6"), lit(0L)).as("dcg6"),
        round(coalesce(col("dcg6"), lit(0L)).cast("double") /
          lit(idcg.toDouble), 6).as("ndcg6"))
      .orderBy("query_id")
  }

  /** Shared WITH-prefix of the retrieval-eval oracles (q269 nDCG, q275
    * MRR): DuckDB replay of [[Similarity.ivfTopK]] (16 first-N
    * centroids, 4 probes) and [[Similarity.bruteForceTopK]] truth for
    * the vec_id < 10 query set, ending in CTEs `ivf(query_id,
    * neighbor_id, rk)` and `bf(query_id, neighbor_id)`. */
  private val AnnEvalCtes: String =
    s"""v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT id AS cell, v AS cv FROM v
       |         WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
       |assigned AS (
       |  SELECT id, v, cell FROM (
       |    SELECT v.id, v.v, c.cell,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY round(list_cosine_similarity(v.v, c.cv), 6) DESC,
       |                 c.cell ASC) AS ark
       |    FROM v CROSS JOIN cent c) WHERE ark = 1),
       |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |      FROM embeddings WHERE vec_id < 10),
       |probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC,
       |                 c.cell ASC) AS crk
       |    FROM q CROSS JOIN cent c) WHERE crk <= 4),
       |ivf_scored AS (
       |  SELECT DISTINCT p.query_id, a.id AS neighbor_id,
       |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
       |  FROM probes p JOIN assigned a ON p.cell = a.cell
       |  WHERE p.query_id <> a.id),
       |ivf AS (
       |  SELECT query_id, neighbor_id, rk FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rk
       |    FROM ivf_scored) WHERE rk <= 10),
       |bf_scored AS (
       |  SELECT q.query_id, v.id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv, v.v), 4) AS sim
       |  FROM v CROSS JOIN q WHERE v.id <> q.query_id),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rk
       |    FROM bf_scored) WHERE rk <= 10)""".stripMargin

  val ndcgEvalSql: String = {
    val d6 = Seq.tabulate(10)(i =>
      math.round(1e6 / (math.log(i + 2) / math.log(2))))
    val dt = d6.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
    val idcg = d6.sum
    s"""WITH $AnnEvalCtes,
       |dt(rk, d6) AS (VALUES $dt),
       |sc AS (
       |  SELECT i.query_id,
       |    sum(CASE WHEN b.neighbor_id IS NOT NULL THEN dt.d6 ELSE 0 END)::BIGINT AS dcg6,
       |    sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::INT AS n_hit
       |  FROM ivf i JOIN dt ON dt.rk = i.rk
       |  LEFT JOIN bf b ON b.query_id = i.query_id
       |    AND b.neighbor_id = i.neighbor_id
       |  GROUP BY 1)
       |SELECT qq.query_id, coalesce(n_hit, 0)::INT AS n_hit,
       |  coalesce(dcg6, 0)::BIGINT AS dcg6,
       |  round(coalesce(dcg6, 0)::DOUBLE / $idcg.0, 6) AS ndcg6
       |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) qq
       |LEFT JOIN sc USING (query_id)
       |ORDER BY query_id""".stripMargin
  }

  // -------------------------------------------------------------- q275

  /** MRR@10 retrieval eval (q275): q269's companion number — per query,
    * the rank of the FIRST true top-10 neighbor the IVF index returns,
    * and its reciprocal-rank credit. Mirrors the nDCG harness exactly
    * (same [[Similarity.ivfTopK]] candidates vs
    * [[Similarity.bruteForceTopK]] truth, same bounded eval set); the
    * reciprocal table ⌊10⁶/rank⌉ for ranks 1–10 is computed once on the
    * driver and embedded verbatim in both engines, so the metric is
    * exact-BIGINT end to end — zero runtime division. Queries whose
    * IVF list contains no true neighbor score first_rk = 0, rr6 = 0
    * (the miss shows up instead of vanishing). */
  val mrrEval: Q = (s, dir) => {
    val k = 10
    val r6 = Seq.tabulate(k)(i => math.round(1e6 / (i + 1).toDouble))
    val emb = Tables.t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(q, emb, k)
      .select(col("query_id"), col("neighbor_id"))
    val firstHit = Similarity.ivfTopK(q, emb, k)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
      .join(truth, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(min("rk").cast("int").as("first_rk"))
    q.select(col("vec_id").as("query_id"))
      .join(firstHit, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("first_rk"), lit(0)).as("first_rk"),
        coalesce(element_at(typedLit(r6), col("first_rk")), lit(0L))
          .as("rr6"))
      .orderBy("query_id")
  }

  val mrrEvalSql: String = {
    val r6 = Seq.tabulate(10)(i => math.round(1e6 / (i + 1).toDouble))
    val rt = r6.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
    s"""WITH $AnnEvalCtes,
       |rt(rk, r6) AS (VALUES $rt),
       |fh AS (
       |  SELECT i.query_id, min(i.rk)::INT AS first_rk
       |  FROM ivf i JOIN bf b ON b.query_id = i.query_id
       |    AND b.neighbor_id = i.neighbor_id
       |  GROUP BY 1)
       |SELECT qq.query_id, coalesce(first_rk, 0)::INT AS first_rk,
       |  coalesce(rt.r6, 0)::BIGINT AS rr6
       |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) qq
       |LEFT JOIN fh USING (query_id)
       |LEFT JOIN rt ON rt.rk = fh.first_rk
       |ORDER BY query_id""".stripMargin
  }

  // -------------------------------------------------------------- q277

  /** Distinct-n diversity (q277): per source, the distinct-1 and
    * distinct-2 ratios (unique unigrams / total unigrams, unique
    * bigrams / total bigrams) — the standard lexical-diversity metric
    * for spotting templated, looping, or machine-duplicated text
    * (near-0 distinct-2 = the same phrases over and over; LLM-output
    * eval uses the same statistic). Token/bigram explosion is map-side;
    * the two exact count-distinct aggregates shuffle on (source, gram);
    * ratios are half-away integer DIV at 4 dp. */
  val distinctN: Q = (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("source"), TextOps.tokens(col("text")).as("toks"))
    val uni = d.select(col("source"), explode(col("toks")).as("g"))
      .filter(col("g") =!= "")
      .groupBy("source")
      .agg(count(lit(1)).as("u_tot"), countDistinct("g").as("u_d"))
    val big = d.select(col("source"), explode(expr(
        "filter(transform(toks, (x, i) -> IF(i < size(toks) - 1, " +
        "concat(x, ' ', element_at(toks, i + 2)), NULL)), " +
        "x -> x IS NOT NULL)")).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("b_tot"), countDistinct("g").as("b_d"))
    uni.join(big, Seq("source"), "left")
      .na.fill(0L, Seq("b_tot", "b_d"))
      .select(col("source"), col("u_tot"), col("u_d"),
        col("b_tot"), col("b_d"),
        (expr("(u_d * 20000 + u_tot) DIV (2 * u_tot)").cast("double") /
          10000.0).as("distinct1_4"),
        (expr("CASE WHEN b_tot = 0 THEN NULL ELSE " +
          "(b_d * 20000 + b_tot) DIV (2 * b_tot) END").cast("double") /
          10000.0).as("distinct2_4"))
      .orderBy("source")
  }

  val distinctNSql: String =
    s"""WITH d AS (SELECT source, $ToksSql AS toks FROM documents),
       |uni AS (
       |  SELECT source, count(*)::BIGINT AS u_tot,
       |    count(DISTINCT g)::BIGINT AS u_d
       |  FROM (SELECT source, unnest(toks) AS g FROM d) WHERE g <> ''
       |  GROUP BY 1),
       |big AS (
       |  SELECT source, count(*)::BIGINT AS b_tot,
       |    count(DISTINCT g)::BIGINT AS b_d
       |  FROM (SELECT source,
       |          unnest([toks[i] || ' ' || toks[i+1]
       |                  for i in range(1, len(toks))]) AS g
       |        FROM d)
       |  GROUP BY 1)
       |SELECT uni.source, u_tot, u_d,
       |  coalesce(b_tot, 0)::BIGINT AS b_tot,
       |  coalesce(b_d, 0)::BIGINT AS b_d,
       |  ((u_d * 20000 + u_tot) // (2 * u_tot))::DOUBLE / 10000.0
       |    AS distinct1_4,
       |  (CASE WHEN coalesce(b_tot, 0) = 0 THEN NULL ELSE
       |    (b_d * 20000 + b_tot) // (2 * b_tot) END)::DOUBLE / 10000.0
       |    AS distinct2_4
       |FROM uni LEFT JOIN big ON uni.source = big.source
       |ORDER BY uni.source""".stripMargin

  // -------------------------------------------------------------- q288

  /** Readability scoring + grade gate (q288): a Flesch-style proxy
    * score = 206.835 − 1.015·(words/sentence) − 8.46·(chars/word)
    * (chars-per-word standing in for syllables-per-word — the standard
    * syllable-free adaptation) with a five-band grade label — the
    * audience-targeting curation gate published pipelines run next to
    * quality scores. The whole score is EXACT integer arithmetic: with
    * M = 206835·s·w − 1015·w² − 8460·c·s the 2-dp score is the
    * half-away integer quotient M/(10·s·w) — no float ratio ever
    * rounds (the q258 knife-edge lesson, applied per doc at corpus
    * scale where boundary hits are guaranteed eventually). One codegen
    * scan projection; no shuffle beyond the presentation sort. */
  val readability: Q = (s, dir) =>
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        TextOps.tokens(col("text")).as("toks"))
      .withColumn("w",
        greatest(expr("size(filter(toks, x -> x != ''))"), lit(1))
          .cast("long"))
      .withColumn("sn",
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long"))
      .withColumn("c", length(col("text")).cast("long"))
      .withColumn("m",
        lit(206835L) * col("sn") * col("w") - lit(1015L) * col("w") * col("w") -
          lit(8460L) * col("c") * col("sn"))
      .withColumn("den", lit(10L) * col("sn") * col("w"))
      .withColumn("s2", expr(
        "CASE WHEN m >= 0 THEN (m * 2 + den) DIV (2 * den) " +
        "ELSE -((-m * 2 + den) DIV (2 * den)) END"))
      .select(col("doc_id"), col("w").as("n_words"),
        col("sn").as("n_sentences"),
        (col("s2").cast("double") / 100.0).as("score2"),
        when(col("s2") >= 9000, "very_easy")
          .when(col("s2") >= 7000, "easy")
          .when(col("s2") >= 5000, "standard")
          .when(col("s2") >= 3000, "difficult")
          .otherwise("very_difficult").as("grade"))
      .orderBy("doc_id")

  val readabilitySql: String =
    s"""WITH b AS (
       |  SELECT doc_id,
       |    greatest(len(list_filter($ToksSql, x -> x <> '')), 1)::BIGINT
       |      AS w,
       |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
       |      AS sn,
       |    length(text)::BIGINT AS c
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, w, sn,
       |    206835 * sn * w - 1015 * w * w - 8460 * c * sn AS m,
       |    10 * sn * w AS den
       |  FROM b),
       |s AS (
       |  SELECT doc_id, w, sn,
       |    (CASE WHEN m >= 0 THEN (m * 2 + den) // (2 * den)
       |          ELSE -((-m * 2 + den) // (2 * den)) END)::BIGINT AS s2
       |  FROM m)
       |SELECT doc_id, w AS n_words, sn AS n_sentences,
       |  s2::DOUBLE / 100.0 AS score2,
       |  CASE WHEN s2 >= 9000 THEN 'very_easy'
       |       WHEN s2 >= 7000 THEN 'easy'
       |       WHEN s2 >= 5000 THEN 'standard'
       |       WHEN s2 >= 3000 THEN 'difficult'
       |       ELSE 'very_difficult' END AS grade
       |FROM s ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q291

  /** Pseudo-relevance-feedback query expansion (q291): run q191's BM25
    * for the fixed query, take the top-10 documents, and rank the
    * candidate expansion terms inside them by Σtf · idf — the classic
    * PRF/RM1 step between first-pass retrieval and the re-query. The
    * idf of each candidate is micro-quantized (round(ln(N/df)·10⁶),
    * the q246 discipline) before the exact tf-weighted BIGINT sum, so
    * the ranking is order-free; query terms and stopwords are excluded;
    * corpus df is computed only for the candidate terms via one
    * semi-joined aggregate. Output: top-5 expansion terms with their
    * in-feedback tf, corpus df, and score. */
  val prfExpansion: Q = (s, dir) => {
    val qTerms = Seq("vector", "spark", "customer")
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        col("toks")).localCheckpoint(true)
    val stats = d.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val top10 = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) * (col("dl") * col("n_docs") / col("sum_dl")))))
      .groupBy("doc_id").agg(round(sum("contrib"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(10)
      .select("doc_id").localCheckpoint(true)
    val cand = d.join(broadcast(top10), "doc_id")
      .select(explode(col("toks")).as("term"))
      .filter(col("term") =!= "" && !col("term").isin(qTerms: _*) &&
        !col("term").isin(TextOps.StopEn: _*))
      .groupBy("term").agg(count(lit(1)).as("tf_sel"))
      .localCheckpoint(true)
    val dfAll = d.select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(cand.select("term")), "term")
      .select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    cand.join(dfAll, "term").crossJoin(broadcast(stats))
      .withColumn("idf6",
        round(log(col("n_docs").cast("double") / col("df").cast("double")) * 1e6)
          .cast("long"))
      .select(col("term"), col("tf_sel"), col("df"),
        (col("tf_sel") * col("idf6")).as("score6"))
      .orderBy(col("score6").desc, col("term").asc).limit(5)
  }

  val prfExpansionSql: String = {
    val stop = TextOps.StopEn.mkString("('", "', '", "')")
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |d AS MATERIALIZED (
       |  SELECT doc_id, len(toks)::BIGINT AS dl, toks FROM t),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
       |  WHERE term IN ('vector', 'spark', 'customer')
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |top10 AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      round(sum(
       |        ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
       |        (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl * n_docs / sum_dl)))), 4)
       |        AS score
       |    FROM tf JOIN df USING (term) CROSS JOIN stats
       |    GROUP BY doc_id)
       |  ORDER BY score DESC, doc_id ASC LIMIT 10),
       |cand AS MATERIALIZED (
       |  SELECT term, count(*)::BIGINT AS tf_sel FROM (
       |    SELECT unnest(toks) AS term
       |    FROM d JOIN top10 USING (doc_id))
       |  WHERE term <> '' AND term NOT IN ('vector', 'spark', 'customer')
       |    AND term NOT IN $stop
       |  GROUP BY 1),
       |dfall AS (
       |  SELECT term, count(*)::BIGINT AS df FROM (
       |    SELECT DISTINCT term, doc_id FROM (
       |      SELECT doc_id, unnest(toks) AS term FROM d)
       |    WHERE term IN (SELECT term FROM cand))
       |  GROUP BY 1)
       |SELECT term, tf_sel, df,
       |  (tf_sel * round(ln(n_docs::DOUBLE / df::DOUBLE) * 1e6)::BIGINT)
       |    ::BIGINT AS score6
       |FROM cand JOIN dfall USING (term) CROSS JOIN stats
       |ORDER BY score6 DESC, term ASC LIMIT 5""".stripMargin
  }

  // -------------------------------------------------------------- q296

  /** PQ reconstruction-error audit (q296): how much signal does q78's
    * product quantizer destroy — per vector, the self-ADC against its
    * own codes (Σ_blocks min-centroid distance = exact reconstruction
    * error of the compressed representation), aggregated to corpus
    * mean/max plus the count of exactly-representable vectors (codebook
    * members reconstruct to 0). Per-vector errors quantize to 1e-4
    * integers before the sums (order-free); encode and score are the
    * same map-side kernels the serving path uses, so the audit measures
    * the production index, not a replica. */
  val pqReconError: Q = (s, dir) => {
    val m = 8
    val emb = Tables.t(s, dir, "embeddings")
    val cb = Similarity.firstNCentroids(emb, 16)
    val ids = cb.map(_._1); val cents = cb.map(_._2)
    emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("codes",
        graft.functions.VectorOps.pqEncode(col("v"), ids, cents, m))
      .withColumn("e4",
        round(round(graft.functions.VectorOps.pqAdc(
          col("v"), col("codes"), ids, cents, m), 4) * 1e4).cast("long"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("e4") === 0, 1L).otherwise(0L)).as("n_exact"),
        sum("e4").as("se4"), max("e4").as("mx4"))
      .select(col("n_vectors"), col("n_exact"),
        (expr("(se4 * 2 + n_vectors) DIV (2 * n_vectors)").cast("double")
          / 1e4).as("mean_err4"),
        (col("mx4").cast("double") / 1e4).as("max_err4"))
  }

  val pqReconErrorSql: String = {
    val vDist = pqBlockDistSql("v.embedding", "cb.cv")
    s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings),
       |cb AS (SELECT id AS code, embedding AS cv FROM v
       |       WHERE id IN (SELECT id FROM v ORDER BY id LIMIT 16)),
       |blocks AS (SELECT unnest(range(8)) AS b),
       |bd AS (
       |  SELECT v.id, cb.code, b.b AS b, round($vDist, 6) AS d2
       |  FROM v CROSS JOIN cb CROSS JOIN blocks b),
       |mind AS (SELECT id, b, min(d2) AS md FROM bd GROUP BY 1, 2),
       |pv AS (
       |  SELECT id,
       |    max(CASE WHEN b = 0 THEN md END) AS d0,
       |    max(CASE WHEN b = 1 THEN md END) AS d1,
       |    max(CASE WHEN b = 2 THEN md END) AS d2,
       |    max(CASE WHEN b = 3 THEN md END) AS d3,
       |    max(CASE WHEN b = 4 THEN md END) AS d4,
       |    max(CASE WHEN b = 5 THEN md END) AS d5,
       |    max(CASE WHEN b = 6 THEN md END) AS d6,
       |    max(CASE WHEN b = 7 THEN md END) AS d7
       |  FROM mind GROUP BY 1),
       |e AS (
       |  SELECT id,
       |    round(round(d0 + d1 + d2 + d3 + d4 + d5 + d6 + d7, 4) * 1e4)
       |      ::BIGINT AS e4
       |  FROM pv)
       |SELECT count(*)::BIGINT AS n_vectors,
       |  sum(CASE WHEN e4 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       |  ((sum(e4) * 2 + count(*)) // (2 * count(*)))::DOUBLE / 1e4
       |    AS mean_err4,
       |  max(e4)::DOUBLE / 1e4 AS max_err4
       |FROM e""".stripMargin
  }

  // -------------------------------------------------------------- q297

  /** Language-ID confusion matrix (q297): q38's n-gram/stopword
    * heuristic evaluated against the corpus's labeled `lang` column —
    * (true, predicted) counts plus each cell's share of its true-lang
    * row as a half-away 4-dp integer quotient. The diagonal is the
    * per-language recall; off-diagonal mass says which stopword lists
    * collide. One scan + one bounded (langs²) aggregate. */
  val langConfusion: Q = (s, dir) => {
    val cell = Tables.t(s, dir, "documents")
      .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val rowTot = cell.groupBy("lang").agg(sum("n").as("nt"))
    cell.join(broadcast(rowTot), "lang")
      .withColumn("row_frac4",
        expr("(n * 20000 + nt) DIV (2 * nt)").cast("double") / 10000.0)
      .select(col("lang"), col("lang_pred"), col("n"), col("row_frac4"))
      .orderBy("lang", "lang_pred")
  }

  val langConfusionSql: String = {
    def hits(lst: Seq[String]) =
      s"len(list_filter($ToksSql, t -> list_contains(${lst.mkString("['", "', '", "']")}, t)))"
    val en = hits(TextOps.StopEn); val de = hits(TextOps.StopDe)
    val fr = hits(TextOps.StopFr); val es = hits(TextOps.StopEs)
    s"""WITH p AS (
       |  SELECT lang,
       |    CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |         WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       |         WHEN $de >= $fr AND $de >= $es THEN 'de'
       |         WHEN $fr >= $es THEN 'fr'
       |         ELSE 'es' END AS lang_pred
       |  FROM documents),
       |cell AS (
       |  SELECT lang, lang_pred, count(*)::BIGINT AS n FROM p GROUP BY 1, 2),
       |rt AS (SELECT lang, sum(n)::BIGINT AS nt FROM cell GROUP BY 1)
       |SELECT lang, lang_pred, n,
       |  ((n * 20000 + nt) // (2 * nt))::DOUBLE / 10000.0 AS row_frac4
       |FROM cell JOIN rt USING (lang)
       |ORDER BY lang, lang_pred""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q275_mrr_eval" -> mrrEval,
    "q277_distinct_n" -> distinctN,
    "q288_readability" -> readability,
    "q291_prf_expansion" -> prfExpansion,
    "q296_pq_recon_error" -> pqReconError,
    "q297_lang_confusion" -> langConfusion,
    "q269_ndcg_eval" -> ndcgEval,
    "q262_js_divergence" -> jsDivergence,
    "q263_ann_drift" -> annDrift,
    "q261_pca_power" -> pcaTopComponent,
    "q229_source_profile_sim" -> sourceProfileSim,
    "q255_rbo_agreement" -> rboAgreement,
    "q256_kendall_tau" -> kendallTau,
    "q252_phrase_search" -> phraseSearch,
    "q233_rrf_fusion" -> rrfFusion,
    "q240_silhouette" -> silhouette,
    "q30_dedup_exact" -> dedupExact,
    "q31_doc_fingerprint" -> docFingerprint,
    "q67_partial_dup_aligned" -> partialDupAligned,
    "q68_label_centroids" -> labelCentroids,
    "q32_dedup_minhash_lsh" -> dedupMinhash,
    "q177_incremental_neardup" -> incrementalNearDup,
    "q209_indexed_neardup" -> indexedNearDup,
    "q33_dedup_simhash" -> dedupSimhash,
    "q182_dup_spans" -> dupSpans,
    "q190_ngram_novelty" -> ngramNovelty,
    "q34_ann_topk" -> annTopK,
    "q35_emb_neardup" -> embNearDup,
    "q181_semdedup" -> semDedup,
    "q183_semantic_decontam" -> semanticDecontam,
    "q36_ann_lsh" -> annLsh,
    "q304_srp_quantized" -> annLshQuantized,
    "q305_srp_tolerant" -> annLshTolerant,
    "q306_srp_tolerant_cross" -> annLshTolerantCross,
    "q307_srp_tolerant_indexed" -> annLshTolerantIndexed,
    "q50_ann_ivf" -> annIvf,
    "q78_ann_pq" -> annPq,
    "q79_ann_ivfpq" -> annIvfPq,
    "q185_trunc_rerank" -> annTruncRerank,
    "q86_hybrid_search" -> hybridSearch,
    "q191_bm25_topk" -> bm25TopK,
    "q194_ann_recall" -> annRecall,
    "q208_ann_trained_recall" -> annTrainedRecall,
    "q196_containment_dup" -> containmentDup,
    "q199_dup_histogram" -> dupHistogram,
    "q201_minhash_calibration" -> minhashCalibration,
    "q197_emb_covariance" -> embCovariance,
    "q207_emb_covariance_accum" -> embCovarianceAccum,
    "q53_ngram_jaccard" -> ngramJaccard,
    "q56_dedup_clusters" -> dedupClusters,
    "q178_cc_alternating" -> dedupClustersAlt,
    "q59_corpus_filter" -> corpusFilter,
    "q37_emb_stats" -> embStats,
    "q38_lang_id" -> langId,
    "q39_quality_score" -> qualityScore,
    "q40_token_count" -> tokenCount,
    "q205_bpe_subwords" -> bpeSubwordStats,
    "q210_bpe_vocab" -> bpeVocab,
    "q215_bpe_fertility" -> bpeFertility,
  )

  val oracleSql: Map[String, String] = Map(
    "q261_pca_power" -> pcaTopComponentSql,
    "q262_js_divergence" -> jsDivergenceSql,
    "q263_ann_drift" -> annDriftSql,
    "q269_ndcg_eval" -> ndcgEvalSql,
    "q275_mrr_eval" -> mrrEvalSql,
    "q277_distinct_n" -> distinctNSql,
    "q288_readability" -> readabilitySql,
    "q291_prf_expansion" -> prfExpansionSql,
    "q296_pq_recon_error" -> pqReconErrorSql,
    "q297_lang_confusion" -> langConfusionSql,
    "q229_source_profile_sim" -> sourceProfileSimSql,
    "q233_rrf_fusion" -> rrfFusionSql,
    "q240_silhouette" -> silhouetteSql,
    "q252_phrase_search" -> phraseSearchSql,
    "q255_rbo_agreement" -> rboAgreementSql,
    "q256_kendall_tau" -> kendallTauSql,
    "q30_dedup_exact" -> dedupExactSql,
    "q31_doc_fingerprint" -> docFingerprintSql,
    "q67_partial_dup_aligned" -> partialDupAlignedSql,
    "q68_label_centroids" -> labelCentroidsSql,
    "q32_dedup_minhash_lsh" -> dedupMinhashSql,
    "q177_incremental_neardup" -> incrementalNearDupSql,
    "q209_indexed_neardup" -> incrementalNearDupSql,
    "q33_dedup_simhash" -> dedupSimhashSql,
    "q182_dup_spans" -> dupSpansSql,
    "q190_ngram_novelty" -> ngramNoveltySql,
    "q36_ann_lsh" -> annLshSql,
    "q304_srp_quantized" -> annLshQuantizedSql,
    "q305_srp_tolerant" -> annLshTolerantSql,
    "q306_srp_tolerant_cross" -> annLshTolerantCrossSql,
    "q307_srp_tolerant_indexed" -> annLshTolerantIndexedSql,
    "q50_ann_ivf" -> annIvfSql,
    "q78_ann_pq" -> annPqSql,
    "q79_ann_ivfpq" -> annIvfPqSql,
    "q185_trunc_rerank" -> annTruncRerankSql,
    "q86_hybrid_search" -> hybridSearchSql,
    "q191_bm25_topk" -> bm25TopKSql,
    "q194_ann_recall" -> annRecallSql,
    "q208_ann_trained_recall" -> annTrainedRecallSql,
    "q196_containment_dup" -> containmentDupSql,
    "q199_dup_histogram" -> dupHistogramSql,
    "q201_minhash_calibration" -> minhashCalibrationSql,
    "q197_emb_covariance" -> embCovarianceSql,
    "q207_emb_covariance_accum" -> embCovarianceSql,
    "q34_ann_topk" -> annTopKSql,
    "q181_semdedup" -> semDedupSql,
    "q183_semantic_decontam" -> semanticDecontamSql,
    "q53_ngram_jaccard" -> ngramJaccardSql,
    "q56_dedup_clusters" -> dedupClustersSql,
    "q178_cc_alternating" -> dedupClustersSql,
    "q59_corpus_filter" -> corpusFilterSql,
    "q35_emb_neardup" -> embNearDupSql,
    "q37_emb_stats" -> embStatsSql,
    "q38_lang_id" -> langIdSql,
    "q39_quality_score" -> qualityScoreSql,
    "q40_token_count" -> tokenCountSql,
    "q205_bpe_subwords" -> bpeSubwordStatsSql,
    "q210_bpe_vocab" -> bpeVocabSql,
    "q215_bpe_fertility" -> bpeFertilitySql,
  )
}
