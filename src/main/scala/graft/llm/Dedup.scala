package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for 100 TB-scale corpora.
  *
  * All three avoid the O(n²) all-pairs comparison: exact dedup is a hash
  * aggregate; MinHash-LSH and SimHash generate candidates by bucket
  * self-join (shuffle keyed on band/block hash — each bucket is small, so
  * the join is local and skew-free for natural corpora), then verify only
  * the candidates. Published designs: Broder 1997 (MinHash), Leskovec et
  * al. MMDS ch.3 (banding), Charikar 2002 (SimHash); see PAPERS.md.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest doc_id
    * as canonical. One map-side-combinable shuffle on the 128-bit hash. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature as array<bigint>: perm i = min over shingles of
    * xxhash64(shingle, i). numPerms passes over the shingle array, all
    * map-side (no shuffle); for very wide signatures a single-pass custom
    * Expression would cut constant factors, not complexity. */
  def minhashSignature(shingles: Column, numPerms: Int): Column =
    array((0 until numPerms).map(i =>
      array_min(transform(shingles, sh => xxhash64(sh, lit(i))))): _*)

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → 128-perm signature → `bands` bands of
    * `rowsPerBand` hashes → explode to (band, bandHash, id) → self-join on
    * the band bucket (candidate generation) → exact-Jaccard verification
    * of candidates only. With b=32, r=4 the LSH catch probability at
    * j=0.8 is 1-(1-0.8^4)^32 ≈ 1-1e-7, so post-verification output equals
    * the brute-force truth with near certainty (the DuckDB oracle computes
    * the brute-force version).
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b. */
  def minhashLsh(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                 shingleK: Int = 3, bands: Int = 32, rowsPerBand: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), TextOps.wordShingles(col(textCol), shingleK).as("shingles"))
      .filter(size(col("shingles")) > 0)

    val sig = sh.select(col("id"), col("shingles"),
      minhashSignature(col("shingles"), bands * rowsPerBand).as("sig"))

    val banded = sig.select(col("id"), col("shingles"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))): _*))
          .as("bb"))
      .select(col("id"), col("shingles"), col("bb.band"), col("bb.bh"))

    val l = banded.select(col("band"), col("bh"), col("id").as("doc_a"), col("shingles").as("sh_a"))
    val r = banded.select(col("band"), col("bh"), col("id").as("doc_b"), col("shingles").as("sh_b"))
    val cand = l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")

    cand
      .select(col("doc_a"), col("doc_b"),
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprint of the token multiset: bit k of the
    * fingerprint is the sign of Σ_tokens (±1 by bit k of xxhash64(token)).
    * Returned as array of 4 × 16-bit block values (int), which is both the
    * LSH blocking key material and a compact fingerprint encoding. */
  def simhashBlocks(text: Column): Column = {
    val toks = TextOps.tokens(text)
    // per-bit vote: fold tokens into a ±1 sum for each of the 64 bits
    // (bit index is a Scala literal so shiftright stays a static shift)
    val bits = (0 until 64).map { k =>
      val vote = aggregate(toks, lit(0L), (acc, tk) =>
        acc + when(shiftright(xxhash64(tk), k).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, 1L).otherwise(0L)
    }
    // 4 blocks × 16 bits, each folded into a long block value
    array((0 until 4).map(b =>
      bits.slice(b * 16, b * 16 + 16).reduce((a, x) => a * 2 + x)): _*)
  }

  /** SimHash near-duplicate pairs: candidates share at least one of the 4
    * 16-bit blocks (catches all pairs with Hamming distance ≤ 3 by
    * pigeonhole); verified by exact Hamming distance over the 64 bits.
    * Returns (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(col(idCol).as("id"), simhashBlocks(col(textCol)).as("blocks"))

    val banded = fp.select(col("id"), col("blocks"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"), element_at(col("blocks"), b + 1).as("bv")))).as("bb"))
      .select(col("id"), col("blocks"), col("bb.band"), col("bb.bv"))

    val l = banded.select(col("band"), col("bv"), col("id").as("doc_a"), col("blocks").as("bl_a"))
    val r = banded.select(col("band"), col("bv"), col("id").as("doc_b"), col("blocks").as("bl_b"))
    val ham = bitCount(element_at(col("bl_a"), 1).bitwiseXOR(element_at(col("bl_b"), 1))) +
      bitCount(element_at(col("bl_a"), 2).bitwiseXOR(element_at(col("bl_b"), 2))) +
      bitCount(element_at(col("bl_a"), 3).bitwiseXOR(element_at(col("bl_b"), 3))) +
      bitCount(element_at(col("bl_a"), 4).bitwiseXOR(element_at(col("bl_b"), 4)))

    l.join(r, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), ham.cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  private def bitCount(c: Column): Column = bit_count(c)
}
