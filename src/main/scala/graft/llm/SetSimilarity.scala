package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08). This is
  * the EXACT counterpart to [[Dedup.minhashLsh]]'s approximate candidate
  * generation over the same shingle space: instead of banded MinHash
  * buckets, candidates are pairs whose *prefixes* (the globally rarest
  * tokens of each set) intersect, which provably loses no qualifying
  * pair. No reference analog — hive-io stops at table I/O
  * (hive-io-exp-core/src/main/java/com/facebook/hiveio/input/HiveInput.java:66).
  *
  * Scale shape (the reason to prefer this over an O(n²) join at 100 TB):
  *  - one shuffle to compute global token document frequencies;
  *  - one shuffle to re-sort each set rarest-token-first;
  *  - the candidate join's fan-out is Σ_tok df_prefix(tok)², bounded by
  *    construction because prefixes keep only each set's RAREST tokens
  *    (a stopword shared by millions of docs lands in almost no
  *    prefixes, so it never becomes a join key hot spot);
  *  - verification touches candidates only, with exact integer
  *    intersection counts — no doubles anywhere until the caller
  *    divides.
  */
object SetSimilarity {

  /** All (id_a < id_b) pairs whose token-set Jaccard is >= num/den,
    * with exact intersection and union sizes. `sets` must provide
    * (`id`, `toks`) where `toks` has distinct elements.
    *
    * Prefix length for a set of n tokens is n - ceil(num*n/den) + 1: a
    * qualifying pair shares at least ceil(num*n/den) tokens, so the two
    * prefixes must intersect under any fixed global token order
    * (rare-first minimizes candidate fan-out). The Jaccard length
    * filter num*max(na,nb) <= den*min(na,nb) is applied in exact
    * integers at candidate time.
    *
    * The all-pairs output is exact — prefix filtering provably loses no
    * qualifying pair — UNLESS the session-wide degenerate-mass cap
    * ([[Lsh.MaxBucketConf]]) is set: since the exact-copy collapse,
    * this operator rides the same pair expansion as
    * [[Dedup.minhashLsh]], so under that opt-in cap exact-copy groups
    * larger than the cap are dropped from expansion (their
    * within-clique AND their member-level cross fan-out), with every
    * drop counted in [[Dedup.droppedLshBuckets]] — the same bounded
    * production semantics, and the same exact-dedup escape hatch for
    * the dropped mass. Leave the conf unset for the exact contract
    * (the q136 oracle replays it uncapped).
    */
  def selfJoinPairs(sets: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && num <= den, s"threshold $num/$den must be in (0,1]")
    // Exact-copy collapse (the [[Dedup.minhashLsh]] discipline): the
    // output (inter, uni) is a pure function of the two token SETS, so
    // sets with equal canonical form are interchangeable — the prefix
    // pipeline runs over one min-id representative per class and pairs
    // expand back through the copy groups, within-class pairs carrying
    // the identity (inter = uni = n). Correctness does NOT depend on
    // the document frequencies staying per-doc: prefix filtering is
    // lossless under ANY fixed global token order, so computing df over
    // classes (each class counted once) still yields the exact pair
    // set — it only changes which non-qualifying candidates get pruned
    // earliest. A 100×-copy corpus therefore pays the quadratic prefix
    // candidate mass at 1× and streams the copy mass as output only.
    val base = sets.select(col("id"), col("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("ck", Dedup.classKey(col("toks")))
    // the slim (id, ck) projection feeds the member expansion spine —
    // persisted so the tokenize + canonicalize pass (the md5-keyed
    // classKey over every document) runs once per call instead of once
    // per consumer (round 15; the window this replaces re-derived it)
    val baseSlim = Dedup.matD(base.select(col("id"), col("ck")))
    // reps feeds rankedSets (whose output is itself consumed by the
    // candidate legs) plus both payload legs, multiReps and the member
    // spine — persist it under the dedup family's single-working-set
    // cache discipline so the collapse work runs once per call
    val reps = Dedup.matD(base.groupBy("ck")
      .agg(min("id").as("id"), first("toks").as("toks"),
        count(lit(1)).as("grp_n")))
    Dedup.swapShingleCaches(Seq(baseSlim, reps))
    // members = (id, min id of its class, class size): exactly reps'
    // per-class aggregates fanned back over the class members — a keyed
    // join against the persisted reps, replacing the window pass that
    // re-sorted the recomputed corpus by ck (identical values: rep =
    // min(id) over ck = reps.id, grp_n = count over ck = reps.grp_n)
    val members = baseSlim
      .join(reps.select(col("ck"), col("id").as("rep"), col("grp_n")), "ck")
      .select(col("id"), col("rep"), col("grp_n"))
    val multiReps = reps.filter(col("grp_n") > 1)
      .select(col("id"), col("grp_n"), size(col("toks")).as("n"))

    val sorted = rankedSets(reps.select("id", "toks"), num, den)
    val cand = candidatePairs(sorted, num, den)
    // verification payload straight from the persisted reps: inter/uni
    // are SET-level integers (array_intersect cardinality and sizes are
    // order-independent), so the rare-first reordering rankedSets adds
    // for the prefix legs is irrelevant here — reading reps instead
    // spares two full recomputes of the rank regroup (round 15)
    val payload = reps.select(col("id"), col("toks"),
      size(col("toks")).as("n"))
    val repPairs = cand
      .join(payload.select(col("id").as("doc_a"), col("toks").as("ta"),
        col("n").as("na")), "doc_a")
      .join(payload.select(col("id").as("doc_b"), col("toks").as("tb"),
        col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select("doc_a", "doc_b", "inter", "uni")
    Dedup.expandCollapsed(Dedup.NearDupCollapse(members, multiReps, repPairs),
      Seq("inter", "uni"), Seq(col("n"), col("n")),
      withinQualifies = true) // n·den ≥ n·num holds by the require above
  }

  /** Each set re-sorted rarest-token-first under the global (df, token)
    * total order, with its size `n` and prefix length `plen` =
    * n − ⌈num·n/den⌉ + 1. */
  private[graft] def rankedSets(sets: DataFrame, num: Int, den: Int): DataFrame = {
    val base = sets.select(col("id"), col("toks")).filter(size(col("toks")) > 0)

    // global document frequency; (df asc, token asc) is the total order
    val tok = base.select(col("id"), explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))

    tok.join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ranked"))
      .select(col("id"),
        transform(col("ranked"), r => r.getField("tok")).as("toks"))
      .withColumn("n", size(col("toks")))
      // ceil(num*n/den) = (num*n + den - 1) div den; the double division
      // below is exact-safe (operands are small exact integers and
      // truncation of a correctly-rounded quotient can't cross an
      // integer boundary)
      .withColumn("plen",
        col("n") - ((col("n") * num + lit(den - 1)) / den).cast("int") + 1)
  }

  /** Candidate (doc_a < doc_b) pairs from intersecting prefixes, pruned
    * by the length filter and (when `positional`, the default) PPJoin's
    * positional filter. Exposed for the adversarial-scale spec, which
    * asserts the positional tier's candidate bound directly.
    *
    * PPJoin positional filter (Xiao et al. WWW'08 §3.2): a qualifying
    * pair needs overlap >= alpha = ceil(num*(na+nb)/(num+den)), and all
    * common tokens sit at positions >= (pa, pb) of any shared prefix
    * token, so overlap <= 1 + min(na-pa, nb-pb). Pruning matches whose
    * bound falls below alpha is lossless: the pair's FIRST shared
    * prefix token always satisfies the bound if the pair qualifies.
    * Integer form: ubound*(num+den) >= num*(na+nb) avoids the ceil. */
  private[graft] def candidatePairs(sorted: DataFrame, num: Int, den: Int,
      positional: Boolean = true): DataFrame = {
    // posexplode keeps each prefix token's 1-based position in the full
    // rare-first array (the prefix IS the array head, so prefix position
    // == array position) for the positional filter
    val pre = sorted.select(col("id"), col("n"),
        posexplode(slice(col("toks"), lit(1), col("plen"))))
      .withColumnRenamed("col", "tok")
      .withColumn("p", col("pos") + 1).drop("pos")

    val lengthOk = col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
      col("b.n") * den >= col("a.n") * num &&
      col("a.n") * den >= col("b.n") * num
    val positionOk =
      (lit(1) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))) *
        (num + den) >= (col("a.n") + col("b.n")) * num

    pre.as("a").join(pre.as("b"),
        if (positional) lengthOk && positionOk else lengthOk)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }
}
