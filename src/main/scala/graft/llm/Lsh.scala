package graft.llm


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Shared LSH candidate generation.
  *
  * A naive bucket self-join re-evaluates the whole upstream pipeline
  * (scan → shingle/signature → banding) once per join leg; profiled at
  * sf0.1 that recomputation dominated (12s of 16s). Instead: group ids
  * per bucket (upstream runs ONCE; the groupBy exchange carries
  * (key, id) pairs only, never signatures or shingle sets — and it is
  * REUSED across both expansion legs), then expand in-bucket pairs by
  * a STREAMED bucket-keyed self-join of the compact bucket table
  * ([[pairLegs]] — constant memory per bucket regardless of its size;
  * see its scaladoc for the measured sf10 failure of the in-row array
  * expansion this replaced). */
object Lsh {

  /** Recommended degenerate-bucket guard for production pipelines: a
    * bucket above this size is dropped rather than expanded. An
    * adversarial or pathological corpus (e.g. millions of byte-identical
    * documents all landing in one band bucket) would otherwise
    * materialize one giant id array on a single executor and explode
    * into O(|bucket|²) pairs. Members of such a bucket are by
    * construction near-identical to *everything* in it — exact dedup
    * (hash group-by, [[Dedup.exact]]) is the right tool for them, so
    * dropping the bucket loses only pairs the cheaper exact pass already
    * finds.
    *
    * The cap is OPT-IN (default uncapped): dropping buckets makes the
    * output a strict subset of the uncapped all-pairs semantics, so a
    * silent default would diverge from any exact external replay of the
    * same algorithm (the DuckDB oracles for q32/q33/q36/q67 replay
    * candidate generation with no cap). Enable it per call
    * (`maxBucket = Lsh.RecommendedMaxBucket`) or session-wide via
    * `spark.conf.set(Lsh.MaxBucketConf, "1000")`. */
  val RecommendedMaxBucket = 1000

  /** Session conf key for an LSH bucket-size cap applied by every
    * [[bucketPairs]] call that does not pass an explicit `maxBucket`.
    * Unset means uncapped (exact candidate generation). */
  val MaxBucketConf = "spark.graft.lsh.maxBucket"

  /** One dropped-bucket accumulator per session, visible in the Spark UI
    * as "graft.lsh.droppedBuckets". An accumulator (not an `observe`
    * metric) because AQE's empty-relation propagation can prune a
    * CollectMetrics node out of the final plan in exactly the degenerate
    * case the counter exists for. Cumulative per session; task retries
    * may over-count (standard accumulator caveat) — it is a diagnostic,
    * not data. */
  private val accumulators =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, LongAccumulator]())

  private def accFor(spark: SparkSession): LongAccumulator =
    accumulators.synchronized {
      var acc = accumulators.get(spark)
      if (acc == null) {
        acc = spark.sparkContext.longAccumulator("graft.lsh.droppedBuckets")
        accumulators.put(spark, acc)
      }
      acc
    }

  /** Total LSH buckets dropped by the size cap in this session so far. */
  def droppedBuckets(spark: SparkSession): Long = accFor(spark).value

  /** Distinct ordered candidate pairs (aName < bName) from rows of
    * (bucket key columns ++ an `id` column). When a cap is in force —
    * an explicit positive `maxBucket`, else the [[MaxBucketConf]]
    * session conf — buckets larger than it are dropped (see
    * [[RecommendedMaxBucket]]) and counted in [[droppedBuckets]];
    * otherwise every bucket expands (exact candidate generation).
    *
    * `weightCol` (optional) names a per-row population weight: an
    * exact-copy-collapsed caller ([[Dedup.minhashCollapse]]) bands one
    * representative per content class, so the cap must test the
    * bucket's RAW population (Σ class sizes), not its representative
    * count — otherwise a degenerate corpus of many mid-size copy
    * classes sharing one bucket would re-expand through the groups to
    * O(cap⁴) pairs where the documented guard promises O(cap²). With
    * the weight, drop decisions are identical to the uncollapsed
    * pipeline's. */
  def bucketPairs(banded: DataFrame, keys: Seq[String],
                  aName: String, bName: String,
                  maxBucket: Int = 0, weightCol: String = ""): DataFrame = {
    val g = cappedGroups(banded, keys, maxBucket, weightCol)
    pairLegs(g, "ids", "ids", keys, aName, bName)
      .dropDuplicates(aName, bName)
      .transform(pinShuffleJoin)
  }

  /** Ordered pairs with their SHARED-KEY counts: like [[bucketPairs]]
    * but each (a, b) row carries how many buckets the two ids
    * co-occupied — the "videos sharing ≥ k frame hashes" /
    * "docs sharing ≥ k chunk hashes" shape. Same single upstream
    * evaluation (the groupBy means no self-join ever re-runs the
    * decode/signature lineage) and the same cap + accumulator. */
  def sharedKeyCounts(banded: DataFrame, keys: Seq[String],
                      aName: String, bName: String, countName: String,
                      maxBucket: Int = 0): DataFrame =
    pairLegs(cappedGroups(banded, keys, maxBucket), "ids", "ids",
      keys, aName, bName)
      .groupBy(aName, bName)
      .agg(count(lit(1)).as(countName))
      .transform(pinShuffleJoin)

  /** Cross-corpus candidate pairs: `banded` rows carry the bucket keys,
    * an `id`, and a boolean `isBatch` side flag; emits distinct
    * (batch id, base id) pairs per bucket — the base side is NEVER
    * self-joined, and the groupBy shape evaluates the upstream banding
    * pipeline once. Buckets are capped on their TOTAL population (both
    * sides) under the same opt-in cap + accumulator as [[bucketPairs]].
    * Sides are assumed disjoint id sets (a caller-defined corpus
    * split).
    *
    * `weightCol` (optional) is the exact-copy-collapse hook, mirroring
    * [[bucketPairs]]: a collapsed caller
    * ([[Dedup.minhashLshAgainst]]/[[Dedup.minhashLshAgainstIndex]])
    * bands one representative per (content class, side), so the cap
    * must test Σ class sizes over BOTH sides — the bucket's RAW
    * population — not its representative count. With the weight, drop
    * decisions are identical to the uncollapsed cross pipeline's, and
    * the surviving expansion is bounded exactly as before: a bucket
    * that survives has grp_a + grp_b ≤ cap for every cross pair it
    * emits, so each expanded rep pair fans out to at most
    * (cap/2)² member pairs — no separate group cap is needed on the
    * cross path (unlike the self-join path, whose within-clique pairs
    * bypass the bucket join entirely). */
  def crossBucketPairs(banded: DataFrame, keys: Seq[String],
                       aName: String, bName: String,
                       maxBucket: Int = 0, weightCol: String = ""): DataFrame = {
    val cap = effectiveCap(banded.sparkSession, maxBucket)
    val weighted = weightCol.nonEmpty
    val aggs = Seq(
      sort_array(collect_set(when(col("isBatch"), col("id")))).as("aIds"),
      sort_array(collect_set(when(!col("isBatch"), col("id")))).as("bIds")) ++
      (if (weighted) Seq(sum(col(weightCol)).as("pop")) else Nil)
    val grouped = banded.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(size(col("aIds")) > 0 && size(col("bIds")) > 0)
    val capped =
      if (cap == Int.MaxValue) grouped
      else {
        val acc = accFor(banded.sparkSession)
        val keep = udf { (n: Long) =>
          val ok = n <= cap
          if (!ok) acc.add(1L)
          ok
        }
        val pop =
          if (weighted) col("pop")
          else (size(col("aIds")) + size(col("bIds"))).cast("long")
        grouped.filter(keep(pop))
      }
    pairLegs(if (weighted) capped.drop("pop") else capped,
        "aIds", "bIds", keys, aName, bName)
      .dropDuplicates(aName, bName)
      .transform(pinShuffleJoin)
  }

  /** STREAMED per-bucket pair expansion: explode each id array back to
    * (bucket key, id) rows and self-join the two legs on the bucket key
    * (pinned to a sort-merge join — both legs carry the same
    * garbage-small post-aggregate estimate the pinShuffleJoin scaladoc
    * describes). SMJ streams the left leg and spills the right leg's
    * per-key buffer, so a bucket's pair fan-out costs O(|bucket|) MEMORY
    * and O(|bucket|²) streamed rows. The previous formulation —
    * `explode(flatten(transform(ids, …)))` building each bucket's whole
    * pair array inside one row — was measured DEAD at 10× bench scale:
    * SfGen sf10's largest simhash bucket holds 27 900 ids (LshProbe;
    * 100 verbatim copies merge copy-families into shared buckets), so a
    * single task had to materialize C(27 900, 2) ≈ 3.9·10⁸ structs
    * in memory and the executor heartbeat-starved into suicide inside
    * q33's candidate stage. Total candidate mass there is 1.98 G pairs —
    * legitimate output for that corpus, and streaming is the only shape
    * that pays for it in time rather than heap. The exchange under the
    * bucket aggregate is REUSED across the two legs (same canonical
    * subtree), so upstream decode/signature lineage still runs once;
    * when the two legs explode the SAME array the a<b predicate keeps
    * the ordered-pair semantics of the old sorted-array slice. The
    * opt-in bucket cap's drop accumulator now fires once per LEG (the
    * filter sits above the reused exchange) — a systematic ≤2×
    * over-count on top of the documented task-retry caveat; it remains
    * a diagnostic, not data. */
  private def pairLegs(grouped: DataFrame, aArr: String, bArr: String,
                       keys: Seq[String], aName: String,
                       bName: String): DataFrame = {
    val legA = grouped.select(keys.map(col) :+ explode(col(aArr)).as(aName): _*)
    val legB = grouped.select(keys.map(col) :+ explode(col(bArr)).as(bName): _*)
    val joined = legA.hint("merge").join(legB, keys)
    val ordered =
      if (aArr == bArr) joined.where(col(aName) < col(bName)) else joined
    ordered.select(col(aName), col(bName))
  }

  /** Pin every downstream equi-join AGAINST a candidate-pair table to a
    * shuffle (sort-merge) join. The pair table's STATIC size estimate is
    * garbage — explode-of-collect_set followed by a distinct propagates
    * a near-zero sizeInBytes — so without the hint the static planner
    * happily plans `BroadcastExchange` over the pair table for the
    * verification joins. That is invisibly fine at fixture scale (the
    * pairs really are small) and fatal at data scale: the round-11 sf10
    * probe measured q33's verification join building a 1.18 GB
    * driver-side broadcast of ~25 M candidate pairs and dying on
    * `spark.driver.maxResultSize` — AQE did NOT demote the
    * statically-planned broadcast before the build executed. Candidates
    * are data-scale BY DEFINITION (they grow with corpus duplication),
    * so the shuffle join is the only 100 TB-safe shape; a downstream
    * caller joining a genuinely bounded side can still say
    * `broadcast(dim)` explicitly — an explicit broadcast hint on the
    * OTHER side outranks this merge hint in join selection. */
  private def pinShuffleJoin(pairs: DataFrame): DataFrame =
    pairs.hint("merge")

  /** The session's drop accumulator, for the exact-copy collapse in
    * [[Dedup]]: oversized COPY GROUPS dropped from pair expansion count
    * in the same place oversized buckets do — one accumulator, one
    * "degenerate mass was bounded here" signal. */
  private[llm] def dropAccumulator(spark: SparkSession): LongAccumulator =
    accFor(spark)

  /** The cap currently in force (param beats conf; `Int.MaxValue` means
    * uncapped), for callers outside this object that must apply the
    * SAME cap to a non-bucket quadratic expansion (the exact-copy
    * groups in [[Dedup]]). */
  private[llm] def capInForce(spark: SparkSession, maxBucket: Int = 0): Int =
    effectiveCap(spark, maxBucket)

  /** conf values <= 0 mean "uncapped", mirroring the parameter
    * convention — otherwise setting the conf to "0" to disable the cap
    * would drop every bucket. */
  private def effectiveCap(spark: SparkSession, maxBucket: Int): Int =
    if (maxBucket > 0) maxBucket
    else spark.conf.getOption(MaxBucketConf)
      .map(_.toInt).filter(_ > 0).getOrElse(Int.MaxValue)

  /** Shared grouped-bucket stage: ids per bucket, multi-member buckets
    * only, cap + accumulator applied when in force. The cap tests the
    * bucket's population — `size(ids)` raw, or `sum(weightCol)` when
    * the caller bands collapsed representatives (see [[bucketPairs]]). */
  private def cappedGroups(banded: DataFrame, keys: Seq[String],
                           maxBucket: Int,
                           weightCol: String = ""): DataFrame = {
    val cap = effectiveCap(banded.sparkSession, maxBucket)
    val weighted = weightCol.nonEmpty
    val aggs =
      if (weighted) Seq(sort_array(collect_set(col("id"))).as("ids"),
        sum(col(weightCol)).as("pop"))
      else Seq(sort_array(collect_set(col("id"))).as("ids"))
    val grouped = banded.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(size(col("ids")) > 1)
    val capped =
      if (cap == Int.MaxValue) grouped
      else {
        val acc = accFor(banded.sparkSession)
        val keep = udf { (n: Long) =>
          val ok = n <= cap
          if (!ok) acc.add(1L)
          ok
        }
        val pop = if (weighted) col("pop") else size(col("ids")).cast("long")
        grouped.filter(keep(pop))
      }
    if (weighted) capped.drop("pop") else capped
  }
}
