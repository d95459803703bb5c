package graft.llm


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Shared LSH candidate generation.
  *
  * A naive bucket self-join re-evaluates the whole upstream pipeline
  * (scan → shingle/signature → banding) once per join leg; profiled at
  * sf0.1 that recomputation dominated (12s of 16s). Instead: group ids
  * per bucket and expand in-bucket pairs — upstream runs ONCE and the
  * only exchange is the groupBy on the bucket key. Bucket sizes are
  * bounded by LSH design (that's the point of banding), so the per-group
  * pair expansion is small; at 100 TB the shuffle carries (key, id)
  * pairs only, never signatures or shingle sets. */
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
    * otherwise every bucket expands (exact candidate generation). */
  def bucketPairs(banded: DataFrame, keys: Seq[String],
                  aName: String, bName: String,
                  maxBucket: Int = 0): DataFrame =
    cappedGroups(banded, keys, maxBucket)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as(aName), y.as(bName)))))).as("p"))
      .select(col(s"p.$aName"), col(s"p.$bName"))
      .dropDuplicates(aName, bName)
      .transform(pinShuffleJoin)

  /** Ordered pairs with their SHARED-KEY counts: like [[bucketPairs]]
    * but each (a, b) row carries how many buckets the two ids
    * co-occupied — the "videos sharing ≥ k frame hashes" /
    * "docs sharing ≥ k chunk hashes" shape. Same single upstream
    * evaluation (the groupBy means no self-join ever re-runs the
    * decode/signature lineage) and the same cap + accumulator. */
  def sharedKeyCounts(banded: DataFrame, keys: Seq[String],
                      aName: String, bName: String, countName: String,
                      maxBucket: Int = 0): DataFrame =
    cappedGroups(banded, keys, maxBucket)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as(aName), y.as(bName)))))).as("p"))
      .groupBy(col(s"p.$aName").as(aName), col(s"p.$bName").as(bName))
      .agg(count(lit(1)).as(countName))
      .transform(pinShuffleJoin)

  /** Cross-corpus candidate pairs: `banded` rows carry the bucket keys,
    * an `id`, and a boolean `isBatch` side flag; emits distinct
    * (batch id, base id) pairs per bucket — the base side is NEVER
    * self-joined, and the groupBy shape evaluates the upstream banding
    * pipeline once. Buckets are capped on their TOTAL population (both
    * sides) under the same opt-in cap + accumulator as [[bucketPairs]].
    * Sides are assumed disjoint id sets (a caller-defined corpus
    * split). */
  def crossBucketPairs(banded: DataFrame, keys: Seq[String],
                       aName: String, bName: String,
                       maxBucket: Int = 0): DataFrame = {
    val cap = effectiveCap(banded.sparkSession, maxBucket)
    val grouped = banded.groupBy(keys.map(col): _*)
      .agg(
        sort_array(collect_set(when(col("isBatch"), col("id")))).as("aIds"),
        sort_array(collect_set(when(!col("isBatch"), col("id")))).as("bIds"))
      .filter(size(col("aIds")) > 0 && size(col("bIds")) > 0)
    val capped =
      if (cap == Int.MaxValue) grouped
      else {
        val acc = accFor(banded.sparkSession)
        val keep = udf { (n: Int) =>
          val ok = n <= cap
          if (!ok) acc.add(1L)
          ok
        }
        grouped.filter(keep(size(col("aIds")) + size(col("bIds"))))
      }
    capped
      .select(explode(flatten(transform(col("aIds"), x =>
        transform(col("bIds"), y =>
          struct(x.as(aName), y.as(bName)))))).as("p"))
      .select(col(s"p.$aName"), col(s"p.$bName"))
      .dropDuplicates(aName, bName)
      .transform(pinShuffleJoin)
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

  /** conf values <= 0 mean "uncapped", mirroring the parameter
    * convention — otherwise setting the conf to "0" to disable the cap
    * would drop every bucket. */
  private def effectiveCap(spark: SparkSession, maxBucket: Int): Int =
    if (maxBucket > 0) maxBucket
    else spark.conf.getOption(MaxBucketConf)
      .map(_.toInt).filter(_ > 0).getOrElse(Int.MaxValue)

  /** Shared grouped-bucket stage: ids per bucket, multi-member buckets
    * only, cap + accumulator applied when in force. */
  private def cappedGroups(banded: DataFrame, keys: Seq[String],
                           maxBucket: Int): DataFrame = {
    val cap = effectiveCap(banded.sparkSession, maxBucket)
    val grouped = banded.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    if (cap == Int.MaxValue) grouped
    else {
      val acc = accFor(banded.sparkSession)
      val keep = udf { (n: Int) =>
        val ok = n <= cap
        if (!ok) acc.add(1L)
        ok
      }
      grouped.filter(keep(size(col("ids"))))
    }
  }
}
