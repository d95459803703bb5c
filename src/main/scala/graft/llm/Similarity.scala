package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the corpus, map-side cosine, per-query top-k. Linear in corpus size,
  *    no corpus shuffle: the 100 TB-safe exact baseline.
  *  - [[lshBucketedPairs]]: approximate — sign-random-projection (SRP /
  *    hyperplane LSH, Charikar 2002) buckets; only intra-bucket pairs are
  *    scored. Replaces the O(n²) self-join with a bucket-keyed shuffle.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns — a single-pass
    * custom expression ([[graft.functions.CosineKernel]]); same
    * accumulation order as the equivalent aggregate/zip_with fold, so
    * results are bit-identical, just not interpreted. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineSim(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k nearest neighbors (cosine) of each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * scanned once, partition-parallel. Similarities are rounded before
    * ranking so ordering is stable across engines/architectures. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }

  /** Sign-random-projection signature: bit i = sign(v · h_i) where h_i is
    * a deterministic pseudo-random ±1 hyperplane derived from
    * xxhash64(plane index + offset, dim index) — reproducible with no
    * stored model. Returned as a long bucket key of `bits` bits
    * (single-pass custom expression, [[graft.functions.SrpKernel]]). */
  def srpBucket(vec: Column, bits: Int, offset: Int = 0): Column =
    graft.functions.VectorOps.srpBucket(vec, bits, offset)

  /** IVF (inverted-file) approximate top-k: the corpus is assigned to
    * `nlist` cells by nearest centroid; each query probes only its
    * `nprobe` nearest cells, scoring ~n·nprobe/nlist candidates instead
    * of n. Centroids here are a deterministic sample (first `nlist` ids)
    * standing in for offline k-means training — the partition/probe
    * plumbing (broadcast centroids, map-side assignment, cell-keyed join)
    * is the part that must scale, and does: no corpus self-join, one
    * shuffle keyed on cell id. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val centroids = v.orderBy("id").limit(nlist)
      .select(col("id").as("cell"), col("v").as("cv"))

    def nearestCells(df: DataFrame, keyCol: String, vecName: String, keep: Int) = {
      val w = Window.partitionBy(keyCol).orderBy(col("csim").desc, col("cell").asc)
      df.join(broadcast(centroids))
        .withColumn("csim", cosine(col(vecName), col("cv")))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") <= keep)
        .drop("cv", "csim", "crk")
    }

    val assigned = nearestCells(v, "id", "v", 1)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = nearestCells(q, "query_id", "qv", nprobe)

    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    probes.join(assigned, "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 4).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Approximate near-neighbor pairs: vectors sharing an SRP bucket, scored
    * exactly within the bucket, kept above `threshold`. Multiple independent
    * hash tables (`tables`) raise recall; buckets are the shuffle key so
    * work stays distributed at corpus scale. */
  def lshBucketedPairs(corpus: DataFrame, threshold: Double, bits: Int = 12,
                       tables: Int = 4, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // each table offsets the plane index so tables are independent
    val tabbed = v.select(col("id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tab"),
          srpBucket(col("v"), bits, t * bits).as("bucket"))): _*)).as("tb"))
      .select(col("id"), col("tb.tab"), col("tb.bucket"))
    val cand = graft.llm.Lsh.bucketPairs(tabbed, Seq("tab", "bucket"), "id_a", "id_b")
    val va = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val vb = v.select(col("id").as("id_b"), col("v").as("v_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), round(cosine(col("v_a"), col("v_b")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
