package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted ANN index lifecycle — build once, query many times. The
  * in-memory [[Similarity.ivfPqTopK]] recomputes cell assignment and PQ
  * codes per call; a serving deployment instead materializes them:
  *
  *  - `model/`: the tiny IVF centroid + PQ codebook vectors (KBs),
  *    position-ordered so build and query reconstruct identical models;
  *  - `index/`: one row per corpus vector `(id, codes)` PARTITIONED BY
  *    `cell` — the probe set then prunes to `nprobe` of `nlist`
  *    directories, so a lookup reads ~nprobe/nlist of an index that is
  *    itself ~1/32 of the embedding bytes (PQ codes, not vectors).
  *
  * [[lookup]] is the single-query serving path: the probe cells are
  * ranked on the driver against the collected model (nlist ≪ corpus)
  * and become literal partition predicates — static partition pruning,
  * spec-pinned via `PartitionFilters`. [[topK]] is the batch path: a
  * probe⋈cell join, same shape as `ivfPqTopK` but reading codes from
  * the index instead of re-encoding the corpus.
  *
  * Results match [[Similarity.ivfPqTopK]] exactly for the same
  * parameters (AnnIndexSpec) — same first-N model, same ADC scores.
  */
object AnnIndex {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** Build the index at `dir` from a corpus of (idCol, vecCol). */
  def build(corpus: DataFrame, dir: String, nlist: Int = 16, m: Int = 8,
            codes: Int = 16, idCol: String = "vec_id",
            vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val firstN = Similarity.firstNCentroids(corpus, math.max(nlist, codes),
      idCol, vecCol)
    firstN.zipWithIndex
      .map { case ((id, vec), pos) => (pos, id, vec.toSeq) }.toSeq
      .toDF("pos", "id", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
    val cents = firstN.take(nlist)
    val cb = firstN.take(codes)
    corpus.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .transform(Similarity.assignCells(_, cents, "v"))
      .withColumn("codes",
        graft.functions.VectorOps.pqEncode(col("v"), cb.map(_._1), cb.map(_._2), m))
      .select("id", "codes", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
  }

  private def readModel(spark: SparkSession, dir: String): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$dir/model").orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getSeq[Double](2).toArray))

  /** Single-vector serving lookup: driver-ranked probe cells become
    * literal partition predicates over `index/` — the plan reads only
    * the probed cell directories. */
  def lookup(spark: SparkSession, dir: String, query: Array[Double], k: Int,
             nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
             codes: Int = 16): DataFrame = {
    val model = readModel(spark, dir)
    val cents = model.take(nlist)
    val cb = model.take(codes)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    // round to 6 dp with Spark round()'s HALF_UP semantics so the probe
    // set matches cellRanks' (negsim, cell) order bit-for-bit — an
    // unrounded driver-side sort could probe different cells than
    // Similarity.ivfPqTopK on centroids that tie at 6 dp
    val probeCells = cents
      .map { case (cell, cv) =>
        val sim = dot(query, cv) / (norm(query) * norm(cv))
        (-BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          cell)
      }
      .sorted.take(nprobe).map(_._2)
    val qLit = typedLit(query.toSeq)
    val w = Window.partitionBy(lit(1)).orderBy(col("adist").asc, col("neighbor_id").asc)
    spark.read.parquet(s"$dir/index")
      .filter(col("cell").isin(probeCells: _*))
      .select(col("id").as("neighbor_id"),
        round(graft.functions.VectorOps.pqAdc(qLit, col("codes"),
          cb.map(_._1), cb.map(_._2), m), 4).as("adist"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }

  /** Batch top-k over the persisted index: probe cells per query, join
    * on the index's partition column, ADC-score the codes. Matches
    * [[Similarity.ivfPqTopK]] (which encodes in-flight) row for row. */
  def topK(queries: DataFrame, dir: String, k: Int, nlist: Int = 16,
           nprobe: Int = 4, m: Int = 8, codes: Int = 16,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val model = readModel(spark, dir)
    val cents = model.take(nlist)
    val cb = model.take(codes)
    val index = spark.read.parquet(s"$dir/index")
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), asDouble(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(Similarity.cellRanks("qv", cents)), 1, nprobe))
          .as("pc"))
      .select(col("query_id"), col("qv"), col("pc.cell").as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    probes.join(index, "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(graft.functions.VectorOps.pqAdc(col("qv"), col("codes"),
          cb.map(_._1), cb.map(_._2), m), 4).as("adist"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }
}
