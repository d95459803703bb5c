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

  /** Encode (id, codes, cell) rows for `df` under a frozen model —
    * the one pipeline both [[build]] and [[append]] run, so appended
    * rows are bit-identical to what a rebuild would produce. */
  private def encodeRows(df: DataFrame, model: Array[(Long, Array[Double])],
                         nlist: Int, m: Int, codes: Int,
                         idCol: String, vecCol: String): DataFrame = {
    val cents = model.take(nlist)
    val cb = model.take(codes)
    df.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .transform(Similarity.assignCells(_, cents, "v"))
      .withColumn("codes",
        graft.functions.VectorOps.pqEncode(col("v"), cb.map(_._1), cb.map(_._2), m))
      .select("id", "codes", "cell")
  }

  /** Build the index at `dir` from a corpus of (idCol, vecCol). Also
    * persists `stats/` — the per-cell row counts at build time, the
    * baseline the [[drift]] guard compares serving-time occupancy
    * against. */
  def build(corpus: DataFrame, dir: String, nlist: Int = 16, m: Int = 8,
            codes: Int = 16, idCol: String = "vec_id",
            vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.common.WriterLease.withLease(fsFor(spark, dir), leasePath(dir)) {
    val firstN = Similarity.firstNCentroids(corpus, math.max(nlist, codes),
      idCol, vecCol)
    firstN.zipWithIndex
      .map { case ((id, vec), pos) => (pos, id, vec.toSeq) }.toSeq
      .toDF("pos", "id", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
    encodeRows(corpus, firstN, nlist, m, codes, idCol, vecCol)
      .repartition(col("cell")) // one file per cell, not tasks × cells
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
    spark.read.parquet(s"$dir/index").groupBy("cell")
      .agg(count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    }
  }

  /** The index's single-writer lock (inside the state dir — its root is
    * never renamed, unlike GraphArtifact's). Enforced at [[build]] and
    * [[append]]; AnnIndexSpec's two-appender leg pins the loser failing
    * fast and the winner's lease releasing on every in-process exit. */
  private def leasePath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_writer.lease")

  private def fsFor(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  /** Fold a batch of vectors into the persisted index under the FROZEN
    * build-time model: cell-assign + PQ-encode the batch with the same
    * centroids/codebook, then an id-keyed upsert of ONLY the touched
    * cell partitions — the cells the batch lands in, plus any cell
    * holding a superseded id (a re-ingested id whose vector moved
    * cells leaves a stale row in its OLD cell, which must be rewritten
    * too). The merge reads prune to those partitions and the write is
    * a dynamic partition overwrite, so untouched cells' files are
    * byte-for-byte untouched (AnnIndexSpec pins this) — O(batch +
    * touched cells' codes), never a rewrite of the whole index. The
    * one full-index read left is the 2-column (id, cell) probe for
    * superseded ids — PQ-code metadata, no data rewrite.
    * Re-running the same batch is a no-op by construction (same ids,
    * same frozen model ⇒ same cells, same codes).
    *
    * The model is NOT retrained here — that is the point (lookups stay
    * consistent with every previously served result) and the risk: a
    * drifting corpus degrades recall as cells overfill, which is what
    * [[drift]] measures.
    *
    * Crash semantics (AnnIndexSpec "crash between overwrite and sweep"
    * exercises the worst window with an injected failure): a pending
    * marker brackets the mutation — written before the dynamic
    * overwrite, deleted after the emptied-cell sweep. A crash inside
    * the bracket (in particular AFTER the overwrite commits but BEFORE
    * the sweep, when a superseded id sits in both its old and new
    * cells) leaves the marker in place, and every read path
    * ([[lookup]]/[[topK]]/[[drift]] via [[indexDf]]) FAILS LOUDLY
    * rather than serving the stale duplicate. Re-running the same
    * append converges: the retry sees the stale row via the superseded
    * probe, anti-joins it out, re-fires the sweep, and clears the
    * marker (the upsert is idempotent under the frozen model). Readers
    * never repair — mutation stays single-writer, the GraphArtifact
    * discipline. */
  def append(batch: DataFrame, dir: String, nlist: Int = 16, m: Int = 8,
             codes: Int = 16, idCol: String = "vec_id",
             vecCol: String = "embedding"): Unit =
    graft.common.WriterLease.withLease(
        fsFor(batch.sparkSession, dir), leasePath(dir)) {
      appendUnlocked(batch, dir, nlist, m, codes, idCol, vecCol)
    }

  private def appendUnlocked(batch: DataFrame, dir: String, nlist: Int,
                             m: Int, codes: Int, idCol: String,
                             vecCol: String): Unit = {
    val spark = batch.sparkSession
    val model = readModel(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val pending = new org.apache.hadoop.fs.Path(s"$dir/_append_pending.json")
    val fresh = encodeRows(batch, model, nlist, m, codes, idCol, vecCol)
      // partition inference types the live index's cell as INT; align
      // the in-flight batch so the union and isin pruning stay typed
      .withColumn("cell", col("cell").cast("int"))
      .localCheckpoint(true) // reused thrice below; also cuts file lineage
    // the single writer may read through its own pending marker — a
    // retry of an interrupted append is exactly how repair happens
    val index = indexDf(spark, dir, allowPending = true)
    val batchCells = fresh.select("cell").distinct()
      .collect().map(_.getInt(0)) // ≤ nlist rows
    val oldCells = index.join(fresh.select("id"), Seq("id"))
      .select("cell").distinct().collect().map(_.getInt(0))
    val touched = (batchCells ++ oldCells).distinct.toSeq
    if (touched.isEmpty) return // empty batch: nothing to do
    // localCheckpoint: the merge reads the very partitions the dynamic
    // overwrite replaces — materialize first so the plan holds no file
    // lineage on the output path (and the merge computes exactly once)
    val merged = index.where(col("cell").isin(touched: _*)) // partition-pruned
      .join(fresh.select("id"), Seq("id"), "left_anti")
      .unionByName(fresh)
      .localCheckpoint(true)
    // WRITE-AHEAD pending marker: readers refuse to serve while it
    // exists, so no torn window (stale duplicate between overwrite and
    // sweep) is ever observable. Deleted only after the sweep.
    locally {
      val out = fs.create(pending, true)
      try out.write(
        s"""{"touched":[${touched.mkString(",")}]}""".getBytes("UTF-8"))
      finally out.close()
    }
    val OverwriteModeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(OverwriteModeKey)
    spark.conf.set(OverwriteModeKey, "dynamic")
    try merged.repartition(col("cell")) // one file per rewritten cell
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/index")
    finally prev match {
      case Some(v) => spark.conf.set(OverwriteModeKey, v)
      case None    => spark.conf.unset(OverwriteModeKey)
    }
    if (injectCrashAfterOverwrite)
      throw new IllegalStateException(
        "injected crash: overwrite committed, emptied-cell sweep skipped")
    // a touched cell can end up EMPTY (every row superseded into other
    // cells): dynamic overwrite writes no partition for it, so its
    // stale directory must be dropped explicitly
    val remaining = merged.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    touched.filterNot(remaining).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/index/cell=$c"), true)
    }
    fs.delete(pending, false) // commit point for readers
  }

  /** Test-only failpoint: when set, [[append]] dies between the
    * dynamic-partition overwrite and the emptied-cell sweep — the
    * worst crash window (AnnIndexSpec proves readers refuse the torn
    * state and the retried append converges to the rebuild). */
  private[graft] var injectCrashAfterOverwrite: Boolean = false

  /** Per-cell occupancy drift vs the build-time baseline, plus the
    * retrain recommendation: (cell, n_build, n_now, share_build6,
    * share_now6, drift6, retrain) where drift6 = |share_now −
    * share_build| at 6 dp and retrain flags cells whose absolute share
    * moved more than `threshold`. A frozen-model index serves correct
    * (model-consistent) results forever; what decays is RECALL, as new
    * mass concentrates in cells the probe budget under-covers — share
    * drift is the cheap observable proxy (counts only, no vector
    * math). Retrain when any cell trips. */
  def drift(spark: SparkSession, dir: String,
            threshold: Double = 0.1): DataFrame =
    driftFrom(
      spark.read.parquet(s"$dir/stats")
        .select(col("cell"), col("n").as("n_build")),
      indexDf(spark, dir).groupBy("cell").agg(count(lit(1)).as("n_now")),
      threshold)

  /** The drift arithmetic over two (cell, count) tables — shared by the
    * persisted-index [[drift]] and q263's oracle-gated replay, so the
    * guard a deployment trusts and the arithmetic the DuckDB oracle
    * hash-verifies can never diverge. */
  def driftFrom(build: DataFrame, now: DataFrame,
                threshold: Double = 0.1): DataFrame =
    build.join(now, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_build"), lit(0L)).as("n_build"),
        coalesce(col("n_now"), lit(0L)).as("n_now"))
      .crossJoin(broadcast(
        build.agg(sum("n_build").as("tb"))
          .crossJoin(broadcast(now.agg(sum("n_now").as("tn"))))))
      .select(col("cell"), col("n_build"), col("n_now"),
        round(col("n_build").cast("double") / col("tb"), 6).as("share_build6"),
        round(col("n_now").cast("double") / col("tn"), 6).as("share_now6"))
      .withColumn("drift6",
        round(abs(col("share_now6") - col("share_build6")), 6))
      .withColumn("retrain", col("drift6") > threshold)
      .orderBy("cell")

  /** Does any cell's occupancy drift trip the retrain guard? */
  def recommendRetrain(spark: SparkSession, dir: String,
                       threshold: Double = 0.1): Boolean =
    drift(spark, dir, threshold)
      .agg(max(col("retrain").cast("int")).as("r"))
      .collect()(0).getInt(0) == 1

  /** Live index frame — STRICTLY read-only (the GraphArtifact serve
    * discipline, extended here per the round-9 review): an interrupted
    * staged swap (live missing + complete `index.staging`) is served
    * FROM the staging copy in place, never renamed from the read path.
    * A renaming reader could observe `_SUCCESS` an instant before a
    * re-running writer's staging overwrite deletes it and promote a
    * partially rewritten staging dir to live. No current writer stages
    * the whole index ([[append]] is an in-place dynamic partition
    * overwrite bracketed by the pending marker), so this branch is
    * purely defensive — but defensive code must still obey the
    * readers-never-mutate contract. Like [[graft.Compact.readIndex]],
    * a staging-resolved frame can fail at lazy SCAN time if a writer's
    * entry recovery renames staging → live in the window — the caller
    * retries once and resolves the committed live copy (the window
    * cannot be intercepted here without materializing the frame). */
  private def indexDf(spark: SparkSession, dir: String,
                      allowPending: Boolean = false): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    if (!allowPending &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_append_pending.json")))
      throw new IllegalStateException(
        s"ANN index at $dir has an uncommitted append (pending marker " +
          "present): a superseded id may sit in both its old and new " +
          "cells — re-run the same append (idempotent) to repair before " +
          "serving")
    val live = new org.apache.hadoop.fs.Path(s"$dir/index")
    val staging = new org.apache.hadoop.fs.Path(s"$dir/index.staging")
    val base =
      if (!fs.exists(live) &&
          fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
        staging
      else live
    spark.read.parquet(base.toString)
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
    indexDf(spark, dir)
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
    val index = indexDf(spark, dir)
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
