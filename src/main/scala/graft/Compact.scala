package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Incremental-base compaction for the dedup family: folds a batch of
  * documents into the PERSISTED base-corpus index that
  * [[graft.llm.Dedup.minhashLshAgainstIndex]] (q177's serving shape) and
  * the q110 fingerprint anti-join probe — so daily re-ingestion reads a
  * ready-made index instead of re-shingling the whole accumulated base.
  *
  * State layout: `<stateDir>/index` parquet of
  * `(id, fp, shingles, bands)` — the bag fingerprint (q110's identity),
  * the shingle set (the LSH verify leg), and the fused band keys (the
  * LSH candidate leg), all pure functions of the text.
  *
  * Write protocol (the S15 two-phase-commit discipline, batch-side): the
  * merged index is fully materialized into `_staging` FIRST (the live
  * dir is still being read lazily at that point), then the swap
  * delete(live) → rename(staging, live) is the commit point. A crash
  * between the two steps loses nothing: [[readIndex]] serves the
  * complete staging copy in place READ-ONLY, and the next [[run]]
  * (the single writer) rolls the swap forward at entry.
  * Re-running the same batch is a no-op by construction:
  * merging is an id-keyed upsert (new rows replace, absent ids survive),
  * and every indexed column is a deterministic function of the text.
  *
  * Scale shape: the merge is one anti-join of the existing index against
  * the batch ids plus a union — O(index + batch) with the only exchange
  * keyed on id; nothing re-shingles the base.
  */
object Compact {

  private def live(stateDir: String) = new Path(stateDir, "index")
  private def staging(stateDir: String) = new Path(stateDir, "_staging")

  private def fs(spark: SparkSession, stateDir: String) =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The index rows for `batch` (id, fp, shingles, bands). */
  private[graft] def indexRows(batch: DataFrame, shingleK: Int, bands: Int,
                               rowsPerBand: Int, textCol: String,
                               idCol: String): DataFrame =
    batch.select(col(idCol).cast("long").as("id"),
      TextOps.bagFingerprint(col(textCol)).as("fp"),
      TextOps.wordShingles(col(textCol), shingleK).as("shingles"))
      .withColumn("bands",
        graft.functions.Hashing.minhashBands(col("shingles"), bands, rowsPerBand))

  /** Read the live index — STRICTLY read-only (the GraphArtifact serve
    * discipline): an interrupted swap (live missing + complete staging)
    * is served FROM the staging copy in place, never renamed here. A
    * reader that renamed could race a re-running compactor's staging
    * overwrite — observe `_SUCCESS` an instant before the overwrite
    * deletes it, then rename a partially rewritten staging dir into
    * live. The roll-forward rename belongs to the single writer
    * ([[run]] recovers at entry). Returns None when no state exists.
    *
    * CONCURRENT-RECOVERY CAVEAT: a read that resolves base = staging
    * just before the writer's entry recovery renames staging → live
    * fails at (lazy) SCAN time with a missing-path error — Spark
    * resolves parquet files at execution, after this method returned,
    * so the window cannot be intercepted here without materializing
    * the frame. The committed direction is live: a caller whose scan
    * of a staging-resolved frame fails should retry [[readIndex]]
    * once (it then resolves the renamed live copy). The window exists
    * only while a crashed compactor is being recovered by its retry —
    * steady-state reads always resolve live directly. */
  def readIndex(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val f = fs(spark, stateDir)
    val l = live(stateDir)
    val s = staging(stateDir)
    if (f.exists(l)) Some(spark.read.parquet(l.toString))
    else if (f.exists(new Path(s, "_SUCCESS")))
      Some(spark.read.parquet(s.toString))
    else None
  }

  /** Writer-side crash recovery: roll an interrupted swap forward
    * (staging complete + live missing ⇒ rename). Called only from the
    * single-writer entry point [[run]] — readers never mutate. */
  private def recover(spark: SparkSession, stateDir: String): Unit = {
    val f = fs(spark, stateDir)
    val l = live(stateDir)
    val s = staging(stateDir)
    if (!f.exists(l) && f.exists(new Path(s, "_SUCCESS"))) {
      if (!f.rename(s, l) && !f.exists(l))
        throw new IllegalStateException(s"roll-forward rename $s -> $l failed")
    }
  }

  /** Fold `batch` into the persisted index (id-keyed upsert). */
  def run(spark: SparkSession, stateDir: String, batch: DataFrame,
          shingleK: Int = 3, bands: Int = 32, rowsPerBand: Int = 4,
          textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val f = fs(spark, stateDir)
    // single-writer enforcement (the GraphArtifact/AnnIndex round-10
    // lease): two concurrent compactions would interleave the
    // staging-overwrite/delete/rename triple undetected
    graft.common.WriterLease.withLease(f,
        new Path(stateDir, "_writer.lease")) {
      runUnlocked(spark, f, stateDir, batch, shingleK, bands, rowsPerBand,
        textCol, idCol)
    }
  }

  private def runUnlocked(spark: SparkSession,
          f: org.apache.hadoop.fs.FileSystem, stateDir: String,
          batch: DataFrame, shingleK: Int, bands: Int, rowsPerBand: Int,
          textCol: String, idCol: String): Unit = {
    recover(spark, stateDir) // writer entry: finish any interrupted swap
    val fresh = indexRows(batch, shingleK, bands, rowsPerBand, textCol, idCol)
    val merged = readIndex(spark, stateDir) match {
      case Some(existing) =>
        existing.join(fresh.select("id"), Seq("id"), "left_anti")
          .unionByName(fresh)
      case None => fresh
    }
    // phase 1: materialize the merged index completely (the live dir is
    // only READ here; overwrite of staging is safe on retry)
    merged.write.mode("overwrite").parquet(staging(stateDir).toString)
    // phase 2 (commit point): swap. Readers are strictly read-only now,
    // but keep the rename tolerant: under the single-writer contract a
    // crashed-then-retried compactor's own recover() may have finished
    // the identical rename — losing it is success iff live exists and
    // staging is gone
    f.delete(live(stateDir), true)
    if (!f.rename(staging(stateDir), live(stateDir)) &&
        !(f.exists(live(stateDir)) && !f.exists(staging(stateDir))))
      throw new IllegalStateException(s"commit rename failed for $stateDir")
    ()
  }

  /** CLI: `Compact <stateDir> <sfDir> <sourcesCsv>` — index the fixture
    * documents whose `source` is in the comma-separated list (the q177
    * batch convention) into the state at `<stateDir>`. */
  def main(args: Array[String]): Unit = {
    val Array(stateDir, sfDir, sourcesCsv) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sources = sourcesCsv.split(',').map(_.trim).toSeq
    val docs = Tables.t(spark, sfDir, "documents")
      .filter(col("source").isin(sources: _*))
    run(spark, stateDir, docs)
    val n = readIndex(spark, stateDir).map(_.count()).getOrElse(0L)
    println(s"""{"state":"$stateDir","indexed_docs":$n}""")
    spark.stop()
  }
}
