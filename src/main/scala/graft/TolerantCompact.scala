package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity
import graft.llm.Similarity.TolerantState

/** Incremental-base compaction for the TOLERANT near-dup family — the
  * [[Compact]] discipline (staged swap, `_FORMAT`, writer lease,
  * id-keyed upsert, from-scratch equivalence) applied to the q305/q306
  * radius-bounded SRP collapse, so a drifted-embedding corpus arriving
  * in batches serves cross-corpus answers from a ready-made asset
  * instead of re-collapsing the accumulated base every arrival
  * (round-13 verdict: "serving the base side from a persisted tolerant
  * state is the remaining step").
  *
  * State layout (`<stateDir>/index/`, the three tiers the round-14
  * byte measurement established — SCALE.md `tolerantindexsize`):
  *  - `groups`: ONE row per leader group `(leader, pop, radius, lv,
  *    sig)` — the SERVE tier a batch's candidate join scans; grows with
  *    how many admission balls the corpus spans, NOT with its
  *    duplication/drift copy count (measured 5.0× under 20× drift
  *    copies vs linear exemplars);
  *  - `exemplars`: one row per DISTINCT vector `(id, v, sig, leader)` —
  *    the exact-verify tier, read only for boundary-band candidates;
  *  - `members`: one SLIM `(id, rep)` row per vector — pure output
  *    expansion;
  *  - `planes`: the SRP plane set `(pid, v)` the signatures were built
  *    with (a signature is meaningless without it);
  *  - `meta`: one row `(width, max_chord, auto)` — the signature width
  *    pinned into every stored sig, the leader-admission chord, and
  *    whether the width came from the [[Similarity.autoSrpBits]] rule
  *    (auto states re-derive it as the corpus grows; explicit states
  *    keep the caller's width forever).
  *
  * APPEND (the q177 analog, per-class surgery): nothing ever re-reads
  * or re-signs the base CORPUS — the only inputs are the batch and the
  * stored tiers. A batch changes a signature class's leader structure
  * only by changing its exemplar ID SET: a NEW distinct vector, a cell
  * DYING (every member re-ingested away), or a cell RELABELING (a
  * batch member with a smaller id than the stored rep — leader choice
  * is min-id, so labels are load-bearing). Exactly those classes
  * re-run the (class-local) leader assignment, against stored vectors;
  * every other class keeps its leaders, radii and exemplar rows
  * verbatim, with only `pop` refreshed from the merged membership (a
  * GROWN cell — more copies of a stored vector — touches nothing
  * else). A width-rule change (auto states crossing a cell-count
  * boundary) re-signs all stored exemplar vectors and recomputes every
  * class — still without the corpus. The invariant, spec-pinned: after
  * ANY sequence of runs the state row-equals
  * [[Similarity.tolerantStateOf]] over the accumulated id → vector
  * mapping. Re-ingesting an id moves it to its fresh vector; absent
  * ids survive (the [[Compact]] upsert contract).
  *
  * Write protocol: verbatim [[Compact]] — full materialize into
  * `_staging` (tiers, then `_FORMAT`, then `_SUCCESS`), swap as the
  * commit point, readers serve a complete staging copy read-only,
  * single writer under [[graft.common.WriterLease]] rolls interrupted
  * swaps forward at entry.
  */
object TolerantCompact {

  private def live(stateDir: String) = new Path(stateDir, "index")
  private def staging(stateDir: String) = new Path(stateDir, "_staging")

  /** v1 = the three-tier layout above. Readers refuse unknown versions
    * (the [[Compact.detectFormat]] lesson: a silently-misread layout
    * corrupts the asset at the first merge). */
  private[graft] val FormatVersion = 1

  private def fs(spark: SparkSession, stateDir: String) =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def detectFormat(f: org.apache.hadoop.fs.FileSystem,
                           root: Path): Int = {
    val marker = new Path(root, "_FORMAT")
    if (!f.exists(marker)) 1
    else {
      val in = f.open(marker)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
    }
  }

  private def resolveRoot(spark: SparkSession, stateDir: String): Option[Path] = {
    val f = fs(spark, stateDir)
    val l = live(stateDir)
    val s = staging(stateDir)
    if (f.exists(l)) Some(l)
    else if (f.exists(new Path(s, "_SUCCESS"))) Some(s)
    else None
  }

  /** Read the committed state. The returned [[TolerantState]] carries
    * no caches — every tier is a plain parquet scan of the asset,
    * which IS the serving story (the groups tier is the small scan;
    * exemplars are touched only by band verification). */
  def readState(spark: SparkSession,
                stateDir: String): Option[(TolerantState, Array[Array[Double]])] =
    resolveRoot(spark, stateDir).map { root =>
      val v = detectFormat(fs(spark, stateDir), root)
      if (v != FormatVersion) throw new IllegalStateException(
        s"tolerant state at $stateDir is format v$v but this build serves " +
          s"v$FormatVersion: run TolerantCompact.run to migrate, or delete " +
          s"$stateDir and rebuild")
      def t(sub: String) = spark.read.parquet(new Path(root, sub).toString)
      val meta = t("meta").head()
      val planes = t("planes").orderBy("pid")
        .collect().map(_.getSeq[Double](1).toArray)
      (TolerantState(t("groups"), t("exemplars"), t("members"),
        meta.getAs[Int]("width"), meta.getAs[Double]("max_chord")),
        planes)
    }

  private def metaAuto(spark: SparkSession, stateDir: String): Boolean =
    resolveRoot(spark, stateDir).exists { root =>
      spark.read.parquet(new Path(root, "meta").toString)
        .head().getAs[Boolean]("auto")
    }

  /** Serve `batch` against the committed state:
    * [[Similarity.srpTolerantServe]] over the stored tiers and planes.
    * Throws when no state exists (a serve path silently answering
    * "no pairs" from a missing asset is the worst failure mode). */
  def serve(spark: SparkSession, stateDir: String, batch: DataFrame,
            threshold: Double, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val (state, planes) = readState(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no tolerant state at $stateDir"))
    Similarity.srpTolerantServe(state, batch, planes, threshold, idCol, vecCol)
  }

  /** Fold `batch` into the state (create on first run). `planes` and
    * `bits`/`maxChord` are consulted ONLY at creation — afterwards the
    * stored planes/chord govern and the width follows the stored
    * auto/explicit mode; passing planes on an append is legal and
    * ignored (the [[Compact.run]] "re-running is a no-op" shape). */
  def run(spark: SparkSession, stateDir: String, batch: DataFrame,
          planes: Array[Array[Double]] = Array.empty, bits: Int = 0,
          maxChord: Double = 0.1, idCol: String = "vec_id",
          vecCol: String = "embedding"): Unit = {
    val f = fs(spark, stateDir)
    graft.common.WriterLease.withLease(f,
        new Path(stateDir, "_writer.lease")) {
      runUnlocked(spark, f, stateDir, batch, planes, bits, maxChord,
        idCol, vecCol)
    }
  }

  private def runUnlocked(spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem, stateDir: String,
      batch: DataFrame, planes: Array[Array[Double]], bits: Int,
      maxChord: Double, idCol: String, vecCol: String): Unit = {
    // writer entry: finish any interrupted swap
    val l = live(stateDir)
    val s = staging(stateDir)
    if (!f.exists(l) && f.exists(new Path(s, "_SUCCESS"))) {
      if (!f.rename(s, l) && !f.exists(l))
        throw new IllegalStateException(s"roll-forward rename $s -> $l failed")
    }
    readState(spark, stateDir) match {
      case None =>
        require(planes.nonEmpty, "creating a tolerant state needs planes")
        val st = Similarity.tolerantStateOf(batch, planes, bits, maxChord,
          idCol, vecCol)
        commitStaged(spark, f, stateDir, st, planes, auto = bits == 0)
        st.caches.foreach(_.unpersist(blocking = false))
      case Some((old, storedPlanes)) =>
        val auto = metaAuto(spark, stateDir)
        val st = merged(spark, old, storedPlanes, auto, batch, idCol, vecCol)
        commitStaged(spark, f, stateDir, st, storedPlanes, auto)
        st.caches.foreach(_.unpersist(blocking = false))
    }
  }

  /** The append merge — stored tiers + batch only, per-class surgery.
    * See the object doc for the affected-class argument. */
  private def merged(spark: SparkSession, old: TolerantState,
      planes: Array[Array[Double]], auto: Boolean, batch: DataFrame,
      idCol: String, vecCol: String): TolerantState = {
    val cosMinAdmit = 1.0 - old.maxChord * old.maxChord / 2.0
    val vb = batch
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(exists(col("v"), x => x =!= lit(0.0)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // id-keyed membership upsert: batch ids leave their old cells
    val survivors = old.members.join(vb.select("id"), Seq("id"), "left_anti")
    val sstat = survivors.groupBy("rep")
      .agg(count(lit(1)).as("sn"), min("id").as("smin"))
    // batch cells matched to stored exemplars BY VECTOR (bit-identical)
    val bcells = vb.groupBy("v")
      .agg(min("id").as("bmin"), count(lit(1)).as("bn"))
    val bmatch = bcells.join(
      old.exemplars.select(col("id").as("rep"), col("v")), Seq("v"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // merged fate of every pre-existing cell: survivors and/or matched
    // batch mass; a rep in neither is DEAD (all members re-ingested
    // away, no batch copy). newRep = min member id, the from-scratch
    // label; newRep != rep is the RELABEL case.
    val cellMerge = sstat.join(
        bmatch.filter(col("rep").isNotNull).select("rep", "bmin"),
        Seq("rep"), "full_outer")
      .select(col("rep"), least(col("smin"), col("bmin")).as("newRep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deadOrRelabeled = old.exemplars.select(col("id").as("rep"), col("sig"))
      .join(cellMerge, Seq("rep"), "left")
      .filter(col("newRep").isNull || col("newRep") =!= col("rep"))
    val newCells = bmatch.filter(col("rep").isNull)
      .select(col("bmin").as("id"), col("v"))
      .withColumn("sig", Similarity.tolerantSig(planes, old.width, col("v")))

    // merged exemplar set (id, v, sig) — live old cells relabeled in
    // place (sig is a vector function, labels don't touch it), plus
    // the genuinely new vectors
    val mergedEx = old.exemplars.select(col("id").as("rep"), col("v"), col("sig"))
      .join(cellMerge, Seq("rep"))                    // dead cells drop here
      .select(col("newRep").as("id"), col("v"), col("sig"))
      .unionByName(newCells)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // merged membership: survivors follow their cell's (possibly
    // relabeled) rep; batch members land on their vector's cell
    val bmap = bmatch.join(cellMerge, Seq("rep"), "left")
      .select(col("v"), coalesce(col("newRep"), col("bmin")).as("rep"))
    val mergedMembers = survivors.select(col("id"), col("rep"))
      .join(cellMerge.select(col("rep"), col("newRep")), Seq("rep"))
      .select(col("id"), col("newRep").as("rep"))
      .unionByName(vb.join(bmap, "v").select("id", "rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exn = mergedMembers.groupBy("rep").agg(count(lit(1)).as("ex_n"))

    // auto states re-derive the width as the corpus grows (the q305
    // deployment rule); a changed answer redraws every class boundary,
    // so the surgery below is bypassed for a full recompute — from
    // STORED vectors, never the corpus
    val width =
      if (!auto) old.width
      else Similarity.autoSrpBits(mergedEx.count(), planes.length)
    if (width != old.width) {
      val allCells = mergedEx.select(col("id"), col("v"))
        .join(exn.withColumnRenamed("rep", "id"), "id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (ex2, assign2, groups2, caches) = Similarity
        .collapseCellsTolerant(allCells, planes, width, cosMinAdmit)
      return TolerantState(groups2,
        ex2.select(col("id"), col("v"), col("sig"))
          .join(assign2.select(col("id"), col("leader")), "id"),
        mergedMembers, width, old.maxChord,
        Seq(vb, bmatch, cellMerge, mergedEx, mergedMembers, allCells) ++ caches)
    }

    // affected classes: any class whose exemplar ID SET changed
    val affectedSigs = deadOrRelabeled.select("sig")
      .unionByName(newCells.select("sig"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val affCells = mergedEx.join(affectedSigs, Seq("sig"), "left_semi")
      .select(col("id"), col("v"))
      .join(exn.withColumnRenamed("rep", "id"), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (affEx, affAssign, affGroups, affCaches) = Similarity
      .collapseCellsTolerant(affCells, planes, width, cosMinAdmit)

    // untouched classes keep exemplars/leaders/radii verbatim; only
    // pop refreshes (grown cells) from the merged membership
    val keepEx = old.exemplars
      .join(affectedSigs, Seq("sig"), "left_anti")
      .select(col("id"), col("v"), col("sig"), col("leader"))
    val keepGroups = old.groups.drop("pop")
      .join(affectedSigs, Seq("sig"), "left_anti")
      .join(keepEx.select(col("leader"), col("id"))
          .join(exn.withColumnRenamed("rep", "id"), "id")
          .groupBy("leader").agg(sum("ex_n").as("pop")),
        "leader")
      .select(col("leader"), col("pop"), col("radius"), col("lv"), col("sig"))

    TolerantState(
      keepGroups.unionByName(affGroups),
      keepEx.unionByName(
        affEx.select(col("id"), col("v"), col("sig"))
          .join(affAssign.select(col("id"), col("leader")), "id")),
      mergedMembers, width, old.maxChord,
      Seq(vb, bmatch, cellMerge, mergedEx, mergedMembers, affectedSigs,
        affCells) ++ affCaches)
  }

  /** Phase 1 into staging (tiers, planes, meta, `_FORMAT`, then
    * `_SUCCESS`), phase 2 the swap — verbatim [[Compact.commitStaged]]
    * tolerance: losing the rename is success iff live exists and
    * staging is gone (a crashed-then-retried writer's own recovery). */
  private def commitStaged(spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem, stateDir: String,
      st: TolerantState, planes: Array[Array[Double]],
      auto: Boolean): Unit = {
    import spark.implicits._
    val s = staging(stateDir)
    f.delete(s, true)
    st.groups.write.parquet(new Path(s, "groups").toString)
    st.exemplars.write.parquet(new Path(s, "exemplars").toString)
    st.members.write.parquet(new Path(s, "members").toString)
    planes.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("pid", "v").coalesce(1)
      .write.parquet(new Path(s, "planes").toString)
    Seq((st.width, st.maxChord, auto)).toDF("width", "max_chord", "auto")
      .coalesce(1).write.parquet(new Path(s, "meta").toString)
    val m = f.create(new Path(s, "_FORMAT"), true)
    m.write(FormatVersion.toString.getBytes("UTF-8")); m.close()
    f.create(new Path(s, "_SUCCESS"), true).close()
    f.delete(live(stateDir), true)
    if (!f.rename(s, live(stateDir)) &&
        !(f.exists(live(stateDir)) && !f.exists(s)))
      throw new IllegalStateException(s"commit rename failed for $stateDir")
    ()
  }

  /** CLI: `TolerantCompact <stateDir> <sfDir> build|append[:N]|serve`
    * over the q306 fixture split (base = vec_id % 5 != 0, batch = the
    * rest) — the process-boundary instrument: `build` indexes the
    * base, `serve` (a separate process) answers the batch from disk
    * alone. `append:N` folds only every Nth batch vector (a 1/N-sized
    * arrival) — the surgery's cost tracks the AFFECTED-CLASS count,
    * so arrival size is the variable worth sweeping. */
  def main(args: Array[String]): Unit = {
    val Array(stateDir, sfDir, mode) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val t0 = System.nanoTime()
    mode match {
      case "build"  => run(spark, stateDir, base,
        Similarity.firstNPlanes(base, 32))
      case "append" => run(spark, stateDir, batch)
      case m if m.startsWith("append:") =>
        val n = m.stripPrefix("append:").toInt
        run(spark, stateDir, batch.filter(col("vec_id") % (5L * n) === 0))
      case "serve"  =>
        val n = serve(spark, stateDir, batch, 0.3)
          .queryExecution.toRdd.count()
        println(s"""{"served_pairs":$n}""")
      case other => sys.error(s"unknown mode $other")
    }
    println(f"""{"mode":"$mode","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    spark.stop()
  }
}
