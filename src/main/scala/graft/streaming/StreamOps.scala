package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9/§7 M6 — the reference is
  * batch-only; streams are this engine's extension surface).
  *
  * All transforms are source-agnostic: they accept any DataFrame with the
  * events schema (event_id, ts timestamp, user_id, event_type, value),
  * batch or streaming — the standard Structured Streaming contract, which
  * is also what makes them testable by replaying the parquet fixture
  * through a file/memory stream.
  *
  * Scale: every aggregation below is keyed (window/type/user), so state
  * is partitioned across executors by key; watermarks bound state size —
  * nothing accumulates unboundedly.
  */
object StreamOps {

  /** Parquet-backed streaming read of the events fixture. The `ts`
    * physical type differs across fixture generations (TIMESTAMP(NANOS)
    * → raw long, TIMESTAMP(MICROS) without UTC adjustment → NTZ); the
    * stream declares whatever the file actually holds — probed via a
    * batch schema read, since a file stream cannot infer — and
    * normalizes to a session-zone TIMESTAMP exactly as [[graft.Tables.t]]. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", tsType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    // the file stream source watches a DIRECTORY; the fixture is a single
    // parquet file, so stage a symlink dir (no data copy)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(streamDir.toString), tsType)
  }

  /** Tumbling-window counts/sums per event type, late data dropped past
    * the watermark. */
  def tumblingAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Sliding-window moving sum (windowLen every slide). */
  def slidingAgg(events: DataFrame, windowLen: String, slide: String,
                 watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))

  /** Session windows per user: events separated by less than `gap` fuse
    * into one session (built-in session_window — state bounded by
    * watermark). */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Stream-stream interval join: each left event pairs with right
    * events of the same user whose timestamp falls in
    * [left.ts, left.ts + horizon]. On streaming inputs pass `watermark`
    * — the time-range condition plus both watermarks lets the join
    * evict state (a right row can be dropped once the left watermark
    * passes rt − horizon, the canonical bounded-state stream join). On
    * batch inputs (watermark = None) the same plan is an equi+range
    * join, which is what the oracle checks.
    *
    * `joinType` "left_outer" emits unmatched left rows (null right
    * columns) once the watermark passes left.ts + horizon — the
    * abandoned-cart shape; requires `watermark` on streaming inputs. */
  def intervalJoin(left: DataFrame, right: DataFrame, horizon: String,
                   watermark: Option[String] = None,
                   joinType: String = "inner"): DataFrame = {
    val c = watermark.fold(left)(w => left.withWatermark("ts", w)).alias("c")
    val p = watermark.fold(right)(w => right.withWatermark("ts", w)).alias("p")
    c.join(p,
        col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") <= col("c.ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        col("p.event_id").as("purchase_id"), col("p.value").as("purchase_value"))
  }

  /** Streaming exact dedup on event_id within the watermark horizon
    * (`dropDuplicates` keyed state — the streaming analog of
    * [[graft.llm.Dedup.exact]]). */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** Stream-static enrichment join: each micro-batch of the stream is
    * hash-joined against a STATIC dimension frame (no watermark, no
    * state — the dimension is re-resolvable per batch, so a broadcast
    * join keeps the stream shuffle-free). This is the streaming face of
    * every fact→dim lookup in the batch library; at 100 TB the static
    * side is the small one by construction, so `broadcast()` is forced
    * rather than left to the estimator. */
  def enrichStatic(stream: DataFrame, dim: DataFrame, streamKey: String,
                   dimKey: String, dimCols: Seq[String]): DataFrame = {
    // alias the dim key: a bare drop(dimKey) would also remove a
    // same-named STREAM column, and streamKey == dimKey would make the
    // join condition ambiguous
    val k = "_graft_dim_key"
    val payload = dimCols.distinct.filterNot(_ == dimKey)
    val d = dim.select((col(dimKey).as(k) +: payload.map(col)): _*)
    stream.join(broadcast(d), col(streamKey) === col(k), "left_outer")
      .drop(k)
  }

  /** Incremental snapshot maintenance: apply each micro-batch of change
    * rows to a keyed parquet snapshot via [[graft.operators.Merge.upsert]]
    * inside `foreachBatch` — the streaming face of CDC apply. Within a
    * batch, duplicate keys resolve to the latest row by `seqCol` (ties by
    * the remaining columns' order is irrelevant: row_number over the seq
    * desc is deterministic only if seq is unique per key per batch — the
    * caller supplies a monotonic sequence such as an event id).
    *
    * Scale: each micro-batch is one keyed full-outer join against the
    * snapshot plus a full rewrite of the snapshot files. At 100 TB the
    * rewrite is the cost that matters — partition the snapshot on a key
    * prefix and rewrite only the partitions a batch touches (dynamic
    * partition overwrite, as in `Engine.writePartitioned`); the
    * read–merge–write skeleton here stays identical. Restart-safe:
    * foreachBatch re-delivers a batch id after failure, and re-applying
    * the same upsert batch is idempotent (last-writer-wins by key). */
  def upsertSink(changes: DataFrame, snapshotDir: String, keys: Seq[String],
                 seqCol: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    changes.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // existence via the Hadoop FS API: a java.io.File check is always
        // false for hdfs://-s3a://-style paths, which would silently turn
        // every batch into a full overwrite losing all previous keys
        val snapPath = new org.apache.hadoop.fs.Path(snapshotDir)
        val fs = snapPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(snapPath)) {
            val snap = spark.read.parquet(snapshotDir)
            graft.operators.Merge.upsert(snap, latest.select(
              snap.columns.map(col).toSeq: _*), keys)
          } else latest
        // materialize before overwriting the input path
        val staged = merged.localCheckpoint(true)
        staged.write.mode("overwrite").parquet(snapshotDir)
        ()
      }
      .start()
  }

  /** Streaming decontamination admission control (the online twin of
    * q87, `queries/Curation.decontam`): each incoming micro-batch of
    * docs is screened against a STATIC held-out benchmark's distinct
    * word-k-gram set, and only clean docs are admitted to the sink.
    * The benchmark shingle set is computed once, persisted, and
    * broadcast into each batch's semi-join — the batch never shuffles
    * and the benchmark is never rescanned. Admitted docs land in a
    * per-batch subdirectory written with overwrite mode (same
    * idempotence contract as [[nearDupAlerts]]: a re-delivered batch
    * rewrites its own directory). */
  def decontamFilter(docs: DataFrame, benchmark: DataFrame, outDir: String,
                     checkpointDir: String, shingleK: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.llm.TextOps
    val benchShingles = benchmark
      .select(explode(TextOps.wordShingles(col("text"), shingleK)).as("sh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val contaminated = batch
          .select(col("doc_id"),
            explode(TextOps.wordShingles(col("text"), shingleK)).as("sh"))
          .join(broadcast(benchShingles), "sh")
          .select("doc_id").distinct()
        batch.join(contaminated, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming distribution-drift monitor — the q198 TV statistic as an
    * admission-control alarm: each micro-batch of incoming documents is
    * scored per source against a STATIC base corpus's unigram
    * distribution (computed once, persisted, broadcast per batch), and
    * the per-(batch, source) total-variation distance appends to a
    * parquet sink. Novel terms the base has never seen contribute their
    * full probability mass (LEFT join + coalesce-to-0 — exactly the
    * "new domain appeared in the crawl" signal); base vocabulary the
    * batch lacks folds in as 1 − Σ q_t, so no vocab×sources product
    * exists here either.
    *
    * foreachBatch so the scoring is plain batch ops with bounded state;
    * per-batch `batch=<id>` overwrite directories make re-delivery
    * idempotent (the nearDupAlerts sink discipline). Scale: the base
    * distribution is vocabulary-bounded and broadcasts; each batch
    * shuffles its own (source, term) counts only. */
  def driftMonitor(docs: DataFrame, base: DataFrame, outDir: String,
                   checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.llm.TextOps
    val bt = base.select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c_t"))
    val nTot = bt.agg(sum("c_t")).head().get(0) match {
      case n: java.lang.Long if n > 0 => n.toLong
      case _ => throw new IllegalArgumentException(
        "driftMonitor base corpus has no tokens — the base distribution is undefined")
    }
    val baseDist = bt
      .select(col("term"),
        (col("c_t").cast("double") / lit(nTot.toDouble)).as("q_t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val underlying = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val st = batch
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy("source", "term").agg(count(lit(1)).as("c_st"))
        val ns = st.groupBy("source").agg(sum("c_st").as("n_s"))
        st.join(broadcast(baseDist), Seq("term"), "left")
          .join(broadcast(ns), "source")
          .select(col("source"),
            (col("c_st").cast("double") / col("n_s").cast("double")).as("p_t"),
            coalesce(col("q_t"), lit(0.0)).as("q_t"))
          .groupBy("source")
          .agg(count(lit(1)).cast("int").as("n_terms"),
            sum(abs(col("p_t") - col("q_t"))).as("od"),
            sum(col("q_t")).as("qm"))
          .select(col("source"), col("n_terms"),
            (round((col("od") + (lit(1.0) - col("qm"))) * lit(0.5), 4) + lit(0.0))
              .as("tv_dist"))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
    new UnpersistOnStopQuery(underlying, baseDist)
  }

  /** Delegating [[StreamingQuery]] handle whose `stop()` also releases
    * the DataFrames the monitor cached for its lifetime — without it,
    * repeated monitor starts on a long-lived session would accumulate
    * persisted static sides with no way to free them. */
  private final class UnpersistOnStopQuery(
      underlying: org.apache.spark.sql.streaming.StreamingQuery,
      cached: DataFrame*)
      extends org.apache.spark.sql.streaming.StreamingQuery {
    def name: String = underlying.name
    def id: java.util.UUID = underlying.id
    def runId: java.util.UUID = underlying.runId
    def sparkSession: SparkSession = underlying.sparkSession
    def isActive: Boolean = underlying.isActive
    def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] =
      underlying.exception
    def status: org.apache.spark.sql.streaming.StreamingQueryStatus =
      underlying.status
    def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      underlying.recentProgress
    def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
      underlying.lastProgress
    def awaitTermination(): Unit = underlying.awaitTermination()
    def awaitTermination(timeoutMs: Long): Boolean =
      underlying.awaitTermination(timeoutMs)
    def processAllAvailable(): Unit = underlying.processAllAvailable()
    def stop(): Unit = {
      try underlying.stop()
      finally { cached.foreach(_.unpersist()); () }
    }
    def explain(): Unit = underlying.explain()
    def explain(extended: Boolean): Unit = underlying.explain(extended)
  }

  /** Streaming near-duplicate detection against a STATIC corpus index:
    * the batch LSH index (banded keys + shingle sets, built once and
    * persisted) is joined per micro-batch against the incoming docs'
    * band keys, candidates are exact-Jaccard verified, and alerts
    * `(doc_id, corpus_id, jaccard)` append to a parquet sink — the
    * admission-control shape of a training pipeline ("is this new
    * document a near-dup of anything we already have?").
    *
    * foreachBatch (not a raw stream-static join) so in-batch duplicate
    * candidates collapse with plain batch ops — state stays bounded by
    * the micro-batch, re-delivered batches rewrite the same alerts
    * (idempotent by candidate key), and [[graft.llm.Lsh.bucketPairs]]'s
    * candidate discipline is reused verbatim. Scale: the static index is
    * the big side and is already keyed by (band, hash) — each batch is
    * a broadcast-or-SMJ equi-join of a SMALL batch against it; nothing
    * rescans the corpus text.
    *
    * Alerts land in a per-batch subdirectory (`batch=<id>`) written with
    * overwrite mode, so a re-delivered batch after failure REWRITES its
    * own directory instead of appending duplicates — that is what makes
    * the sink idempotent. */
  def nearDupAlerts(docs: DataFrame, corpus: DataFrame, alertDir: String,
                    checkpointDir: String, threshold: Double = 0.8,
                    shingleK: Int = 3, bands: Int = 32, rowsPerBand: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.llm.TextOps
    val corpusShingles = corpus
      .select(col("doc_id").as("corpus_id"),
        TextOps.wordShingles(col("text"), shingleK).as("c_shingles"))
      .filter(size(col("c_shingles")) > 0)
    val corpusBanded = corpusShingles
      .select(col("corpus_id"),
        posexplode(graft.functions.Hashing.minhashBands(
          col("c_shingles"), bands, rowsPerBand)))
      .select(col("corpus_id"), col("pos").as("band"), col("col").as("bh"))
    nearDupAlertsWith(docs, corpusShingles, corpusBanded, alertDir,
      checkpointDir, threshold, shingleK, bands, rowsPerBand)
  }

  /** [[nearDupAlerts]] served from a [[graft.Compact]]-maintained base
    * index (`(id, fp, shingles, bands)`) instead of re-shingling the
    * corpus at monitor start — the streaming twin of
    * [[graft.llm.Dedup.minhashLshAgainstIndex]], and the shape the 100 TB
    * deployment actually runs: `Compact` folds each accepted batch into
    * the state; the alert monitor reads the same state's stored shingle
    * sets and band keys. Spec-pinned to emit exactly the batch path's
    * answers. */
  def nearDupAlertsFromIndex(docs: DataFrame, index: DataFrame,
                             alertDir: String, checkpointDir: String,
                             threshold: Double = 0.8, shingleK: Int = 3,
                             bands: Int = 32, rowsPerBand: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val nonEmpty = index.filter(size(col("shingles")) > 0)
    val corpusShingles = nonEmpty
      .select(col("id").as("corpus_id"), col("shingles").as("c_shingles"))
    val corpusBanded = nonEmpty
      .select(col("id").as("corpus_id"), posexplode(col("bands")))
      .select(col("corpus_id"), col("pos").as("band"), col("col").as("bh"))
    nearDupAlertsWith(docs, corpusShingles, corpusBanded, alertDir,
      checkpointDir, threshold, shingleK, bands, rowsPerBand)
  }

  /** Shared alert loop: the static side arrives as (corpus_id,
    * c_shingles) + (corpus_id, band, bh), is cached for the monitor's
    * lifetime, and released by the returned handle's `stop()` (the
    * driftMonitor cache discipline). */
  private def nearDupAlertsWith(docs: DataFrame, corpusShinglesRaw: DataFrame,
                                corpusBandedRaw: DataFrame, alertDir: String,
                                checkpointDir: String, threshold: Double,
                                shingleK: Int, bands: Int, rowsPerBand: Int)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.llm.TextOps
    val corpusShingles = corpusShinglesRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusBanded = corpusBandedRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val underlying = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sh = batch
          .select(col("doc_id"), TextOps.wordShingles(col("text"), shingleK).as("shingles"))
          .filter(size(col("shingles")) > 0)
        val banded = sh.select(col("doc_id"),
          posexplode(graft.functions.Hashing.minhashBands(
            col("shingles"), bands, rowsPerBand)))
          .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))
        val cand = banded.join(corpusBanded, Seq("band", "bh"))
          .filter(col("doc_id") =!= col("corpus_id"))
          .select("doc_id", "corpus_id").distinct()
        val alerts = cand.join(sh, "doc_id").join(corpusShingles, "corpus_id")
          .select(col("doc_id"), col("corpus_id"),
            round(TextOps.jaccard(col("shingles"), col("c_shingles")), 4).as("jaccard"))
          .filter(col("jaccard") >= threshold)
        alerts.write.mode("overwrite").parquet(s"$alertDir/batch=$batchId")
        ()
      }
      .start()
    new UnpersistOnStopQuery(underlying, corpusShingles, corpusBanded)
  }

  // ---- custom state: KMV distinct-cardinality monitor (q232's twin) ----

  case class KmvState(hashes: List[Long], updates: Int)
  case class KmvUpdate(source: String, updates: Int, n_sketch: Int,
                       est: Double)

  /** Streaming per-source vocabulary-cardinality monitor: the k-minimum-
    * values sketch of batch q232 ([[graft.queries.Analytics.kmvDistinct]])
    * maintained as keyed state — each micro-batch's token hashes merge
    * into the k smallest seen, which by the KMV merge law (StatOpsSpec
    * pins it) makes the streamed fold EQUAL the batch sketch over the
    * same corpus, regardless of batching. State is exactly ≤k longs per
    * source; one estimate row is emitted per source per touching batch,
    * with a monotone `updates` counter so consumers can keep the latest.
    * The hash kernel is the same codegen'd md5-prefix expression the
    * batch query uses, applied BEFORE the stateful stage so the shuffle
    * carries (source, hash) pairs only. */
  def kmvMonitor(docs: DataFrame, k: Int = 64): Dataset[KmvUpdate] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"),
        explode(graft.llm.TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"),
        conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, KmvUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long)],
         state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(Nil, 0))
          val merged = (prev.hashes ++ rows.map(_._2))
            .distinct.sorted.take(k)
          val st = KmvState(merged, prev.updates + 1)
          state.update(st)
          val est =
            if (merged.length >= k)
              BigDecimal((k - 1).toDouble * 4294967296.0 /
                merged.last.toDouble)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            else merged.length.toDouble
          Iterator.single(KmvUpdate(src, st.updates, merged.length, est))
      }
  }

  // ---- custom state: quantile-sketch monitor (q257's twin) ----

  case class QuantUpdate(key: String, n: Long, n_sample: Int, p50_cents: Long)

  /** Streaming quantile monitor: the bottom-k-by-hash sample sketch of
    * batch q257 maintained as keyed state, folding each micro-batch
    * through the SAME [[graft.functions.QuantileSketchAgg]]
    * reduce/merge the batch aggregate uses — so by the sketch's merge
    * law (QuantileSketchSpec pins it) the streamed fold EQUALS the
    * batch sketch over the same rows regardless of batching.
    * Input rows are (key, h, v) with `h` the
    * [[graft.queries.Fragments.sampleHash]] of the row key, computed
    * BEFORE the stateful stage so the shuffle carries three longs per
    * row. State is ≤4k (h, v) pairs per key; emits the running median
    * estimate per key per touching batch. */
  def quantileMonitor(rows: Dataset[(String, Long, Long)],
                      k: Int = 256): Dataset[QuantUpdate] = {
    import rows.sparkSession.implicits._
    val agg = new graft.functions.QuantileSketchAgg(k)
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[graft.functions.QsBuf, QuantUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long, Long)],
         state: GroupState[graft.functions.QsBuf]) =>
          val prev = state.getOption.getOrElse(agg.zero)
          val st = it.foldLeft(prev) { (b, r) =>
            agg.reduce(b, graft.functions.HV(r._2, r._3))
          }
          state.update(st)
          val res = agg.finish(st)
          val p50 =
            if (res.sample.isEmpty) 0L
            else res.sample(math.ceil(0.5 * res.sample.length).toInt - 1)
          Iterator.single(QuantUpdate(key, res.n, res.sample.length, p50))
      }
  }

  // ---- custom state: 8-tap EWMA smoothing (q219's streaming twin) ----

  case class EwmaState(cents: List[Long], n: Long)
  case class EwmaUpdate(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming truncated exponential smoothing: the per-user 8-tap
    * EWMA(α=1/2) of batch q219 ([[graft.queries.Extended.ewmaSmooth]])
    * as keyed state — exactly the last ≤8 event values (cents) per
    * user, so the streamed fold over any batching equals the batch
    * window's answer at the same prefix (StreamingSpec proves the final
    * emission matches q219 row for row). Events inside a micro-batch
    * fold in (ts, event_id) order; power-of-two weights keep the
    * smoothed value an exact integer ratio. */
  def ewmaMonitor(events: Dataset[Ev]): Dataset[EwmaUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[EwmaState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prev = state.getOption.getOrElse(EwmaState(Nil, 0L))
          // newest first, capped at 8 — the exact state the batch lag
          // chain reads
          // HALF_UP (away-from-zero), NOT math.round's floor(x+0.5):
          // batch q219 and the oracle round() a -0.005 cent to -1, while
          // floor(-0.005*100+0.5) = 0 — the one value class where the
          // streamed state would diverge from the batch answer
          val cents = sorted.foldLeft(prev.cents) { (acc, e) =>
            (BigDecimal(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong :: acc).take(8)
          }
          val st = EwmaState(cents, prev.n + sorted.length)
          state.update(st)
          val num = cents.zipWithIndex.map { case (v, k) =>
            v << (7 - k)
          }.sum
          val den = cents.indices.map(k => 1L << (7 - k)).sum
          val ewma = BigDecimal(num.toDouble / (den.toDouble * 100.0))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator.single(EwmaUpdate(userId, st.n, ewma))
      }
  }

  // ---- custom state: CUSUM mean-shift monitor (q279's twin) ----

  case class CusumState(sv: Long, mx: Long, nAlarm: Long, first: Long,
                        idx: Long)
  case class CusumUpdate(event_type: String, n_days: Long, sv: Long,
                         cusum_max: Long, n_alarm: Long, first_alarm: Long)

  /** Streaming one-sided CUSUM control chart: batch q279's
    * integer-exact recursion S·nd ← max(0, S·nd + c·nd − Σc) folded as
    * keyed state over in-order daily counts, against a FIXED
    * calibration reference (Σc, nd of the calibration window) — the
    * offline-calibrate / online-monitor split production control
    * charts use (the monitor must not rederive its mean from the data
    * it is judging). Input rows are (event_type, day, count)
    * pre-aggregated daily rollups arriving in day order; days inside a
    * micro-batch fold in day order. State is five longs per type; one
    * update per type per touching batch, alarm when S·nd > 3·Σc
    * (StreamingSpec proves the final emission equals q279 row for
    * row when calibrated on the same window). */
  def cusumMonitor(daily: Dataset[(String, String, Long)],
                   ref: Map[String, (Long, Long)]): Dataset[CusumUpdate] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[(String, String, Long)],
         state: GroupState[CusumState]) =>
          val (tot, nd) = ref.getOrElse(et, (0L, 1L))
          var st = state.getOption
            .getOrElse(CusumState(0L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_._2).foreach { r =>
            val sv = math.max(0L, st.sv + r._3 * nd - tot)
            val idx = st.idx + 1
            val alarm = sv > 3 * tot
            st = CusumState(sv, math.max(st.mx, sv),
              st.nAlarm + (if (alarm) 1L else 0L),
              if (st.first == 0L && alarm) idx else st.first, idx)
          }
          state.update(st)
          Iterator.single(CusumUpdate(et, st.idx, st.sv, st.mx,
            st.nAlarm, st.first))
      }
  }

  // ---- custom state: sessionization via flatMapGroupsWithState ----

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class UserSession(user_id: Long, start_ms: Long, end_ms: Long,
                         n_events: Int, total_value: Double)

  /** Custom stateful sessionization: per-user sessions closed after
    * `gapMs` of processing-time inactivity — the `flatMapGroupsWithState`
    * extension point (§2.10: arbitrary keyed state the built-in windows
    * can't express, e.g. emitting only CLOSED sessions). */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // batch-replay semantics: fold this micro-batch's events in ts
          // order, closing sessions whenever the gap exceeds gapMs
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                closed += UserSession(userId, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  // ---- custom state: session paths (q253's streaming twin) ----

  case class PathState(startUs: Long, lastUs: Long, path: List[String])
  case class SessionPath(user_id: Long, path: String, n_events: Int,
                         start_us: Long, end_us: Long)

  /** Exact event-time micros of a timestamp — `getTime` alone truncates
    * to millis, which would move a gap that straddles a millisecond
    * boundary relative to batch q253's `unix_micros` compare. */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Sticky-session path assembly: per-user ordered event-type journeys
    * within 30-minute-gap sessions — the streaming twin of batch q253
    * ([[graft.queries.Extended.topPaths]]), whose session rule
    * (strictly-greater-than-gap in MICROSECONDS, (ts, event_id) order
    * within a session) is reproduced exactly, so the closed paths
    * streamed over any batching equal the batch paths over the same
    * prefix (StreamingSpec proves top-path parity against q253).
    *
    * State per user is ONE open session: (start, last, reversed path) —
    * bounded by session length, not history. A session closes when a
    * later event breaches the gap (deterministic, replay-safe) or — when
    * `timeoutMs` > 0 — when processing time passes with no events, via
    * `ProcessingTimeTimeout` (the operational close for abandoned
    * sessions; inherently wall-clock, so parity specs use the gap
    * path). */
  /** The per-group transition of [[sessionPaths]], exposed so the
    * timeout branch is testable against
    * `org.apache.spark.sql.streaming.TestGroupState` without a live
    * wall clock (a ProcessingTimeTimeout livelocks
    * `processAllAvailable` under MemoryStream replay — timers keep the
    * engine perpetually "not caught up", so specs drive this function
    * directly instead). */
  private[graft] def pathStep(userId: Long, evs: Iterator[Ev],
      state: GroupState[PathState], gapUs: Long,
      timeoutMs: Long): Iterator[SessionPath] = {
    def close(s: PathState) = SessionPath(userId,
      s.path.reverse.mkString(">"), s.path.length, s.startUs, s.lastUs)
    if (state.hasTimedOut) {
      // operational close: flush the open session after inactivity
      val out = state.getOption.map(close).iterator
      state.remove()
      out
    } else {
      val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var cur = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionPath]
      for (e <- sorted) {
        val t = micros(e.ts)
        cur match {
          case Some(s) if t - s.lastUs <= gapUs =>
            cur = Some(PathState(s.startUs, t, e.event_type :: s.path))
          case Some(s) =>
            closed += close(s)
            cur = Some(PathState(t, t, e.event_type :: Nil))
          case None =>
            cur = Some(PathState(t, t, e.event_type :: Nil))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
      }
      closed.iterator
    }
  }

  def sessionPaths(events: Dataset[Ev], gapUs: Long = 1800000000L,
                   timeoutMs: Long = 0L): Dataset[SessionPath] = {
    import events.sparkSession.implicits._
    val mode =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, SessionPath](
        OutputMode.Append, mode)(pathStep(_, _, _, gapUs, timeoutMs))
  }

  // ---- custom state: last-touch attribution (q176's streaming twin) ----

  case class AttrEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double, k: Long)
  case class AttrState(lastTs: Long, lastId: Long, lastK: Long)
  case class Attribution(user_id: Long, purchase_id: Long, attr_k: Long,
                         cents: Long)

  /** Streaming last-touch attribution: each purchase credits the user's
    * most recent prior click key, carried across micro-batches as one
    * (ts, event_id, key) triple of keyed state per user — the
    * bounded-state streaming twin of batch q176
    * ([[graft.queries.Analytics.attribution]]). Events inside a
    * micro-batch fold in (ts, event_id) order, and the carried click
    * only advances on a NEWER (ts, event_id) — so a late-arriving old
    * click can never overwrite a newer credit, and purchases delivered
    * in their time-ordered batch credit identically to the batch window
    * form (the spec proves it across a batch boundary). At scale this
    * is the q147-as-of shape with streaming state instead of a sort:
    * state size is O(active users), independent of event volume. */
  def attributeLastTouch(events: Dataset[AttrEv]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[AttrEv], state: GroupState[AttrState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(
            AttrState(Long.MinValue, Long.MinValue, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
          for (e <- sorted) e.event_type match {
            // k < 0 encodes a click with no key: the batch twin's
            // last(ignoreNulls) skips those, so the carried credit must
            // survive them here too rather than reset
            case "click" if e.k >= 0 &&
              (e.ts.getTime > st.lastTs ||
                (e.ts.getTime == st.lastTs && e.event_id > st.lastId)) =>
              st = AttrState(e.ts.getTime, e.event_id, e.k)
            case "purchase" =>
              out += Attribution(userId, e.event_id, st.lastK,
                math.round(e.value * 100))
            case _ => ()
          }
          state.update(st)
          out.iterator
      }
  }
}
