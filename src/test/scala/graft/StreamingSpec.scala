package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** Streaming surface specs: replay the events parquet fixture through a
  * file stream and assert the streaming result equals the same transform
  * computed in batch — the Structured Streaming unification contract. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  private lazy val batchEvents = Tables.t(spark, sf, "events").cache()

  /** Final watermark of an AvailableNow replay: max event time − delay.
    * Append mode only emits windows fully below it; the tail windows stay
    * open in state — the comparisons mirror that semantic. */
  private lazy val finalWatermark: java.sql.Timestamp = {
    val maxTs = batchEvents.agg(max("ts")).collect()(0).getTimestamp(0)
    new java.sql.Timestamp(maxTs.getTime - 10 * 60000L)
  }

  test("tumbling window agg matches batch computation for closed windows") {
    val streamed = runToMemory(
      StreamOps.tumblingAgg(StreamOps.readEventsStream(spark, sf), "1 hour", "10 minutes"),
      "t_tumbling")
    val batch = StreamOps.tumblingAgg(batchEvents, "1 hour", "10 minutes")
      .filter(col("w_start") + expr("INTERVAL 1 HOUR") <= lit(finalWatermark))
    val a = streamed.orderBy("w_start", "event_type").collect().toSeq
    val b = batch.orderBy("w_start", "event_type").collect().toSeq
    assert(a.nonEmpty); assert(a === b)
  }

  test("sliding window agg produces overlapping windows") {
    val got = runToMemory(
      StreamOps.slidingAgg(StreamOps.readEventsStream(spark, sf), "2 hours", "1 hour", "10 minutes"),
      "t_sliding")
    val batch = StreamOps.slidingAgg(batchEvents, "2 hours", "1 hour", "10 minutes")
      .filter(col("w_end") <= lit(finalWatermark))
    assert(got.count() > 0)
    assert(got.orderBy("w_start").collect().toSeq ===
      batch.orderBy("w_start").collect().toSeq)
    // overlap sanity on the batch side: each event lands in exactly 2 windows
    val total = StreamOps.slidingAgg(batchEvents, "2 hours", "1 hour", "10 minutes")
      .agg(sum("n")).as[Long].head()
    assert(total === 2 * batchEvents.count())
  }

  test("session windows fuse events within gap") {
    val streamed = runToMemory(
      StreamOps.sessionAgg(StreamOps.readEventsStream(spark, sf), "30 minutes", "10 minutes"),
      "t_session")
    val batch = StreamOps.sessionAgg(batchEvents, "30 minutes", "10 minutes")
      .filter(col("session_end") <= lit(finalWatermark))
    assert(streamed.count() > 0)
    assert(streamed.orderBy("user_id", "session_start").collect().toSeq ===
      batch.orderBy("user_id", "session_start").collect().toSeq)
  }

  test("stream-stream interval join matches the batch twin") {
    val src = StreamOps.readEventsStream(spark, sf)
    val clicks = src.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = src.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val streamed = runToMemory(
      StreamOps.intervalJoin(clicks, purchases, "30 minutes", Some("10 minutes")),
      "t_interval_join")
    val batch = graft.queries.Extended.intervalJoinBatch(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.orderBy("click_id", "purchase_id").collect().toSeq ===
      batch.collect().toSeq)
  }

  test("stream-stream LEFT OUTER interval join emits unmatched rows after watermark") {
    val src = StreamOps.readEventsStream(spark, sf)
    val clicks = src.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = src.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val streamed = runToMemory(
      StreamOps.intervalJoin(clicks, purchases, "30 minutes",
        Some("10 minutes"), "left_outer"),
      "t_interval_loj")

    val bc = batchEvents.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val bp = batchEvents.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val batch = StreamOps.intervalJoin(bc, bp, "30 minutes", None, "left_outer")

    // null-emission for a click is only DETERMINED once the GLOBAL
    // watermark (min over both branch watermarks, each maxTs − delay
    // over the rows that branch saw) passes click.ts + horizon; compare
    // the settled region on both sides, backed off 1 minute so
    // boundary-inequality strictness can't flip a row
    val maxClickTs = batchEvents.filter(col("event_type") === "click")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val maxPurchTs = batchEvents.filter(col("event_type") === "purchase")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val wm = new java.sql.Timestamp(
      math.min(maxClickTs.getTime, maxPurchTs.getTime) - 10 * 60000L)
    val settled = lit(wm) - expr("INTERVAL 31 minutes")
    def determined(df: org.apache.spark.sql.DataFrame) = {
      val clickTs = batchEvents.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("c_ts"))
      df.join(clickTs, "click_id").filter(col("c_ts") < settled)
        .select("click_id", "user_id", "purchase_id", "purchase_value")
    }
    val a = determined(streamed).orderBy("click_id", "purchase_id").collect().toSeq
    val b = determined(batch).orderBy("click_id", "purchase_id").collect().toSeq
    assert(a.nonEmpty)
    assert(a.exists(_.isNullAt(2)), "some clicks should have no purchase within horizon")
    assert(a === b)
  }

  test("streaming dedup drops duplicate event ids") {
    val deduped = runToMemory(
      StreamOps.dedupStream(StreamOps.readEventsStream(spark, sf), "1 hour"), "t_dedup")
    assert(deduped.count() === batchEvents.dropDuplicates("event_id").count())
  }

  test("stream-static enrichment matches the batch join and broadcasts the dim") {
    val dim = Tables.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = runToMemory(
      StreamOps.enrichStatic(StreamOps.readEventsStream(spark, sf), dim,
        streamKey = "user_id", dimKey = "c_custkey", dimCols = Seq("c_mktsegment")),
      "t_enrich")
    val batch = StreamOps.enrichStatic(batchEvents, dim,
      "user_id", "c_custkey", Seq("c_mktsegment"))
    assert(enriched.count() === batchEvents.count(), "left outer keeps every event")
    assert(enriched.orderBy("event_id").collect().toSeq ===
      batch.orderBy("event_id").collect().toSeq)
    assert(batch.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("streaming listener observes batch progress and keyed state size") {
    val metrics = new graft.streaming.StreamMetrics
    spark.streams.addListener(metrics)
    try {
      val q = StreamOps.tumblingAgg(
          StreamOps.readEventsStream(spark, sf), "1 hour", "10 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName("t_metrics").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // listener events are delivered asynchronously after termination
      val expected = batchEvents.count()
      val deadline = System.nanoTime() + 30e9.toLong
      while (metrics.totalInputRows("t_metrics") < expected &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(metrics.totalInputRows("t_metrics") === expected,
        "every source row is observed exactly once across micro-batches")
      val withState = metrics.stats.filter(_.queryName == "t_metrics")
      assert(withState.nonEmpty)
      assert(withState.exists(_.stateRows > 0),
        "windowed agg batches must report keyed state")
    } finally spark.streams.removeListener(metrics)
  }

  test("file sink with checkpoint recovers without duplicating output") {
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    def run(): Unit = {
      val q = StreamOps.tumblingAgg(StreamOps.readEventsStream(spark, sf), "1 hour", "10 minutes")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0)
    // restart against the same checkpoint: no new input → no new rows
    run()
    assert(spark.read.parquet(out).count() === afterFirst,
      "restart from checkpoint must not duplicate committed output")
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    // small deterministic fixture: user 1 has two sessions split by a 2h gap
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val evs = Seq(
      StreamOps.Ev(1, ts(0), 1, "a", 1.0),
      StreamOps.Ev(2, ts(10), 1, "a", 2.0),
      StreamOps.Ev(3, ts(140), 1, "a", 3.0),   // 130min gap -> new session
      StreamOps.Ev(4, ts(5), 2, "b", 4.0)
    ).toDS()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamOps.Ev](spark)
    stream.addData(evs.collect().toIndexedSeq: _*)
    val q = StreamOps.sessionize(stream.toDS(), gapMs = 30 * 60000L)
      .writeStream.outputMode("append").format("memory").queryName("t_sessionize").start()
    q.processAllAvailable(); q.stop()
    val closed = spark.table("t_sessionize").as[StreamOps.UserSession].collect()
    // only user 1's FIRST session is closed (second stays open in state)
    assert(closed.length === 1)
    assert(closed.head === StreamOps.UserSession(1, 0, 10 * 60000L, 2, 3.0))
  }

  test("streaming last-touch attribution replays to exactly the batch q176 credit") {
    // the real sf corpus, split into two time-ordered micro-batches so
    // every user's prefix arrives before its suffix — the state hand-off
    // across the batch boundary is what's under test
    val evs = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(-1L))
          .as("k"))
      .as[StreamOps.AttrEv].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.AttrEv](spark)
    val q = StreamOps.attributeLastTouch(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_attr").start()
    stream.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_attr")
      .groupBy("attr_k")
      .agg(count(lit(1)).as("n_purchases"), sum("cents").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q176_attribution")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch,
      s"streamed minus batch: ${streamed -- batch}; batch minus streamed: ${batch -- streamed}")
  }

  test("attribution state ignores a late-arriving OLDER click across batches") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.AttrEv](spark)
    val q = StreamOps.attributeLastTouch(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_attr_late").start()
    // batch 1: the user's NEWEST click (t=10, k=5)
    stream.addData(StreamOps.AttrEv(1, ts(10), 7, "click", 0.0, 5))
    q.processAllAvailable()
    // batch 2: a straggler click with an older ts (t=2, k=3) arrives
    // before the purchase — the carried credit must stay k=5
    stream.addData(
      StreamOps.AttrEv(2, ts(2), 7, "click", 0.0, 3),
      StreamOps.AttrEv(3, ts(20), 7, "purchase", 1.0, -1))
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_attr_late").as[StreamOps.Attribution].collect()
    assert(got.toSeq === Seq(StreamOps.Attribution(7, 3, 5, 100)), got.mkString(","))
  }

  test("attribution carries credit through a no-key click (k < 0 contract)") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.AttrEv](spark)
    val q = StreamOps.attributeLastTouch(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_attr_nokey").start()
    // keyed click, then a keyless click (k = -1), then the purchase:
    // the batch twin's last(ignoreNulls) skips the keyless click, so
    // the carried credit must survive it here too
    stream.addData(
      StreamOps.AttrEv(1, ts(0), 4, "click", 0.0, 5),
      StreamOps.AttrEv(2, ts(1), 4, "click", 0.0, -1),
      StreamOps.AttrEv(3, ts(2), 4, "purchase", 2.5, -1))
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_attr_nokey").as[StreamOps.Attribution].collect()
    assert(got.toSeq === Seq(StreamOps.Attribution(4, 3, 5, 250)), got.mkString(","))
  }

  test("streaming drift monitor scores each batch against the static base, novel terms at full mass") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toFile
    val outDir = new java.io.File(dir, "tv").getPath
    val ckDir = new java.io.File(dir, "ck").getPath
    try {
      // base corpus distribution: {a: 2/7, b: 2/7, c: 3/7}
      val base = Seq((1L, "a a b"), (2L, "b c c c")).toDF("doc_id", "text")
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)](spark)
      val q = StreamOps.driftMonitor(
        stream.toDS().toDF("doc_id", "text", "source"), base, outDir, ckDir)
      // batch 0: srcN = {a: 2/3, z: 1/3} — 'z' is NOVEL (q=0, full mass)
      //   od = |2/3 - 2/7| + |1/3 - 0| = 5/7, qm = 2/7 -> TV = 5/7
      stream.addData((10L, "a a z", "srcN"))
      q.processAllAvailable()
      // batch 1: srcM = {c: 1} -> od = |1 - 3/7| = 4/7, qm = 3/7 -> TV = 4/7
      stream.addData((11L, "c c c", "srcM"))
      q.processAllAvailable(); q.stop()

      def rnd4(v: Double) =
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val b0 = spark.read.parquet(s"$outDir/batch=0")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      assert(b0 === Array(("srcN", 2, rnd4(5.0 / 7.0))), b0.mkString(", "))
      val b1 = spark.read.parquet(s"$outDir/batch=1")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      assert(b1 === Array(("srcM", 1, rnd4(4.0 / 7.0))), b1.mkString(", "))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("streaming KMV monitor converges to the batch q232 sketch across batch splits") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    val q = StreamOps.kmvMonitor(
      stream.toDS().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("append").format("memory")
      .queryName("t_kmv").start()
    // two arbitrary splits — the KMV merge law makes the fold order
    // irrelevant, so the final state must equal the batch sketch
    stream.addData(docs.take(docs.length / 3).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(docs.drop(docs.length / 3).toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val latest = spark.table("t_kmv")
      .as[StreamOps.KmvUpdate].collect()
      .groupBy(_.source).map { case (_, g) => g.maxBy(_.updates) }
    val batch = graft.queries.Analytics.kmvDistinct(spark, sf)
      .select(col("source"), col("n_hash"), col("est"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (math.min(r._2, 64L), r._3)).toMap
    assert(latest.nonEmpty)
    latest.foreach { u =>
      val (nh, est) = batch(u.source)
      assert(u.n_sketch.toLong === nh,
        s"${u.source}: sketch size ${u.n_sketch} vs batch $nh")
      assert(u.est === est, s"${u.source}: est ${u.est} vs batch $est")
    }
  }

  test("streaming EWMA monitor converges to batch q219 across batch splits") {
    val evs = batchEvents
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[StreamOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.Ev](spark)
    val q = StreamOps.ewmaMonitor(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_ewma").start()
    // time-ordered delivery split at an arbitrary point: the 8-value
    // state must make the final emission equal the batch window's answer
    stream.addData(evs.take(evs.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(evs.drop(evs.length / 2).toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val latest = spark.table("t_ewma").as[StreamOps.EwmaUpdate].collect()
      .groupBy(_.user_id).map { case (_, g) => g.maxBy(_.n_events) }
    val batch = graft.queries.Extended.ewmaSmooth(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(latest.nonEmpty && latest.size === batch.size)
    latest.foreach { u =>
      val (n, e) = batch(u.user_id)
      assert(u.n_events === n && u.ewma === e,
        s"user ${u.user_id}: stream (${u.n_events}, ${u.ewma}) vs batch ($n, $e)")
    }
  }

  test("streaming CUSUM monitor replays to exactly the batch q279 chart") {
    // the calibration window IS the batch corpus: daily per-type counts
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect().sortBy(r => (r._2, r._1))
    val ref = daily.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).sum, g.length.toLong)).toMap
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Long)](spark)
    val q = StreamOps.cusumMonitor(stream.toDS(), ref)
      .writeStream.outputMode("append").format("memory")
      .queryName("t_cusum").start()
    // in-day-order delivery split at an arbitrary point
    stream.addData(daily.take(daily.length / 3).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(daily.drop(daily.length / 3).toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val latest = spark.table("t_cusum").as[StreamOps.CusumUpdate].collect()
      .groupBy(_.event_type).map { case (_, g) => g.maxBy(_.n_days) }
    val batch = graft.queries.Extended.cusumShift(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(latest.nonEmpty && latest.size === batch.size)
    latest.foreach { u =>
      val (_, nd, _, mx, nAlarm, first) = batch(u.event_type)
      assert(u.n_days === nd && u.cusum_max === mx &&
        u.n_alarm === nAlarm && u.first_alarm === first,
        s"type ${u.event_type}: stream ($u) vs batch ${batch(u.event_type)}")
    }
  }

  test("streaming session paths replay to exactly the batch q253 top paths") {
    val evs = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[StreamOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // one far-future sentinel per user breaches every open session's gap,
    // so the CLOSED paths streamed out cover every real session; the
    // sentinel's own 1-event session stays open in state and is dropped
    val maxTs = evs.map(_.ts.getTime).max
    val sentinels = evs.map(_.user_id).distinct.map { u =>
      StreamOps.Ev(-u - 1, new java.sql.Timestamp(maxTs + 7200000L), u,
        " sentinel", 0.0)
    }
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.Ev](spark)
    val q = StreamOps.sessionPaths(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_paths").start()
    stream.addData(evs.take(evs.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(evs.drop(evs.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(sentinels.toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val streamedTop = spark.table("t_paths").as[StreamOps.SessionPath]
      .collect().groupBy(_.path).map { case (p, g) => (p, g.length.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val batchTop = graft.queries.Extended.topPaths(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(streamedTop === batchTop)
  }

  test("session paths close on processing-time timeout when enabled") {
    import org.apache.spark.sql.streaming.TestGroupState
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // batch 1: two events open a session and arm the timer
    val st1 = TestGroupState.create[StreamOps.PathState](
      optionalState = org.apache.spark.api.java.Optional.empty[StreamOps.PathState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout
        .ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StreamOps.pathStep(7L,
      Iterator(StreamOps.Ev(1, ts(0), 7L, "a", 1.0),
        StreamOps.Ev(2, ts(1), 7L, "b", 1.0)),
      st1, gapUs = 1800000000L, timeoutMs = 300L).toSeq
    assert(out1.isEmpty, "open session must not emit")
    assert(st1.exists && st1.get.path === List("b", "a"))
    assert(st1.getTimeoutTimestampMs.isPresent)
    // batch 2: the timer fired — the open session flushes and state clears
    val st2 = TestGroupState.create[StreamOps.PathState](
      optionalState = org.apache.spark.api.java.Optional.of(st1.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout
        .ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StreamOps.pathStep(7L, Iterator.empty, st2,
      gapUs = 1800000000L, timeoutMs = 300L).toSeq
    assert(out2 === Seq(StreamOps.SessionPath(7L, "a>b", 2, 0L, 60000000L)))
    assert(st2.isRemoved, "flushed session must clear its state")
  }

  test("streaming quantile monitor converges to batch q257 across batch splits") {
    // same hash/value exprs as batch q257, computed up front
    val rows = Tables.t(spark, sf, "lineitem")
      .select(lit("all").as("key"),
        graft.queries.Fragments.sampleHash(
          concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))).as("h"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)](spark)
    val q = StreamOps.quantileMonitor(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_qsk").start()
    stream.addData(rows.take(rows.length / 3).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(rows.drop(rows.length / 3).toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val last = spark.table("t_qsk").as[StreamOps.QuantUpdate].collect()
      .maxBy(_.n)
    val batch = graft.queries.Analytics.quantileSketch(spark, sf)
      .filter(col("p") === 0.5).select("est_cents", "nn")
      .as[(Long, Long)].collect().head
    assert(last.n === batch._2, "row count must match batch")
    assert(last.p50_cents === batch._1,
      s"streamed median ${last.p50_cents} vs batch ${batch._1}")
  }

  test("EWMA monitor rounds negative half-cents HALF_UP like batch round()") {
    // -0.005 * 100 == -0.5 exactly in IEEE; batch q219's round() maps it
    // to -1 cent (away from zero) while math.round would give 0 — the one
    // value class where the old streamed fold diverged from batch
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.Ev](spark)
    val q = StreamOps.ewmaMonitor(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_ewma_neg").start()
    stream.addData(
      StreamOps.Ev(1L, ts(0), 9001L, "click", -0.005),
      StreamOps.Ev(2L, ts(1), 9002L, "click", 0.005))
    q.processAllAvailable(); q.stop()
    val out = spark.table("t_ewma_neg").as[StreamOps.EwmaUpdate].collect()
      .map(u => u.user_id -> u.ewma).toMap
    assert(out(9001L) === -0.01, s"negative half-cent: ${out(9001L)}")
    assert(out(9002L) === 0.01, s"positive half-cent: ${out(9002L)}")
  }

  test("streaming decontamination admits exactly the docs batch q87 would keep") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam").toFile
    val outDir = new java.io.File(dir, "clean").getPath
    val ckDir = new java.io.File(dir, "ck").getPath
    try {
      val d = Tables.t(spark, sf, "documents")
      val bucket = graft.queries.Fragments.splitBucket(col("doc_id"))
      val benchmark = d.filter(bucket >= 90)
      val train = d.filter(bucket < 80)
        .select("doc_id", "text").as[(Long, String)].collect()
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val q = StreamOps.decontamFilter(
        stream.toDS().toDF("doc_id", "text"), benchmark, outDir, ckDir)
      stream.addData(train.take(train.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(train.drop(train.length / 2).toIndexedSeq: _*)
      q.processAllAvailable(); q.stop()

      val admitted = spark.read.parquet(outDir)
        .select("doc_id").as[Long].collect().toSet
      val contaminated = graft.queries.Curation.decontam(spark, sf)
        .select("doc_id").as[Long].collect().toSet
      assert(contaminated.nonEmpty, "fixture must contain cross-split overlap")
      assert(admitted === train.map(_._1).toSet -- contaminated,
        "stream must admit exactly the clean train docs")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("streaming near-dup alerts against a static index match the batch LSH truth") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup").toFile
    val alertDir = new java.io.File(dir, "alerts").getPath
    val ckDir = new java.io.File(dir, "ck").getPath
    try {
      val corpus = Tables.t(spark, sf, "documents")
      // replay every fixture doc through the stream; the static index is
      // the same corpus, so each batch pair (a,b) must alert in BOTH
      // directions (when a streams past b, and when b streams past a)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val q = StreamOps.nearDupAlerts(
        stream.toDS().toDF("doc_id", "text"), corpus, alertDir, ckDir)
      val docs = corpus.select("doc_id", "text").as[(Long, String)].collect()
      stream.addData(docs.take(docs.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(docs.drop(docs.length / 2).toIndexedSeq: _*)
      q.processAllAvailable(); q.stop()

      val alerts = spark.read.parquet(alertDir)
        .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
      val batchPairs = graft.llm.Dedup.minhashLsh(corpus)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val expected = batchPairs ++ batchPairs.map(p => (p._2, p._1))
      assert(batchPairs.nonEmpty)
      assert(alerts === expected)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("near-dup alerts served from the Compact state equal the rebuilt-corpus path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-idx").toFile
    val alertDir = new java.io.File(dir, "alerts").getPath
    val ckDir = new java.io.File(dir, "ck").getPath
    val stateDir = new java.io.File(dir, "state").getPath
    try {
      // q177's split: base state maintained by Compact, batch streamed
      val docs = Tables.t(spark, sf, "documents")
      val batchSrc = Seq("src15", "src16", "src17", "src18", "src19")
      val base = docs.filter(!col("source").isin(batchSrc: _*))
      val batch = docs.filter(col("source").isin(batchSrc: _*))
      graft.Compact.run(spark, stateDir, base)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val q = StreamOps.nearDupAlertsFromIndex(
        stream.toDS().toDF("doc_id", "text"),
        graft.Compact.readIndex(spark, stateDir).get, alertDir, ckDir)
      stream.addData(batch.select("doc_id", "text")
        .as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable(); q.stop()

      val alerts = spark.read.parquet(alertDir)
        .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
      val expected = graft.llm.Dedup.minhashLshAgainst(base, batch)
        .select("batch_id", "base_id").as[(Long, Long)].collect().toSet
      assert(expected.nonEmpty)
      assert(alerts === expected)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("streaming upsert sink maintains a last-writer-wins snapshot across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toFile
    val snapDir = new java.io.File(dir, "snap").getPath
    val ckDir = new java.io.File(dir, "ck").getPath
    try {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Double)](spark)
      val changes = stream.toDS().toDF("k", "seq", "s", "v")
      val q = StreamOps.upsertSink(changes, snapDir, Seq("k"), "seq", ckDir)
      // batch 1: inserts, including an in-batch duplicate key (seq 2 wins)
      stream.addData((1L, 1L, "a", 1.0), (2L, 1L, "b", 2.0), (2L, 2L, "b2", 2.5))
      q.processAllAvailable()
      // batch 2: update key 1, insert key 3
      stream.addData((1L, 3L, "a2", 9.0), (3L, 1L, "c", 3.0))
      q.processAllAvailable(); q.stop()
      val snap = spark.read.parquet(snapDir)
        .select("k", "seq", "s", "v").as[(Long, Long, String, Double)]
        .collect().toSet
      assert(snap === Set((1L, 3L, "a2", 9.0), (2L, 2L, "b2", 2.5), (3L, 1L, "c", 3.0)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
