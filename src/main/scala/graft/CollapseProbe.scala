package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch adjudication probe for the round-11 exact-copy collapse
  * (llm/Dedup minhashLsh / simhashPairs / minhashClusters): interleaved
  * A/B of the UNCOLLAPSED pipeline bodies (reconstructed inline below,
  * exactly as they stood before the collapse) against the shipped
  * collapsed operators, min-of-N inside ONE process so host-level
  * throughput drift cancels out (the FlagProbe methodology). Dev-only;
  * not part of the library. */
object CollapseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drain(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def t1(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.t(spark, dir, "documents")
    drain(docs.select("doc_id", "text")) // warm the scan
    // the old-pipeline legs persist their own shingle table (outside
    // the Dedup cache registry) — track and evict it per call so later
    // legs in a round never run with less block-manager memory
    var lastOldCache: Option[org.apache.spark.sql.DataFrame] = None

    // ---- the pre-collapse minhashLsh body, verbatim ----
    def oldMinhash(): DataFrame = {
      val sh = docs
        .select(col("doc_id").as("id"),
          graft.llm.TextOps.wordShingles(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lastOldCache.foreach(_.unpersist(blocking = false))
      lastOldCache = Some(sh)
      val banded = sh
        .select(col("id"),
          posexplode(graft.functions.Hashing.minhashBands(
            col("shingles"), 32, 4)))
        .select(col("id"), col("pos").as("band"), col("col").as("bh"))
      val cand = graft.llm.Lsh.bucketPairs(banded, Seq("band", "bh"), "doc_a", "doc_b")
      val sa = sh.select(col("id").as("doc_a"), col("shingles").as("sh_a"))
      val sb = sh.select(col("id").as("doc_b"), col("shingles").as("sh_b"))
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(graft.llm.TextOps.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
    }

    // ---- the pre-collapse simhashPairs body, verbatim ----
    def oldSimhash(): DataFrame = {
      val fp = docs.select(col("doc_id").as("id"),
        graft.llm.Dedup.md5SimhashBlocks(col("text")).as("blocks"))
      val banded = fp.select(col("id"),
        explode(transform(sequence(lit(0), lit(3)),
          b => struct(b.as("band"), element_at(col("blocks"), b + 1).as("bv")))).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bv"))
      val cand = graft.llm.Lsh.bucketPairs(banded, Seq("band", "bv"), "doc_a", "doc_b")
      val fa = fp.select(col("id").as("doc_a"), col("blocks").as("bl_a"))
      val fb = fp.select(col("id").as("doc_b"), col("blocks").as("bl_b"))
      val ham = (1 to 4).map(i =>
        bit_count(element_at(col("bl_a"), i).bitwiseXOR(element_at(col("bl_b"), i))))
        .reduce(_ + _)
      cand.join(fa, "doc_a").join(fb, "doc_b")
        .select(col("doc_a"), col("doc_b"), ham.cast("int").as("hamming"))
        .filter(col("hamming") <= 3)
    }

    // ---- the pre-collapse minhashLshAgainst body, verbatim (round-12
    // cross-path adjudication: run mode `cross-old` / `cross-new` in
    // SEPARATE invocations — the old body is expected to die on the
    // candidate disk wall at sf10, which must not taint the new leg) ----
    val isBatchCol = col("source")
      .isin("src15", "src16", "src17", "src18", "src19")
    def oldIncr(): DataFrame = {
      def shingled(d: DataFrame, b: Boolean) = d
        .select(col("doc_id").as("id"),
          graft.llm.TextOps.wordShingles(col("text"), 3).as("shingles"),
          lit(b).as("isBatch"))
        .filter(size(col("shingles")) > 0)
      val sh = shingled(docs.filter(!isBatchCol), b = false)
        .union(shingled(docs.filter(isBatchCol), b = true))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lastOldCache.foreach(_.unpersist(blocking = false))
      lastOldCache = Some(sh)
      val banded = sh
        .select(col("id"), col("isBatch"),
          posexplode(graft.functions.Hashing.minhashBands(
            col("shingles"), 32, 4)))
        .select(col("id"), col("isBatch"),
          col("pos").as("band"), col("col").as("bh"))
      val cand = graft.llm.Lsh.crossBucketPairs(banded, Seq("band", "bh"),
        "batch_id", "base_id")
      cand
        .join(sh.filter(col("isBatch"))
          .select(col("id").as("batch_id"), col("shingles").as("sh_a")), "batch_id")
        .join(sh.filter(!col("isBatch"))
          .select(col("id").as("base_id"), col("shingles").as("sh_b")), "base_id")
        .select(col("batch_id"), col("base_id"),
          round(graft.llm.TextOps.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
    }
    val crossLegs: Seq[(String, () => Unit)] = Seq(
      "incr_old" -> (() => { drain(oldIncr()); () }),
      "incr_new" -> (() => {
        drain(graft.llm.Dedup.minhashLshAgainst(
          docs.filter(!isBatchCol), docs.filter(isBatchCol)))
        graft.llm.Dedup.clearShingleCache()
      })
    )

    val allLegs: Seq[(String, () => Unit)] = Seq(
      "minhash_old" -> (() => { drain(oldMinhash()); graft.llm.Dedup.clearShingleCache() }),
      "minhash_new" -> (() => { drain(graft.llm.Dedup.minhashLsh(docs)); graft.llm.Dedup.clearShingleCache() }),
      "simhash_old" -> (() => { drain(oldSimhash()); () }),
      "simhash_new" -> (() => { drain(graft.llm.Dedup.simhashPairs(docs, tokenHash = "md5")); graft.llm.Dedup.clearShingleCache() }),
      "clusters_old" -> (() => { drain(graft.llm.Dedup.connectedComponents(oldMinhash())); graft.llm.Dedup.clearShingleCache() }),
      "clusters_new" -> (() => { drain(graft.llm.Dedup.minhashClusters(docs)); graft.llm.Dedup.clearShingleCache() })
    )
    // generic registry-query legs: `queries:qA,qB,...` runs each named
    // registry body interleaved (round-13 bench-flag adjudication), and
    // `classkey:qA,qB,...` runs each under BOTH classKey encodings —
    // legacy (round-12 length-prefixed string) vs shipped (per-element
    // hash) — in one process, the q59/q136 regression A/B.
    def registryLeg(nm: String): () => Unit = () => {
      val rows = drain(SparkEntry.queries(nm)(spark, dir))
      // output row count alongside the time: the three-decade ladder's
      // third point is OUTPUT-MASS-bound (the true answer grows ~copies²
      // under verbatim duplication), and the row count is what makes
      // that reading auditable instead of asserted
      println(s"[collapse-probe] $nm rows=$rows")
      graft.llm.Dedup.clearShingleCache()
    }
    def encodedLeg(nm: String, variant: String): (String, () => Unit) =
      (s"${nm}_$variant", () => {
        graft.llm.Dedup.classKeyVariant = variant
        try registryLeg(nm)() finally
          graft.llm.Dedup.classKeyVariant = "legacy12"
      })
    val legs: Seq[(String, () => Unit)] = args.lift(2) match {
      case Some("cross")     => crossLegs
      case Some("cross-old") => crossLegs.filter(_._1 == "incr_old")
      case Some("cross-new") => crossLegs.filter(_._1 == "incr_new")
      case Some(m) if m.startsWith("queries:") =>
        m.stripPrefix("queries:").split(',').toSeq.map(q => q -> registryLeg(q))
      case Some(m) if m.startsWith("classkey:") =>
        m.stripPrefix("classkey:").split(',').toSeq
          .flatMap(q => Seq("r11", "legacy12", "cheap").map(encodedLeg(q, _)))
      case _                 => allLegs
    }

    // parameterized tolerant-SRP leg: `tolerant:<bits>:<rho>[:<thr>]`
    // drains srpTolerantPairs over the dir's embeddings — the sf10
    // drift-ladder instrument. `<bits>` may be the literal `auto`
    // (bits=0): the round-14 width rule, whose derived value the leg
    // prints so a ladder row can show auto matching the hand-tuned
    // width's time; the SCALE.md row states the parameters it measured
    if (args.lift(2).exists(_.startsWith("tolerant:"))) {
      val ps = args(2).split(':')
      val bits = if (ps(1) == "auto") 0 else ps(1).toInt
      val rho = ps(2).toDouble
      val thr = ps.lift(3).filter(_ != "parity").map(_.toDouble).getOrElse(0.3)
      val emb = Tables.t(spark, dir, "embeddings")
      val planes = graft.llm.Similarity.firstNPlanes(emb, 32)
      for (r <- 1 to rounds) {
        val s = t1 {
          drain(graft.llm.Similarity.srpTolerantPairs(
            emb, planes, bits = bits, threshold = thr, maxChord = rho))
          graft.llm.Dedup.clearShingleCache()
        }
        val shown =
          if (bits > 0) bits.toString
          else "auto=" + spark.conf
            .get(graft.llm.Similarity.TolerantAutoBitsConf, "?")
        println(f"[collapse-probe] tolerant bits=$shown rho=$rho thr=$thr round $r $s%7.2f s")
      }
      // pass a 4th segment "parity" to ALSO set-compare the pair set
      // against the raw pipeline at the same planes/bits (out-of-sample
      // contract check at probe scale — the spec pins it at sf0.001)
      if (ps.lift(4).contains("parity") || ps.lift(3).contains("parity")) {
        val tol = graft.llm.Similarity.srpTolerantPairs(
            emb, planes, bits = bits, threshold = thr, maxChord = rho)
          .select("id_a", "id_b")
        // parity is per-parameter: with auto, the raw side must run at
        // the width the tolerant side just derived (conf is populated
        // eagerly — the auto count executes at construction)
        val rawBits = if (bits > 0) bits else spark.conf
          .get(graft.llm.Similarity.TolerantAutoBitsConf).toInt
        val nzEmb = emb.filter(exists(
          col("embedding").cast("array<double>"), x => x =!= lit(0.0)))
        val raw = graft.llm.Similarity.planeSrpPairs(
            nzEmb, planes, bits = rawBits, threshold = thr)
          .select("id_a", "id_b")
        val onlyTol = tol.exceptAll(raw).count()
        val onlyRaw = raw.exceptAll(tol).count()
        val n = tol.count()
        graft.llm.Dedup.clearShingleCache()
        println(s"[collapse-probe] tolerant parity: pairs=$n onlyTolerant=$onlyTol onlyRaw=$onlyRaw" +
          (if (onlyTol == 0 && onlyRaw == 0) " PASS" else " FAIL"))
      }
      spark.stop(); return
    }

    // cross-corpus tolerant A/B: `tolerantcross:<bits|auto>:<rho>[:<thr>]`
    // times the incremental form (batch = vec_id % 5 = 0 against the
    // rest) AGAINST re-running the self form over the union — the
    // round-13 verdict's question: what does a batch arrival cost when
    // it does NOT re-collapse the whole corpus vs when it does
    if (args.lift(2).exists(_.startsWith("tolerantcross:"))) {
      val ps = args(2).split(':')
      val bits = if (ps(1) == "auto") 0 else ps(1).toInt
      val rho = ps(2).toDouble
      val thr = ps.lift(3).map(_.toDouble).getOrElse(0.3)
      val emb = Tables.t(spark, dir, "embeddings")
      val planes = graft.llm.Similarity.firstNPlanes(emb, 32)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      for (r <- 1 to rounds) {
        val sc = t1 {
          drain(graft.llm.Similarity.srpTolerantPairsAgainst(
            base, batch, planes, bits = bits, threshold = thr, maxChord = rho))
          graft.llm.Dedup.clearShingleCache()
        }
        val ss = t1 {
          drain(graft.llm.Similarity.srpTolerantPairs(
            emb, planes, bits = bits, threshold = thr, maxChord = rho))
          graft.llm.Dedup.clearShingleCache()
        }
        println(f"[collapse-probe] tolerantcross bits=${ps(1)} rho=$rho " +
          f"round $r cross $sc%7.2f s  self-union $ss%7.2f s")
      }
      spark.stop(); return
    }

    // persisted-state serve A/B: `tolerantserve:<bits|auto>:<rho>[:<thr>]`
    // builds the REAL TolerantCompact asset for the base side once
    // (timed), then per round times a batch arrival answered from the
    // DISK state (TolerantCompact.serve — batch collapse + cross join,
    // zero base re-collapse) against the from-scratch cross form that
    // re-collapses the base every arrival — the round-14 question: what
    // does the persisted asset actually buy per arrival?
    if (args.lift(2).exists(_.startsWith("tolerantserve:"))) {
      val ps = args(2).split(':')
      val bits = if (ps(1) == "auto") 0 else ps(1).toInt
      val rho = ps(2).toDouble
      val thr = ps.lift(3).map(_.toDouble).getOrElse(0.3)
      val emb = Tables.t(spark, dir, "embeddings")
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val planes = graft.llm.Similarity.firstNPlanes(base, 32)
      val state = java.nio.file.Files
        .createTempDirectory("graft-tolserve").toString
      val tb = t1 { TolerantCompact.run(spark, state, base, planes,
        bits = bits, maxChord = rho) }
      println(f"[collapse-probe] tolerantserve build $tb%7.2f s")
      for (r <- 1 to rounds) {
        val sv = t1 {
          drain(TolerantCompact.serve(spark, state, batch, thr))
          graft.llm.Dedup.clearShingleCache()
        }
        val sc = t1 {
          drain(graft.llm.Similarity.srpTolerantPairsAgainst(
            base, batch, planes, bits = bits, threshold = thr, maxChord = rho))
          graft.llm.Dedup.clearShingleCache()
        }
        println(f"[collapse-probe] tolerantserve bits=${ps(1)} rho=$rho " +
          f"round $r serve $sv%7.2f s  cross-scratch $sc%7.2f s")
      }
      def rmr(d: java.io.File): Unit = {
        Option(d.listFiles).foreach(_.foreach(rmr)); d.delete(); ()
      }
      rmr(new java.io.File(state))
      spark.stop(); return
    }

    // tolerant-SRP state size at 1x vs Nx DRIFT copies — the would-be
    // persisted asset for the q305/q306 family (round-13 verdict #6):
    // `groups` (leader vector + signature + radius + pop — what a
    // rep-attributed serve needs) should stay ~FLAT in the copy factor
    // (drift copies join existing leader groups), while `exemplars`
    // (distinct vectors + their leader, the exact-band-verify payload)
    // and `members` (doc -> cell) grow linearly — drift copies are all
    // DISTINCT vectors, so unlike the MinHash text index the linear
    // tier here carries the vectors themselves; the flat tier is the
    // part a cross-corpus serve (q306's base side) must scan per batch
    if (args.lift(2).exists(_.startsWith("tolerantindexsize"))) {
      val copies = args(2).split(':').lift(1).map(_.toInt).getOrElse(20)
      val bits = 8
      val emb0 = Tables.t(spark, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val planes = graft.llm.Similarity.firstNPlanes(emb0, 32)
      val maxId = emb0.agg(max("vec_id")).head.getLong(0) + 1
      def driftCorpus(n: Int): DataFrame =
        (0 until n).map { c =>
          emb0.select((col("vec_id") + lit(c * maxId)).as("vec_id"),
            transform(col("embedding"), x => x + lit(c * 0.001)).as("embedding"))
        }.reduce(_ unionByName _)
      def buildAndMeasure(tag: String, corpus: DataFrame): Unit = {
        val out = java.nio.file.Files
          .createTempDirectory("graft-tolstate").toString
        // levels 1-3 of srpTolerantPairs, persisted as the state shape
        val v = corpus.select(col("vec_id").as("id"),
            col("embedding").as("v"))
          .filter(exists(col("v"), x => x =!= lit(0.0)))
        val cells = v.groupBy("v")
          .agg(min("id").as("id"), count(lit(1)).as("ex_n"))
        cells.write.parquet(s"$out/cells")
        val cellsR = spark.read.parquet(s"$out/cells")
        val members = v.select(col("id"), col("v"))
          .join(cellsR.select(col("v"), col("id").as("rep")), "v")
          .select("id", "rep")
        val tables = planes.length / bits
        val sig = array((0 until tables).map { t =>
          (0 until bits).map { j =>
            val dot = graft.functions.VectorOps.dotProduct(col("v"),
              typedLit(planes(t * bits + j).toSeq))
            when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
          }.reduce(_ + _)
        }.toIndexedSeq: _*)
        val ex = cellsR.select(col("id"), col("v"), col("ex_n"))
          .withColumn("sig", sig)
        ex.write.parquet(s"$out/ex0")
        val exR = spark.read.parquet(s"$out/ex0")
        val exA = exR.select(col("sig"), col("id").as("ia"), col("v").as("va"))
        val exB = exR.select(col("sig"), col("id").as("ib"), col("v").as("vb"))
        val classPairs = exA.join(exB, Seq("sig"))
          .filter(col("ia") < col("ib"))
          .select(col("ia"), col("ib"),
            round(graft.llm.Similarity.cosine(col("va"), col("vb")), 6).as("cos6"))
        val admitted = classPairs.filter(col("cos6") >= 0.995)
        val neighborMin = admitted
          .select(col("ia").as("id"), col("ib").as("nb"), col("cos6"))
          .unionByName(admitted.select(
            col("ib").as("id"), col("ia").as("nb"), col("cos6")))
          .groupBy("id").agg(min(struct(col("nb"), col("cos6"))).as("mn"))
        val assign = exR.select(col("id"), col("ex_n"))
          .join(neighborMin, Seq("id"), "left")
          .select(col("id"), col("ex_n"),
            least(col("id"), coalesce(col("mn.nb"), col("id"))).as("leader"),
            when(col("mn.nb") < col("id"), col("mn.cos6")).as("lead_cos"))
        // the persisted EXEMPLAR tier: vector + signature + leader
        exR.select(col("id"), col("v"), col("sig"))
          .join(assign.select("id", "leader"), "id")
          .write.parquet(s"$out/exemplars")
        assign.groupBy("leader")
          .agg(sum("ex_n").as("pop"), min("lead_cos").as("min_cos"))
          .withColumn("radius", sqrt(greatest(lit(0.0),
            lit(2.0) - lit(2.0) * coalesce(col("min_cos"), lit(1.0)))))
          .join(exR.select(col("id").as("leader"), col("v").as("lv"),
            col("sig")), "leader")
          .write.parquet(s"$out/groups")
        members.write.parquet(s"$out/members")
        val f = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def du(sub: String) = f.getContentSummary(
          new org.apache.hadoop.fs.Path(s"$out/$sub")).getLength
        def n(sub: String) = spark.read.parquet(s"$out/$sub").count()
        println(f"[collapse-probe] tolstate $tag%-8s groups=${n("groups")}%7d " +
          f"(${du("groups") / 1e6}%8.2f MB)  exemplars=${n("exemplars")}%8d " +
          f"(${du("exemplars") / 1e6}%8.2f MB)  members=${n("members")}%9d " +
          f"(${du("members") / 1e6}%8.2f MB)")
        def rmr(d: java.io.File): Unit = {
          Option(d.listFiles).foreach(_.foreach(rmr)); d.delete(); ()
        }
        rmr(new java.io.File(out))
      }
      buildAndMeasure("1x", emb0)
      buildAndMeasure(s"${copies}x", driftCorpus(copies))
      spark.stop(); return
    }

    // class-level index size at 1x vs Nx verbatim copies — the measured
    // back for Compact's dup-factor asset-shrink claim (round-12
    // verdict #6): expect ~flat classes bytes, linear members sidecar
    if (args.lift(2).exists(_.startsWith("indexsize"))) {
      val copies = args(2).split(':').lift(1).map(_.toInt).getOrElse(20)
      def buildAndMeasure(tag: String, corpus: DataFrame): Unit = {
        val state = java.nio.file.Files
          .createTempDirectory("graft-indexsize").toString
        val t0 = System.nanoTime()
        Compact.run(spark, state, corpus)
        val sec = (System.nanoTime() - t0) / 1e9
        val f = new org.apache.hadoop.fs.Path(state)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def du(sub: String) = f.getContentSummary(
          new org.apache.hadoop.fs.Path(s"$state/index/$sub")).getLength
        val (classes, members) = Compact.readClassIndex(spark, state).get
        println(f"[collapse-probe] indexsize $tag%-8s classes=${classes.count()}%8d " +
          f"(${du("classes") / 1e6}%8.2f MB)  members=${members.count()}%9d " +
          f"(${du("members") / 1e6}%8.2f MB)  build ${sec}%6.1f s")
        def rm(d: java.io.File): Unit = {
          Option(d.listFiles).foreach(_.foreach(rm)); d.delete(); ()
        }
        rm(new java.io.File(state))
      }
      val base = docs.select("doc_id", "text")
      buildAndMeasure("1x", base)
      val many = (0 until copies).map(c =>
        base.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          col("text"))).reduce(_ unionByName _)
      buildAndMeasure(s"${copies}x", many)
      spark.stop(); return
    }

    // sub-stage breakdown of the new minhash path (one shot, warm scan)
    if (args.lift(2).contains("breakdown")) {
      val c = graft.llm.Dedup.minhashCollapse(docs, "text", "doc_id", 3, 32, 4, 0.8)
      println(f"[collapse-probe] members  ${t1(drain(c.members))}%6.2f s")
      println(f"[collapse-probe] multiReps ${t1(drain(c.multiReps))}%6.2f s")
      println(f"[collapse-probe] repPairs ${t1(drain(c.repPairs))}%6.2f s")
      println(f"[collapse-probe] expandFull ${t1(drain(graft.llm.Dedup.minhashLsh(docs)))}%6.2f s")
      graft.llm.Dedup.clearShingleCache()
    }

    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (r <- 1 to rounds; (name, body) <- legs) {
      val s = t1(body())
      best(name) = math.min(best(name), s)
      println(f"[collapse-probe] round $r $name%-13s $s%6.2f s")
      lastOldCache.foreach(_.unpersist(blocking = false))
      lastOldCache = None
      System.gc()
    }
    println("[collapse-probe] ---- min of " + rounds + " ----")
    for ((name, _) <- legs)
      println(f"[collapse-probe] $name%-13s ${best(name)}%6.2f s")
    spark.stop()
  }
}
