package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe dissecting the iterative graph family's per-iteration
  * physical plans (round-10 stretch item): q178's and q116's second
  * decades (3.99×/5.04× normalized) are the worst honest ratios in the
  * measured table, and the hypothesis to kill or confirm was "the
  * five-round join re-shuffles the edge set per iteration regardless of
  * corpus size". This replays q116's exact recurrence (keep in sync
  * with `queries/Analytics.scala` q116 — same artifact-served edges,
  * same integer rank arithmetic) and prints, for every iteration, the
  * POST-EXECUTION adaptive plan's shuffle/broadcast exchange and sort
  * counts plus wall time — direct evidence of which side moves.
  *
  * Usage: `sbt "runMain graft.IterProbe <corpusDir>"` (builds the graph
  * artifact for the corpus first, like ScaleProbe). A second arg
  * `cluster` runs the NETWORK-BOUNDARY variant (round-12 stretch):
  * master `local-cluster[2,16,6144]` — two separate executor JVMs, so
  * every exchange serializes across a process boundary instead of
  * being an in-heap array handoff. This is the shape whose win
  * condition the bucketedServe deployment rule claims ("the exchange
  * is network-bound"); cluster mode runs the checkpoint leg (the
  * exchange-per-iteration shape) against the artifact-bucketed leg
  * (exchange-free) and prints both, turning the rule from argued to
  * measured. Requires SPARK_HOME=/opt/spark in the environment (the
  * in-process Worker launches executor JVMs through the
  * distribution's launcher, which injects the Java-17 module opens).
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val clusterMode = args.length > 1 && args(1) == "cluster"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder =
      if (clusterMode) {
        // executors are fresh JVMs: they need the repo classes (custom
        // kernels referenced from codegen) on their own classpath
        val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
        SparkSession.builder().master("local-cluster[2,16,6144]")
          .config("spark.executor.memory", "5g")
          .config("spark.executor.extraClassPath", classes)
          .config("spark.sql.shuffle.partitions", cpus)
      } else
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val art = java.nio.file.Files
      .createTempDirectory("iterprobe-art").resolve("graph").toString
    graft.operators.GraphArtifact.build(spark, dir, art)
    spark.conf.set(graft.operators.GraphArtifact.Key, art)

    val clicks = graft.operators.GraphArtifact.clickEdges(spark, dir)
    val edges = clicks.union(clicks.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "u").persist()
    val eRows = e.count()
    val nodes = deg.count()
    println(s"[iterprobe] $dir edges=$eRows nodes=$nodes")

    def counts(plan: String): String = {
      def c(p: String) = p.r.findAllIn(plan).size
      s"shuffles=${c("ShuffleExchange|Exchange hashpartitioning")} " +
        s"broadcasts=${c("BroadcastExchange")} sorts=${c("\\bSort\\b")} " +
        s"reusedExchanges=${c("ReusedExchange")} aqeShuffleReads=${c("AQEShuffleRead")}"
    }

    def runIters(label: String, eSrc: org.apache.spark.sql.DataFrame,
                 showPlan: Boolean): Double = {
      var ranks = deg.select(col("u").as("id"), lit(1000000L).as("r"))
      var total = 0.0
      for (i <- 1 to 5) {
        val next = eSrc.join(ranks, col("u") === col("id"))
          .groupBy(col("v"))
          .agg(sum(expr("(r * 85) div (100 * deg)")).as("contrib"))
          .select(col("v").as("id"), (col("contrib") + 150000L).as("r"))
        val t0 = System.nanoTime()
        ranks = next.localCheckpoint(true)
        val dt = (System.nanoTime() - t0) / 1e9
        total += dt
        // post-execution: AQE has finalized the plan by now
        val plan = next.queryExecution.executedPlan.toString
        println(f"[iterprobe] $label iter $i ${dt}%.2f s ${counts(plan)}")
        if (i == 1 && showPlan) println(plan.linesIterator.take(40).mkString("\n"))
      }
      total
    }

    if (clusterMode) {
      // the deployment decision reduced to its two contenders, across a
      // real process boundary: B (checkpointed frame — the exchange
      // happens every iteration and now moves bytes between JVMs) vs E
      // (artifact bucketed serving — scan-partitioned, no exchange)
      val eCk0 = edges.join(deg, "u").localCheckpoint(true)
      val tCk = runIters("cluster-checkpoint", eCk0, showPlan = false)
      spark.conf.set(graft.operators.GraphArtifact.BucketedServeKey, "true")
      val eArt0 = graft.operators.GraphArtifact.clickIterEdges(spark, dir)
      val tArt = runIters("cluster-artifact-bucketed", eArt0, showPlan = false)
      spark.conf.unset(graft.operators.GraphArtifact.BucketedServeKey)
      println(f"[iterprobe] cluster totals: checkpoint=${tCk}%.2f s " +
        f"artifact-bucketed=${tArt}%.2f s")
      e.unpersist()
      spark.stop()
      return
    }

    // A: persist() — an AQE-cached relation exposes UnknownPartitioning,
    // so every iteration's initial SMJ plan re-exchanges the edge side
    // even when AQE later downgrades the join to broadcast.
    val tA = runIters("persist", e, showPlan = false)
    println(s"[iterprobe] persist partitions=${e.rdd.getNumPartitions}")
    // B: localCheckpoint(true) — LogicalRDD CARRIES the final executed
    // outputPartitioning/ordering, so the per-iteration join sees the
    // edge side already hash-partitioned by u.
    val eCk = edges.join(deg, "u").localCheckpoint(true)
    println(s"[iterprobe] checkpoint partitions=${eCk.rdd.getNumPartitions}")
    val tB = runIters("checkpoint", eCk, showPlan = false)
    // C: explicit user repartition pins an exact HashPartitioning(u, 32)
    // that AQE must not coalesce, captured by the checkpoint's
    // LogicalRDD — the iteration join should see its edge side already
    // distributed and add NO exchange over it.
    val shuffleN = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val eRep = edges.join(deg, "u")
      .repartition(shuffleN, col("u")).localCheckpoint(true)
    println(s"[iterprobe] repartition+ckpt partitions=${eRep.rdd.getNumPartitions}")
    val tC = runIters("repartition+ckpt", eRep, showPlan = true)
    // D: a BUCKETED TABLE — the only in-Spark shape whose scan exposes
    // a join-consumable HashPartitioning(u, N), so the per-iteration
    // edge exchange itself should disappear (the SCALE.md future-work
    // claim, measured here rather than assumed)
    spark.sql("DROP TABLE IF EXISTS iterprobe_e")
    edges.join(deg, "u").write
      .bucketBy(shuffleN, "u").sortBy("u")
      .mode("overwrite").saveAsTable("iterprobe_e")
    val eTab = spark.table("iterprobe_e")
    val tD = runIters("bucketed-table", eTab, showPlan = true)
    spark.sql("DROP TABLE IF EXISTS iterprobe_e")
    // E: the DEPLOYED form of D (round 11): the artifact's own
    // iteration-shaped bucketed serving state behind
    // spark.graft.graph.bucketedServe — what a cluster actually flips
    // on. Should match D's plan shape (no per-iteration edge exchange)
    // from persisted state, no ad-hoc table build.
    spark.conf.set(graft.operators.GraphArtifact.BucketedServeKey, "true")
    val eArt = graft.operators.GraphArtifact.clickIterEdges(spark, dir)
    println(s"[iterprobe] artifact-bucketed partitions=${eArt.rdd.getNumPartitions}")
    val tE = runIters("artifact-bucketed", eArt, showPlan = false)
    spark.conf.unset(graft.operators.GraphArtifact.BucketedServeKey)
    println(f"[iterprobe] totals: persist=${tA}%.2f s checkpoint=${tB}%.2f s " +
      f"repartition+ckpt=${tC}%.2f s bucketed=${tD}%.2f s artifact-bucketed=${tE}%.2f s")
    e.unpersist()
    spark.stop()
  }
}
