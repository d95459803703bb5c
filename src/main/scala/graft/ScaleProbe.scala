package graft

import org.apache.spark.sql.SparkSession

/** Multi-scale timing probe (dev tool): runs the named queries against
  * two OR MORE corpus directories — typically [[ScaleGen]] 1×/10×/100×
  * — and prints the markdown scaling table SCALE.md records, flagging
  * any consecutive-scale time ratio above `flagRatio` (superlinear
  * growth at 10× data needs a documented reason). All scales run in the
  * SAME session with the same min-of-reps estimator, and the graph
  * artifact is built per directory first (its build time is reported as
  * its own row), so the ratios isolate data-dependent cost.
  *
  * LOAD NORMALIZATION (the Bench dual-probe discipline, round-9
  * verdict item 5): this box is burstable — a long probe session
  * throttles, inflating every later (= larger) leg's times and
  * therefore every decade ratio. Each leg measures two fixed,
  * corpus-INDEPENDENT machine probes — a single-task arithmetic scan
  * (CPU/JIT throttle) and a 32-task shuffle aggregate (scheduler/
  * contention) — and every consecutive-scale ratio is reported both
  * raw and divided by the worst of the two probe ratios for that leg
  * pair, clamped below at 1 (a machine that sped up never excuses
  * superlinear growth). The SUPERLINEAR flag fires on the NORMALIZED
  * ratio; the probe seconds print as their own table rows so the
  * normalization is auditable.
  *
  * Usage: `runMain graft.ScaleProbe <dir1,dir2[,dir3...]> <q1,q2,...>
  * [flagRatio]`. A query name suffixed `@cap` runs with a fixed q72
  * block cap (`spark.graft.fuzzy.maxBlock=1000`, or `@capN` for N);
  * `@auto` runs the OPERATOR-DEFAULT auto-derived cap (the registry
  * entry otherwise pins the exact oracle semantics) — the
  * bounded-growth demonstrations for the one known superlinear path. */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    require(dirs.length >= 2, "need at least two corpus dirs")
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val flagRatio = if (args.length > 2) args(2).toDouble else 12.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    def timeOf(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    /** Fixed machine probes, corpus-independent by construction (pure
      * spark.range arithmetic — no input data), so their per-leg ratio
      * isolates MACHINE drift from data growth: (single-task CPU,
      * 32-task shuffle). Min-of-5 steady state after one warmup each. */
    def machineProbes(): (Double, Double) = {
      // modulo keeps the running SUM far from long overflow (ANSI mode)
      val st = spark.range(0, 200000000L, 1, 1)
        .selectExpr("sum((id * 2654435761) % 1000003)")
      val mt = spark.range(0, 200000000L, 1, 32)
        .selectExpr("id % 9973 AS k", "id AS v")
        .groupBy("k").sum("v")
      drain(st); drain(mt)
      def best(df: org.apache.spark.sql.DataFrame) = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); drain(df); (System.nanoTime() - t0) / 1e9
      }.min
      (best(st), best(mt))
    }

    def runScale(dir: String): Map[String, Double] = {
      val art = java.nio.file.Files
        .createTempDirectory("graft-scale-art").resolve("graph").toString
      val buildSec = timeOf(graft.operators.GraphArtifact.build(spark, dir, art))
      spark.conf.set(graft.operators.GraphArtifact.Key, art)
      val CapSuffix = "@(cap(\\d*)|auto)$".r
      val m = names.map { raw =>
        val (n, cap) = CapSuffix.findFirstMatchIn(raw) match {
          case Some(mm) if mm.group(1) == "auto" =>
            (raw.substring(0, mm.start), Some("auto"))
          case Some(mm) =>
            (raw.substring(0, mm.start),
              Some(if (mm.group(2).isEmpty) "1000" else mm.group(2)))
          case None => (raw, None)
        }
        cap.foreach(c =>
          spark.conf.set(graft.queries.Pipeline.FuzzyMaxBlockConf, c))
        val t = timeOf(drain(SparkEntry.queries(n)(spark, dir)))
        if (cap.isDefined)
          spark.conf.unset(graft.queries.Pipeline.FuzzyMaxBlockConf)
        System.gc() // release prior checkpoint blocks outside timed regions
        System.err.println(f"[probe] $dir $raw $t%.2f s") // live progress
        raw -> t
      }.toMap
      spark.conf.unset(graft.operators.GraphArtifact.Key)
      m + ("graph_build" -> buildSec)
    }

    // probe BEFORE each leg: the leg's queries then run under roughly
    // the machine state the probe just measured
    val probed = dirs.map { d =>
      val (st, mt) = machineProbes()
      System.err.println(f"[probe] $d machine st=$st%.3f mt=$mt%.3f s")
      (runScale(d), st, mt)
    }
    val results = probed.map(_._1)
    // per leg-pair load factor: worst of the two probe ratios, >= 1
    val loads = probed.sliding(2).map { case Array((_, st0, mt0), (_, st1, mt1)) =>
      math.max(1.0, math.max(st1 / math.max(st0, 1e-9),
        mt1 / math.max(mt0, 1e-9)))
    }.toSeq
    def f2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val labels = dirs.map(_.split('/').last)
    val ratioHeads = labels.sliding(2).map(p => s"${p(1)}/${p(0)}").toSeq
    println(s"| query | ${labels.map(_ + " s").mkString(" | ")} | " +
      s"${ratioHeads.map(_ + " (norm)").mkString(" | ")} | flag |")
    println("|---|" + ("---|" * (labels.size + ratioHeads.size + 1)))
    (names.toSeq :+ "graph_build").foreach { n =>
      val ts = results.map(_(n))
      val raw = ts.sliding(2).map(p => p(1) / math.max(p(0), 1e-9)).toSeq
      val norm = raw.zip(loads).map { case (r, l) => r / l }
      val flag = if (norm.exists(_ > flagRatio)) "SUPERLINEAR" else ""
      val cells = raw.zip(norm).map { case (r, nm) =>
        if (math.abs(r - nm) < 0.005) f2(r) + "x"
        else s"${f2(r)}x (${f2(nm)}x norm)"
      }
      println(s"| $n | ${ts.map(f2).mkString(" | ")} | " +
        s"${cells.mkString(" | ")} | $flag |")
    }
    // auditable normalization inputs, as table rows
    Seq(("probe_single_task", probed.map(_._2)),
        ("probe_shuffle_32t", probed.map(_._3))).foreach { case (nm, ps) =>
      val rs = ps.sliding(2).map(p => p(1) / math.max(p(0), 1e-9)).toSeq
      println(s"| $nm | ${ps.map(f3).mkString(" | ")} | " +
        s"${rs.map(r => f2(r) + "x").mkString(" | ")} |  |")
    }
    println(s"load factors per decade (worst probe ratio, clamped at 1): " +
      loads.map(f2).mkString(", "))
    graft.llm.Dedup.clearShingleCache()
    spark.stop()
  }
}
