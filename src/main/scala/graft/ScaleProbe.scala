package graft

import org.apache.spark.sql.SparkSession

/** Two-scale timing probe (dev tool): runs the named queries against two
  * corpus directories — typically a [[ScaleGen]] 1× and 10× — and
  * prints the markdown scaling table SCALE.md records, flagging any
  * query whose time ratio exceeds `flagRatio` (superlinear at 10× data
  * needs a documented reason). Both scales run in the SAME session with
  * the same min-of-reps estimator, and the graph artifact is built per
  * directory first (its build time is reported as its own row), so the
  * ratio isolates data-dependent cost. */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB, queriesCsv) = args.take(3)
    val flagRatio =
      if (args.length > 3) args(3).toDouble else 12.0
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
    val names = queriesCsv.split(',').map(_.trim).filter(_.nonEmpty)

    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    def timeOf(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    def runScale(dir: String): Map[String, Double] = {
      val art = java.nio.file.Files
        .createTempDirectory("graft-scale-art").resolve("graph").toString
      val buildSec = timeOf(graft.operators.GraphArtifact.build(spark, dir, art))
      spark.conf.set(graft.operators.GraphArtifact.Key, art)
      val m = names.map { n =>
        n -> timeOf(drain(SparkEntry.queries(n)(spark, dir)))
      }.toMap
      spark.conf.unset(graft.operators.GraphArtifact.Key)
      m + ("graph_build" -> buildSec)
    }

    val a = runScale(dirA)
    val b = runScale(dirB)
    def f2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"| query | ${dirA.split('/').last} s | ${dirB.split('/').last} s | ratio | flag |")
    println("|---|---|---|---|---|")
    (names.toSeq :+ "graph_build").foreach { n =>
      val r = b(n) / math.max(a(n), 1e-9)
      val flag = if (r > flagRatio) "SUPERLINEAR" else ""
      println(s"| $n | ${f2(a(n))} | ${f2(b(n))} | ${f2(r)}x | $flag |")
    }
    graft.llm.Dedup.clearShingleCache()
    spark.stop()
  }
}
