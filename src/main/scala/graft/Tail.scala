package graft

import org.apache.spark.sql.SparkSession

/** `hivetail` CLI parity (reference hive-io-exp-cmdline
  * tailer/TailerCmd.java: stream a table to stdout with --limit and a
  * column separator; throughput stats at the end, tailer/Stats.java,
  * with `--append-stats-to FILE` appending the stats line to a metrics
  * file, tailer/TailerArgs.java:62-66 + Stats.java:133).
  *
  * Usage: runMain graft.Tail <sfDir> <table> [limit] [separator]
  *                           [--append-stats-to FILE]
  */
object Tail {

  /** The reference Stats line shape: rows, seconds, rows/s, MB/s
    * (tailer/Stats.java:48-110 tracks exactly these counters). */
  private[graft] def statsLine(table: String, rows: Long, bytes: Long,
      sec: Double): String = {
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    s"[tail] $table: $rows rows in ${f(sec)} s " +
      s"(${f(rows / sec)} rows/s, ${f(bytes / 1e6 / sec)} MB/s)"
  }

  /** Append one stats line to `file` (creating it if absent) — the
    * `--append-stats-to` contract: successive runs accrete lines. */
  private[graft] def appendStats(file: String, line: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(file),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  def main(args: Array[String]): Unit = {
    val statsTo = args.sliding(2).collectFirst {
      case Array("--append-stats-to", f) => f
    }
    val pos = {
      val b = Array.newBuilder[String]
      var skip = false
      for (a <- args) {
        if (skip) skip = false
        else if (a == "--append-stats-to") skip = true
        else b += a
      }
      b.result()
    }
    val sfDir = if (pos.length > 0) pos(0) else "/root/testdata/sf0.001"
    val table = if (pos.length > 1) pos(1) else "lineitem"
    val limit = if (pos.length > 2) pos(2).toInt else 20
    val sep = if (pos.length > 3) pos(3) else "\t"

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val df = Tables.t(spark, sfDir, table)
    val rows = df.limit(limit).collect()
    println(df.schema.fieldNames.mkString(sep))
    rows.foreach { r =>
      println((0 until r.length).map(i =>
        if (r.isNullAt(i)) "\\N" else r.get(i).toString).mkString(sep))
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // bytes actually emitted, not table bytes: a limit-N tail reads a
    // prefix, and the reference meters what it printed
    val emitted = rows.iterator.map(r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) 2L else r.get(i).toString.length.toLong).sum +
        r.length - 1 + 1L).sum
    val line = statsLine(table, rows.length.toLong, emitted, sec)
    System.err.println(line)
    statsTo.foreach(appendStats(_, line))
    spark.stop()
  }
}
