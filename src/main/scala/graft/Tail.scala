package graft

import org.apache.spark.sql.SparkSession

/** `hivetail` CLI parity (reference hive-io-exp-cmdline
  * tailer/TailerCmd.java: stream a table to stdout with --limit and a
  * column separator; throughput stats at the end, tailer/Stats.java).
  *
  * Usage: runMain graft.Tail <sfDir> <table> [limit] [separator]
  */
object Tail {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val table = if (args.length > 1) args(1) else "lineitem"
    val limit = if (args.length > 2) args(2).toInt else 20
    val sep = if (args.length > 3) args(3) else "\t"

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
    System.err.println(f"[tail] $table: ${rows.length} rows in $sec%.2f s")
    spark.stop()
  }
}
