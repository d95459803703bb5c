package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.{Engine, TableSpec, WriteSpec}

/** `output` CLI parity — the reference cmdline quartet's writer demo
  * (hive-io-exp-cmdline output/OutputCmd.java:98-186): write the fixed
  * 4-column demo rows (i1 BIGINT, d2 DOUBLE, b3 BOOLEAN, s4 STRING —
  * the two records at OutputCmd.java:167-178) through the committed
  * write path, optionally into the demo partition ds=2013-04-01
  * (OutputCmd.java:80-82), with per-task commit accounting printed at
  * the end.
  *
  * The reference's `--threads N` hand-rolls N writer threads that share
  * one job-level two-phase commit; the Spark-first analog is N
  * *partitions* — each becomes a write task with its own task commit
  * under the same job commit, and Spark schedules the threading. Each
  * committed task materializes as one data file, so the file listing IS
  * the task-commit ledger (plus `_SUCCESS` as the job-commit marker).
  *
  * Usage: runMain graft.Output <warehouseDir> [tasks] [--partitioned]
  */
object Output {

  /** One committed data file (= one task commit) in the ledger. */
  final case class TaskCommit(file: String, bytes: Long)

  final case class Summary(tasks: Seq[TaskCommit], jobCommitted: Boolean,
      rowsWritten: Long, rowsReadBack: Long)

  /** The reference demo's per-thread payload: two fixed records per
    * writer task (OutputCmd.java:167-178), over `tasks` parallel tasks.
    * `range(..., numPartitions = tasks)` pins exactly one task id per
    * partition — no shuffle, no exchange in the write plan. */
  private[graft] def demoRows(spark: SparkSession, tasks: Int) =
    spark.range(0, tasks, 1, numPartitions = tasks)
      .select(explode(typedLit(Seq(0, 1))).as("r"))
      .select(
        when(col("r") === 0, 11L).otherwise(33L).as("i1"),
        when(col("r") === 0, 22.22).otherwise(44.44).as("d2"),
        (col("r") === 0).as("b3"),
        when(col("r") === 0, "foo").otherwise("bar").as("s4"))

  def run(spark: SparkSession, warehouse: String, tasks: Int,
      partitioned: Boolean): Summary = {
    val engine = new Engine(spark, warehouse)
    val table = if (partitioned) "output_test_partitioned" else "output_test"
    val spec = TableSpec(table)
    val ws =
      if (partitioned)
        WriteSpec(partitionValues = Map("ds" -> "2013-04-01"),
          dropExistingPartition = true)
      else WriteSpec()
    val df = demoRows(spark, tasks)
    engine.write(spec, df, ws)

    // commit accounting off the committed layout: one data file per
    // committed task, _SUCCESS per committed job
    val dataDir = Paths.get(warehouse, spec.database, table +
      (if (partitioned) "/ds=2013-04-01" else ""))
    val listing = Files.list(dataDir)
    val committed =
      try listing.iterator().asScala(identity)
      finally listing.close()
    val files = committed.filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => TaskCommit(p.getFileName.toString, Files.size(p)))
      .sortBy(_.file)
    val success = Files.exists(dataDir.resolve("_SUCCESS"))

    val readSpec =
      if (partitioned) spec.copy(partitionFilter = Some(col("ds") === "2013-04-01"))
      else spec
    Summary(files, success, tasks.toLong * 2, engine.read(readSpec).count())
  }

  // java-stream-to-scala shim without a scala-collection-compat dep
  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala[B](f: A => B): List[B] = {
      val buf = List.newBuilder[B]
      while (it.hasNext) buf += f(it.next())
      buf.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse(
      Files.createTempDirectory("graft-output").toString)
    val flags = args.drop(1)
    val tasks = flags.find(!_.startsWith("--")).map(_.toInt).getOrElse(4)
    val partitioned = flags.contains("--partitioned")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val s = run(spark, warehouse, tasks, partitioned)
    s.tasks.zipWithIndex.foreach { case (t, i) =>
      println(f"[output] task-commit $i%3d: ${t.file} (${t.bytes} bytes)")
    }
    println(s"[output] job-commit: _SUCCESS=${s.jobCommitted} " +
      s"tasks=${s.tasks.size} rows_written=${s.rowsWritten} " +
      s"rows_read_back=${s.rowsReadBack}")
    spark.stop()
  }
}
