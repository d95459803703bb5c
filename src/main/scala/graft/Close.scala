package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-close doc regenerator (dev-facing, like [[PlanInv]]): one
  * command that eliminates the recurring doc-drift class — QUERIES.md
  * rows, the SCALE.md mechanical plan inventory, and the registry-count
  * references in README.md/SCALE.md all regenerate from the live
  * registry in a single run. `DocsSpec` pins the outputs against
  * `SparkEntry.queries.size`, so a registry change with stale docs
  * fails the suite until this main is re-run.
  *
  * Usage: `sbt "runMain graft.Close"` from the repo root. Pass `bench`
  * to also run [[Bench]] afterwards (same JVM, honoring the usual
  * SPARK_GRAFT_* env), refreshing BENCH_FULL.json/BENCH_DIFF.md in the
  * same sweep.
  */
object Close {

  private def fixCounts(content: String, n: Int): String = content
    .replaceAll("""all \d+ quer""", s"all $n quer")
    .replaceAll("""for all \d+ registered quer""", s"for all $n registered quer")
    .replaceAll("""\d+-query""", s"$n-query")
    .replaceAll("""\d+/\d+ hash-match""", s"$n/$n hash-match")
    .replaceAll("""\d+-row plan inventory""", s"$n-row plan inventory")

  def main(args: Array[String]): Unit = {
    val n = SparkEntry.queries.size

    // 1. QUERIES.md — the python generator is stdlib-only
    val rc = new ProcessBuilder("python3", "tools/gen_queries_md.py")
      .inheritIO().start().waitFor()
    require(rc == 0, "tools/gen_queries_md.py failed")

    // 2. mechanical plan inventory → SCALE.md (same counters as PlanInv)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (nm, fn) =>
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      s"| $nm | ${PlanInv.counts(p).mkString(" | ")} |"
    }
    graft.llm.Dedup.clearShingleCache()
    spark.stop()

    val scalePath = Paths.get("SCALE.md")
    val scale = Files.readString(scalePath)
    val header = "## Mechanical plan inventory"
    val start = scale.indexOf(header)
    require(start >= 0, "SCALE.md inventory header missing")
    val afterHead = scale.indexOf('\n', start) + 1
    val end = scale.indexOf("\n## ", afterHead)
    require(end >= 0, "SCALE.md has no section after the inventory")
    val section = scale.substring(start, afterHead) +
      s"\n| query | ${PlanInv.Cols.mkString(" | ")} |\n" +
      s"|---|${"---|" * PlanInv.Cols.size}\n" +
      rows.mkString("\n") + "\n"
    Files.writeString(scalePath,
      fixCounts(scale.substring(0, start) + section + scale.substring(end), n))

    // 3. README registry-count references
    val readmePath = Paths.get("README.md")
    Files.writeString(readmePath, fixCounts(Files.readString(readmePath), n))

    println(s"[close] regenerated QUERIES.md, SCALE.md inventory " +
      s"(${rows.size} rows), count references -> $n")

    // 4. optional bench refresh in the same sweep
    if (args.contains("bench")) Bench.main(Array.empty)
  }
}
