package graft

import org.apache.spark.sql.SparkSession

/** Plan-inventory tool (dev-facing, like [[Verify]]/[[Bench]]): prints one
  * `INV|query|…` line per registered query with counts of the physical
  * operators that matter at scale — hash/range exchanges, broadcasts,
  * join strategies, WindowGroupLimit, TakeOrderedAndProject. SCALE.md's
  * mechanical table is generated from this output; rerun after plan
  * changes to keep it honest. */
object PlanInv {

  /** Column keys of the mechanical inventory, in emission order —
    * shared with [[Close]] so the SCALE.md table can never drift from
    * the INV lines. */
  private[graft] val Cols =
    Seq("hash", "range", "single", "bcast", "smj", "bhj", "bnlj", "wgl",
      "topk", "cart")

  /** Operator counts for one executed-plan string, aligned to [[Cols]]. */
  private[graft] def counts(p: String): Seq[Int] = Seq(
    "Exchange hashpartitioning".r.findAllIn(p).size,
    "Exchange rangepartitioning".r.findAllIn(p).size,
    "Exchange SinglePartition".r.findAllIn(p).size,
    "BroadcastExchange".r.findAllIn(p).size,
    "SortMergeJoin".r.findAllIn(p).size,
    "BroadcastHashJoin".r.findAllIn(p).size,
    "BroadcastNestedLoopJoin".r.findAllIn(p).size,
    if (p.contains("WindowGroupLimit")) 1 else 0,
    if (p.contains("TakeOrderedAndProject")) 1 else 0,
    "CartesianProduct".r.findAllIn(p).size) // must be 0 everywhere

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for ((n, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val kv = Cols.zip(counts(p)).map { case (k, v) => s"$k=$v" }
        println(s"INV|$n|${kv.mkString("|")}")
      } catch { case e: Throwable => println(s"INV|$n|ERR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
