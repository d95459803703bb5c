package graft

import org.apache.spark.sql.SparkSession

/** Plan-inventory tool (dev-facing, like [[Verify]]/[[Bench]]): prints one
  * `INV|query|…` line per registered query with counts of the physical
  * operators that matter at scale — hash/range exchanges, broadcasts,
  * join strategies, WindowGroupLimit, TakeOrderedAndProject. SCALE.md's
  * mechanical table is generated from this output; rerun after plan
  * changes to keep it honest. */
object PlanInv {
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
        val ex = "Exchange hashpartitioning".r.findAllIn(p).size
        val rp = "Exchange rangepartitioning".r.findAllIn(p).size
        val bc = "BroadcastExchange".r.findAllIn(p).size
        val smj = "SortMergeJoin".r.findAllIn(p).size
        val bhj = "BroadcastHashJoin".r.findAllIn(p).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        val single = "Exchange SinglePartition".r.findAllIn(p).size
        val wgl = if (p.contains("WindowGroupLimit")) 1 else 0
        val top = if (p.contains("TakeOrderedAndProject")) 1 else 0
        val cart = "CartesianProduct".r.findAllIn(p).size // must be 0 everywhere
        println(s"INV|$n|hash=$ex|range=$rp|single=$single|bcast=$bc|smj=$smj|bhj=$bhj|bnlj=$bnlj|wgl=$wgl|topk=$top|cart=$cart")
      } catch { case e: Throwable => println(s"INV|$n|ERR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
