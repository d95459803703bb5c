package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY §7.1): both sides bucketed on
  * the join key → the sort-merge join needs NO shuffle exchange. At
  * 100 TB this is the difference between re-shuffling two fact tables on
  * every join and a purely local merge. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("joins of co-bucketed tables plan without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), "co-bucketed join must not shuffle:\n" + plan.take(800))
      assert(joined.count() > 0)

      // control: the same join on unbucketed parquet DOES shuffle
      val unbucketed = li.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
