package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access — the Spark analog of the reference's table scan
  * entry point (`HiveInput.readTable`, reference
  * hive-io-exp-core/src/main/java/com/facebook/hiveio/input/HiveInput.java:66).
  *
  * Tables are parquet directories under a scale-factor dir; Spark's file
  * source gives us partition pruning, column pruning, and predicate
  * pushdown for free (SURVEY.md §2.1 S1–S10 are all subsumed by
  * `spark.read.parquet`).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table. Column projection and row-level filters applied by the
    * caller stay pushed down to the parquet scan by Catalyst.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects by default; we read it as a raw nanos long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond timestamp with integer division (lossless truncation —
    * `ts / 1000` via `div` to avoid double rounding on int64). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
