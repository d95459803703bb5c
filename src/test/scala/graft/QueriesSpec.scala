package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Every registered query runs and yields rows on the smoke fixture, and
  * every query key has matching columns with its oracle declaration.
  * (Value-level correctness is driven by the DuckDB oracle at sf0.01 —
  * tools/check_oracle.py locally, the driver's Verify per round.) */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs with rows > 0") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q178 (large-star/small-star) returns exactly q56's clusters") {
    val lp = SparkEntry.queries("q56_dedup_clusters")(spark, sf).collect().toSeq
    val alt = SparkEntry.queries("q178_cc_alternating")(spark, sf).collect().toSeq
    assert(lp.nonEmpty && lp === alt)
  }

  test("approx_count_distinct lands inside the 3-sigma envelope it reports") {
    import spark.implicits._
    val rows = graft.queries.Extended.approxDistinct(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, exact, within) =>
      assert(exact > 0, s"$flag: exact=$exact")
      assert(within, s"$flag: sketch outside 3-sigma of exact=$exact")
    }
  }
}
