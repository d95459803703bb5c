package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder

/** Z-order layout: measure that every output file covers a narrow range
  * of BOTH clustered columns (the property min-max pruning needs),
  * against the single-column-sort baseline where the unsorted column's
  * per-file span stays ~global. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def meanSpanFraction(path: String, c: String, globalSpan: Double): Double = {
    val spans = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
      .groupBy("__f").agg((max(col(c)) - min(col(c))).cast("double").as("span"))
      .as[(String, Double)].collect().map(_._2)
    spans.sum / spans.length / globalSpan
  }

  test("z-values stay positive and injective at 4 dimensions (long arithmetic)") {
    // 4 dims × 8 bits puts the top interleaved bit at position 31 — the
    // int sign bit; the long-typed build must keep keys non-negative and
    // distinct bucket tuples distinct
    val df = Seq((255, 255, 255, 255), (255, 255, 255, 254), (0, 0, 0, 0))
      .toDF("a", "b", "c", "d")
    val z = df.select(ZOrder.zValue(Seq(col("a"), col("b"), col("c"), col("d")))
      .as("z")).as[Long].collect()
    assert(z.forall(_ >= 0L), s"z-keys must not overflow into the sign bit: ${z.toSeq}")
    assert(z.distinct.length === 3)
    assert(z(0) === (1L << 32) - 1, "all-255 buckets set all 32 interleaved bits")
  }

  test("z-ordered files have narrow ranges in BOTH dimensions; linear sort does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    try {
      val ev = Tables.t(spark, sf, "events")
        .select(col("user_id"), col("event_id"))
      val uSpan = 149.0 // user_id 0..149
      val eSpan = ev.agg(max("event_id") - min("event_id")).head().getLong(0).toDouble
      val files = 16

      val zPath = new java.io.File(dir, "z").getPath
      ZOrder.writeZOrdered(ev, zPath, Seq("user_id", "event_id"), files)
      val zU = meanSpanFraction(zPath, "user_id", uSpan)
      val zE = meanSpanFraction(zPath, "event_id", eSpan)

      val sPath = new java.io.File(dir, "s").getPath
      ev.repartitionByRange(files, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(sPath)
      val sE = meanSpanFraction(sPath, "event_id", eSpan)

      // 16 files over a 2-D z-curve → ~4×4 grid → ~1/4 span per dim;
      // generous bounds keep the test robust to boundary files
      assert(zU <= 0.5, s"z-order user_id mean span fraction $zU")
      assert(zE <= 0.5, s"z-order event_id mean span fraction $zE")
      // the single-column sort leaves the other column unclustered
      assert(sE >= 0.8, s"linear sort should NOT cluster event_id (got $sE)")
      assert(zE < sE / 2, "z-order must beat linear sort on the second dimension")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
