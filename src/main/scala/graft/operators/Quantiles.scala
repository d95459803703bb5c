package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The 100 TB decile path promised by q90's scaladoc (SCALE.md
  * "Curation" family): instead of a global-order ntile window (one
  * `Exchange SinglePartition` total sort), compute approximate quantile
  * cut points once (Greenwald-Khanna sketch, one map-combinable pass,
  * driver holds n-1 doubles) and assign buckets map-side against the
  * broadcast cut array. Same output contract as ntile up to sketch
  * error at the cut boundaries; zero data shuffles. No reference analog
  * (the reference has no aggregation surface — SURVEY §2.4).
  */
object Quantiles {

  /** Cut points for n equal-frequency buckets of `valueCol`. */
  def cutPoints(df: DataFrame, valueCol: String, n: Int,
                relErr: Double = 0.001): Array[Double] =
    df.stat.approxQuantile(valueCol, (1 until n).map(_.toDouble / n).toArray, relErr)

  /** Bucket index 1..n for `value` against precomputed ascending cuts:
    * 1 + |{c : c < value}| — a pure expression over a literal array, so
    * the assignment is map-side and codegen'd. */
  def bucketExpr(cuts: Array[Double], value: Column): Column =
    (lit(1) + size(filter(array(cuts.toSeq.map(lit): _*), c => c < value))).cast("int")

  /** Equal-frequency bucketing of a column: the shuffle-free ntile.
    * Adds `bucketCol` ∈ 1..n. */
  def bucketByQuantiles(df: DataFrame, valueCol: String, n: Int,
                        bucketCol: String = "bucket",
                        relErr: Double = 0.001): DataFrame =
    df.withColumn(bucketCol, bucketExpr(cutPoints(df, valueCol, n, relErr), col(valueCol)))
}
