package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join: points against intervals WITHOUT an equi key.
  *
  * The naive plan for `p BETWEEN lo AND hi` is a broadcast-nested-loop /
  * cartesian product — O(|points|·|intervals|), the classic scale
  * killer. Binning both sides to fixed-width buckets turns it into an
  * equi-join: a point lands in exactly one bin, an interval replicates
  * to every bin it overlaps, and the range predicate evaluates as a
  * post-join residual. Each matching pair meets in exactly one bin (the
  * point's), so no dedup pass is needed.
  *
  * Cost model: shuffle carries each interval ⌈len/binWidth⌉+1 times and
  * each point once — pick `binWidth` near the typical interval length so
  * intervals replicate ≈2×. This is the standard bucketized range-join
  * strategy of the large SQL engines, expressed as a plan rewrite over
  * plain operators so Catalyst still sees an equi-join (hash/sort-merge
  * + AQE all apply).
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * [loCol, hiCol] contains pointCol (inclusive both ends). The three
    * columns must be integral (epoch seconds, keys…); intervals with
    * lo > hi are dropped. Output = point columns ++ interval columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__graft_bin"
    val p = points.withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn(bin, explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq(bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }
}
