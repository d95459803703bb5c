package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — an operator Spark lacks natively (SURVEY
  * custom-operator preference order (a): composition of built-ins
  * before custom plan nodes).
  *
  * Semantics: for every left row, the single most recent right row with
  * the same key and `rightTs <= leftTs` (DuckDB/kdb ASOF JOIN,
  * left-outer flavor: unmatched left rows keep nulls).
  *
  * Implementation: union both sides tagged, one window pass per key
  * ordered by (ts, right-before-left, tiebreak) carrying
  * `last(right payload, ignoreNulls)` — O(n log n) in each key
  * partition, ONE shuffle on the key, no range-join explosion. At
  * 100 TB this beats a non-equi join (which would be a BNLJ or a
  * range-bucketed join) because the window sort is the only cost and
  * skew follows the key distribution.
  */
object AsOf {

  /** Left as-of join. `rightCols` are the right-side payload columns to
    * carry; they appear in the output with the given names (null when no
    * right row is at or before the left timestamp). Ties on timestamp
    * match the right row (>= semantics), resolved deterministically by
    * `rightTieBreak`. */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightCols: Seq[String], rightTieBreak: String): DataFrame = {
    val l = left.select(
      col(key).as("_k"), col(leftTs).cast("timestamp").as("_ts"),
      lit(1).as("_is_left"), lit(null).cast("long").as("_tie"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_lp"),
      lit(null).cast(structType(right, rightCols)).as("_rp"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).cast("timestamp").as("_ts"),
      lit(0).as("_is_left"), col(rightTieBreak).cast("long").as("_tie"),
      lit(null).cast(structType(left, left.columns.toSeq)).as("_lp"),
      struct(rightCols.map(col).toIndexedSeq: _*).as("_rp"))

    // rights sort before lefts at equal ts (>= match); among equal-ts
    // rights the largest tiebreak wins (deterministic "latest")
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_is_left").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)

    val outLeft = left.columns.toSeq.map(c => col("_lp").getField(c).as(c))
    val outRight = rightCols.map(c => col("_match").getField(c).as(c))
    matched.select((outLeft ++ outRight): _*)
  }

  /** As-of join with a match tolerance (pandas `merge_asof(tolerance=)`
    * / kdb window-join flavor): like [[join]], but a right row more than
    * `tolMillis` older than the left timestamp does not count — the left
    * row survives with nulls. Same single-shuffle window plan; the
    * tolerance is a map-side post-filter that nulls out stale matches,
    * so the scale profile is identical to [[join]]. */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, tolMillis: Long,
                 rightCols: Seq[String], rightTieBreak: String): DataFrame = {
    val tsAlias = "_asof_rts"
    val r2 = right.withColumn(tsAlias, col(rightTs))
    val joined = join(left, r2, key, leftTs, rightTs,
      rightCols :+ tsAlias, rightTieBreak)
    // millisecond floor on both sides: identical truncation semantics in
    // any engine regardless of the stored timestamp precision
    val inTol = col(tsAlias).isNotNull &&
      unix_millis(col(leftTs)) - unix_millis(col(tsAlias)) <= tolMillis
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(inTol, col(c)))
    }.drop(tsAlias)
  }

  /** As-of join through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]] — custom LogicalPlan + Strategy +
    * SparkPlan): each side hash-clusters on its own key and sorts
    * (key, ts), then one forward merge per partition. Semantics match
    * [[join]] on non-null data (>= match, latest tie-break, left
    * outer), each side shuffles at its own row width, and the left
    * ordering survives for downstream operators. Null handling is the
    * SQL-join convention and intentionally stricter than the window
    * form: null keys and null right timestamps never match (the window
    * form's union trick lets null keys co-partition), and a null
    * tie-break sorts FIRST (loses ties) rather than last. Column names
    * must be disjoint across the two frames (rename the right side's
    * ts before calling). */
  def joinMerge(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightKey: String, rightTs: String,
                rightTieBreak: String): DataFrame = {
    val spark = left.sparkSession
    org.apache.spark.sql.GraftBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, rightKey),
        attr(lPlan, leftTs), attr(rPlan, rightTs), attr(rPlan, rightTieBreak)))
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
}
