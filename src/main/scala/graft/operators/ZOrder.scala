package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-column pruning — no
  * reference analog (the reference's output sanity check *rejects*
  * sorted/bucketed tables, hive-io-exp-core OutputConf; modern table
  * maintenance made the opposite call). Sorting by one column gives
  * file/row-group min-max stats that prune scans on THAT column only;
  * interleaving the bits of several columns' bucket indices gives every
  * file a narrow value range in ALL of them, so a predicate on any
  * clustered column skips most files. This is the layout a 100 TB
  * warehouse wants under selective multi-dimensional filters.
  *
  * Bucketing is equal-width over the global min/max (ONE map-combinable
  * aggregation per write; heavy skew would want quantile buckets via
  * approxQuantile — same z-value machinery). The z-value itself is pure
  * per-row bit arithmetic — codegen'd, no UDF, no extra shuffle beyond
  * the final range partitioning that any layout rewrite pays. */
object ZOrder {

  /** Bits per dimension (256 buckets): 2 dims → 16-bit z-keys. */
  val BitsPerDim = 8

  /** Interleave the low [[BitsPerDim]] bits of per-column equal-width
    * bucket indices; column i contributes bit k to z-bit k·dims + i.
    * Built in LongType: with int arithmetic, 4 dims puts the top bit at
    * position 31 (the int sign bit → negative keys sort first) and ≥5
    * dims aliases through Java's mod-32 shift. Long supports up to
    * 63 / BitsPerDim dims. */
  def zValue(buckets: Seq[Column]): Column = {
    val dims = buckets.size
    require(dims * BitsPerDim < 64, s"z-value overflows a long for $dims dims")
    val parts = for {
      k <- 0 until BitsPerDim
      (b, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b.cast("long"), k).bitwiseAND(lit(1L)), k * dims + i)
    parts.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Equal-width bucket index in [0, 2^BitsPerDim) given global bounds. */
  private def bucketOf(c: Column, mn: Double, mx: Double): Column = {
    val n = 1 << BitsPerDim
    if (mx <= mn) lit(0)
    else least(lit(n - 1),
      floor((c.cast("double") - mn) / (mx - mn) * n)).cast("int")
  }

  /** `df` redistributed into `files` range partitions of the Morton key
    * over `cols` (each sorted by it) — the transform behind
    * [[writeZOrdered]] and `Engine.optimize(zorderBy = …)`. */
  def zOrdered(df: DataFrame, cols: Seq[String], files: Int): DataFrame = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    val bounds = df.agg(
      cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        .head, cols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).tail: _*)
      .head()
    // empty table (or all-null clustered column) has null bounds: there
    // is nothing to cluster — degrade to a plain coalesce instead of
    // crashing on Row.getDouble
    if (cols.indices.exists(i => bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)))
      return df.coalesce(files)
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      bucketOf(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zValue(buckets))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Rewrite `df` into `files` files z-ordered on `cols` at `path`
    * (parquet). Each output file covers a narrow range of EVERY
    * clustered column — ZOrderSpec measures the per-file span shrink vs
    * a single-column sort. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int): Unit =
    zOrdered(df, cols, files).write.mode("overwrite").parquet(path)
}
