package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys (SURVEY §7.1 100-TB stance).
  *
  * Partial (map-side) aggregation already absorbs aggregation skew, and
  * AQE splits skewed JOIN partitions at runtime — but AQE only helps
  * sort-merge joins; a deliberately salted join is the portable fix when
  * one fact-side key dominates (e.g. a null-ish default id holding 10% of
  * a 100 TB table): the hot key's rows spread over `salts` reducer
  * partitions instead of one straggler.
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, salts);
  * the small side is replicated `salts`× with every salt value; the join
  * key becomes (key, salt). Replication multiplies the small side only.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted against skew in big's key
    * distribution. Result equals the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    // per-row salt: row-content hash mixed with the row position so even
    // IDENTICAL hot-key rows spread across buckets. The position term
    // (monotonically_increasing_id) depends on partition layout, so salt
    // values are not stable across different reads — results are correct
    // regardless since the small side carries every salt value.
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*), monotonically_increasing_id()),
        lit(salts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
