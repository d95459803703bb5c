package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert (CDC apply / MERGE INTO semantics) — absent from the
  * reference (its output path is append-only,
  * hive-io-exp-core/src/main/java/com/facebook/hiveio/output/HiveApiOutputFormat.java),
  * but table maintenance is a core capability of a batch engine feeding
  * training pipelines: apply a batch of row-level changes to a keyed
  * snapshot.
  *
  * Plan shape: ONE shuffle — a full-outer sort-merge (or, when the
  * update batch is small, broadcast) join on the key. Matched keys take
  * the entire update row (row-level replace, not per-column coalesce —
  * an update may legitimately carry nulls); unmatched update rows are
  * inserts; unmatched base rows pass through. At 100 TB the snapshot
  * side dominates and arrives hash-partitioned by key from its last
  * write, so AQE keeps the exchange one-sided; a deleted-flag column on
  * the update side composes naturally (filter after apply).
  */
object Merge {

  /** Apply `updates` to `base` by `keys` (row-level, updates win).
    *
    * `updates` must have the same schema as `base` and non-null keys;
    * duplicate keys within `updates` must be pre-resolved (e.g. keep the
    * latest by version with a window — see MergeSpec) so the apply is
    * deterministic. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val cols = base.columns.toSeq
    val b = base.as("b")
    val u = updates.as("u")
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val matched = col(s"u.${keys.head}").isNotNull
    b.join(u, cond, "full_outer")
      .select(cols.map(c =>
        when(matched, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)): _*)
  }
}
