package graft.common

import org.apache.spark.sql.{Column, DataFrame}

/** Materialization guard for a loop's FIXED input frame — the round-10
  * `graft.IterProbe` finding promoted to an enforced invariant (round-11
  * stretch): a bare `persist`/`localCheckpoint` of a shuffle output gets
  * AQE-COALESCED (at fixture scale all the way to ONE partition, ~90 MB
  * sitting under the advisory size), so every iteration of a loop
  * joining that frame scans and shuffle-writes its biggest input
  * single-threaded. The class bit twice (round-9 one-task-per-bucket
  * files, round-10 width collapse), so the fix pattern — an explicit
  * user `repartition(N, key)`, a width AQE must not coalesce,
  * materialized row-format by an eager `localCheckpoint` — now lives in
  * ONE audited helper that every fixed-loop-input site routes through,
  * and the width is ASSERTED after materialization instead of assumed.
  *
  * Why this is a helper rather than a PlanInv column (the considered
  * alternative): a checkpoint's width never appears in a CONSUMER's
  * plan string (the frame scans as `Scan ExistingRDD` with no partition
  * count), and width 1 is legitimate for bounded frames (teleport
  * tables, centroids, single-row aggregates), so a registry-wide
  * string flag would be either blind or exemption noise. The invariant
  * is only visible at materialization time, with the key in hand —
  * exactly this call site.
  *
  * NOT for frames the loop REBUILDS each round (CC-alternating's edge
  * set, k-core peeling): those re-shuffle anyway, and their width
  * re-adapts to their shrinking size by design. */
object IterFrame {

  /** Repartition `df` to the session's full shuffle width on `key`
    * (the loop's per-iteration join key), eagerly checkpoint, and fail
    * loudly if the materialized width is not exactly what was pinned —
    * a width collapse here silently serializes every iteration of the
    * caller's loop at 100× scale (measured 7.15 → 3.67 s on the q116
    * loop from this alone). */
  def keyed(df: DataFrame, key: Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val out = df.repartition(n, key: _*).localCheckpoint(true)
    val got = out.rdd.getNumPartitions
    if (got != n)
      throw new IllegalStateException(
        s"loop-input frame materialized at width $got, expected the pinned " +
          s"$n — a user repartition's width must survive localCheckpoint " +
          "(PlanSpec pins this Spark contract); a collapse here would " +
          "serialize every iteration of the calling loop")
    out
  }
}
