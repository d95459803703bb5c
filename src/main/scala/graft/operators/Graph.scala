package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph-census operators (companion to PageRank in
  * `queries/Analytics` and the connected-components family in
  * `llm/Dedup`).
  *
  * Triangle counting uses the degree-orientation ("compact-forward" /
  * node-iterator++) scheme standard in the MapReduce literature (Suri &
  * Vassilvitskii, WWW '11): orient every undirected edge from its
  * (degree, id)-smaller endpoint to the larger, then join out-wedges
  * against oriented edges. Orientation bounds every out-neighborhood by
  * O(√m), so the wedge join is O(m^1.5) worst-case instead of Σdeg² —
  * on a hub-heavy graph at 100 TB that is the difference between a
  * bounded shuffle and an exploding one. Each triangle is produced
  * exactly once (owned by its orientation-least vertex).
  */
object Graph {

  /** Whole-graph census over an undirected edge list (columns `aCol`,
    * `bCol`; duplicates/self-loops tolerated — the edge set is
    * canonicalized first). Returns ONE row:
    * (n_nodes, n_edges, n_wedges, n_triangles, global_cc) where
    * n_wedges = Σᵥ C(deg v, 2) (open + closed paths of length 2) and
    * global_cc = 3·triangles / wedges (0 when wedgeless). */
  def triangleCensus(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    // materialize the canonical edge list and the degree table ONCE
    // (eager localCheckpoint, the CC discipline): every later stage —
    // degrees, orientation, wedge join, closing-edge probe, the three
    // census aggregates — re-reads them, and without the cut each
    // reference replans the full upstream subtree (the raw plan carried
    // 44 input scans; at 100 TB that is 44 passes over the input)
    val edges = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
              greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
      .localCheckpoint(true)
    val und = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
      .select(col("a").as("n"), col("d"))
      .localCheckpoint(true)
    val lt = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val ori = edges
      .join(deg.select(col("n").as("na"), col("d").as("da")), col("a") === col("na"))
      .join(deg.select(col("n").as("nb"), col("d").as("db")), col("b") === col("nb"))
      .select(when(lt, col("a")).otherwise(col("b")).as("src"),
              when(lt, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
    val orid = ori.join(deg, ori("dst") === deg("n"))
      .select(col("src"), col("dst"), col("d").as("dd"))
    // out-wedges at each src, out-neighbors ordered by the same
    // (degree, id) total order the orientation used — the closing edge
    // of a π-ordered triangle x→y→z is then always oriented y→z
    val wedge2 = orid.as("e1").join(orid.as("e2"), Seq("src"))
      .where(col("e1.dd") < col("e2.dd") ||
        (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst")))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    val tri = wedge2.join(ori, col("v") === ori("src") && col("w") === ori("dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
    val edgeStats = edges.agg(count(lit(1)).as("n_edges"))
    // house rule (04cb0ef): broadcast every bounded crossJoin side
    // explicitly — the sides are single-row aggregates, and the pin
    // keeps the plan shape stable without relying on AQE's rescue
    degStats.crossJoin(broadcast(edgeStats)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(when(col("n_wedges") === 0, lit(0.0))
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")), 6)
          .as("global_cc"))
  }

  /** Rounds the last [[kCore]] call took to reach its fixpoint.
    * Test/calibration introspection, last-call-wins (the
    * [[graft.llm.Dedup.lastAlternatingRounds]] convention). */
  @volatile private[graft] var lastKCoreRounds: Int = 0

  /** k-core: the (unique) maximal subgraph in which every node has
    * degree ≥ k, by synchronous parallel peeling — each round drops ALL
    * nodes whose current degree is < k and induces the surviving edge
    * set (Matula & Beck's peeling, batch-synchronous as in
    * Montresor et al., "Distributed k-Core Decomposition", TPDS '13).
    * One distributed degree aggregate + two anti-joins per round, edge
    * list re-checkpointed so plans stay flat (the CC loop discipline);
    * round count is the graph's peeling depth, typically O(log n) on
    * natural graphs. Fails loudly if `maxRounds` passes don't converge
    * rather than returning a non-core superset.
    *
    * Returns (node, core_deg) for every k-core member, where core_deg
    * is its degree WITHIN the core (≥ k by construction); empty when
    * the graph has no k-core. Input edges may carry duplicates or
    * self-loops — the edge set is canonicalized first. */
  def kCore(pairs: DataFrame, k: Int, aCol: String = "a", bCol: String = "b",
            maxRounds: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val canon = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
              greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    var und = canon.union(canon.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var removed = 1L
    var round = 0
    while (removed > 0 && round < maxRounds) {
      val bad = und.groupBy("a").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).select(col("a").as("n"))
        .localCheckpoint(true)
      removed = bad.count()
      if (removed > 0) {
        und = und.join(bad, und("a") === bad("n"), "left_anti")
          .join(bad, und("b") === bad("n"), "left_anti")
          .localCheckpoint(true)
        round += 1
      }
    }
    if (removed > 0)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxRounds rounds — raise maxRounds")
    lastKCoreRounds = round
    und.groupBy("a").agg(count(lit(1)).cast("int").as("core_deg"))
      .select(col("a").as("node"), col("core_deg"))
  }

  /** HyperBall neighborhood-function estimation (Boldi, Rosa & Vigna,
    * "HyperANF" WWW '11 / "In-Core Computation of Geometric
    * Centralities with HyperBall" '13): per node an HLL register set
    * approximates |B(n, r)| — the ball of radius r — and one round of
    * register max-merge along edges advances EVERY ball by one hop
    * simultaneously. State is O(n · 2^b) tiny registers regardless of
    * graph size or diameter; reachable SETS are never materialized
    * (that is the entire point — exact r-hop neighborhoods are
    * quadratic on small-world graphs). Each round is one keyed join +
    * one (node, bucket) max aggregate, re-checkpointed so plans stay
    * flat (the CC/k-core loop discipline).
    *
    * b = 4 here (16 registers/node, ~26% rel. std. error — the
    * diagnostic regime; production raises b, identical plan). Register
    * content is md5-derived: bucket from hex chars 1–4, leading-zero
    * rank ρ ∈ [1, 25] from the 24-bit value in hex chars 5–10 —
    * disjoint bit ranges so bucket and rank are independent. The
    * estimate is the RAW Flajolet HLL estimator α₁₆·16²/Z without the
    * small-range linear-counting correction: the correction needs
    * ln(), while every quantity in the raw form — register maxima, Z
    * as a sum of dyadic rationals spanning < 53 bits — is exact in
    * IEEE doubles, which is what makes the estimate itself
    * oracle-replayable bit for bit in any engine.
    *
    * Returns (node, r, est_ball) for r = 1..rounds, where est_ball
    * estimates |B(node, r)| (self included). */
  def hyperBall(pairs: DataFrame, rounds: Int = 3,
      aCol: String = "a", bCol: String = "b",
      preMirrored: Boolean = false): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // fixed edge set joined on dst every round: an explicit full-width
    // repartition before the checkpoint (the q116 IterProbe finding —
    // a bare checkpointed shuffle output gets AQE-coalesced, at fixture
    // scale to ONE partition, serializing every round's biggest input).
    // preMirrored: the caller hands an ALREADY canonical+mirrored frame
    // whose scan carries a dst-keyed partitioning — the GraphArtifact
    // bucketedServe shape (copurchase_iter) — so re-mirroring or
    // re-distributing it here would only destroy the exchange-free
    // iteration that shape exists for; use it as-is.
    val und = if (preMirrored) e
    else graft.common.IterFrame.keyed(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct(),
      col("dst"))
    val nodes = und.select(col("src").as("n")).distinct()
    val h = md5(col("n").cast("string"))
    val v = conv(substring(h, 5, 6), 16, 10).cast("long")
    var regs = nodes.select(col("n"),
      (conv(substring(h, 1, 4), 16, 10).cast("long") % 16).cast("int").as("bkt"),
      when(v === 0, lit(25)).otherwise(lit(25) - length(bin(v)))
        .cast("int").as("m"))
      .localCheckpoint(true)
    def estimate(r: Int, df: DataFrame): DataFrame =
      df.groupBy("n").agg(count(lit(1)).as("nb"),
          sum(expr("1.0 / cast(shiftleft(1l, m) as double)")).as("zn"))
        .select(col("n").as("node"), lit(r).as("r"),
          round(lit(172.288) / (lit(16.0) - col("nb") + col("zn")), 4)
            .as("est_ball"))
    (1 to rounds).map { r =>
      regs = regs.union(
          und.join(regs, col("dst") === col("n"))
            .select(col("src").as("n"), col("bkt"), col("m")))
        .groupBy("n", "bkt").agg(max("m").as("m"))
        .localCheckpoint(true)
      estimate(r, regs)
    }.reduce(_ unionAll _)
  }
}
