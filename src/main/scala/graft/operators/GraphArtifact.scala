package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / serve-many lifecycle for the two derived graphs every
  * graph-family query walks (the [[graft.llm.AnnIndex]] pattern applied
  * to edges):
  *
  *  - `copurchase/`: the part–part co-purchase projection of the
  *    order–part bipartite graph — an edge between two parts appearing
  *    together in ≥ 2 distinct orders. Consumed by the triangle census
  *    (q179), k-core (q184), HyperBall (q211), assortativity (q244)
  *    and the component profile (q245).
  *  - `click/`: the user–item click bipartite graph from `events`
  *    (item nodes keyed into the negative id space, −1−k — disjoint
  *    from any non-negative user id at ANY scale). Consumed by
  *    PageRank (q116) and personalized PageRank (q242).
  *
  * Without an artifact each of those seven queries re-derives its edge
  * list from `lineitem`/`events` — a distinct + self-join + aggregate
  * whose cost DOMINATES the downstream iteration at 100 TB (the
  * projection join fans out C(parts-per-order, 2) per order). [[build]]
  * pays that derivation once and persists the canonical edge lists;
  * [[coPurchase]]/[[clickEdges]] serve from the artifact when
  * `spark.graft.graphArtifact` points at one, and fall back to the
  * inline derivation otherwise — so the queries are self-contained for
  * the correctness gate yet share one scan in production (Bench and
  * Verify both build the artifact up front and serve every graph query
  * from it; the DuckDB oracle still derives edges inline, so a green
  * oracle row IS the proof the served path equals the derivation).
  *
  * Commit discipline: each edge list is written to a staging directory
  * and atomically renamed into place ([[graft.Compact]]'s swap), so a
  * concurrent reader never sees a half-written artifact.
  */
object GraphArtifact {

  /** Session conf key: when set, [[coPurchase]]/[[clickEdges]] read the
    * persisted edge lists under this path instead of re-deriving. */
  val Key = "spark.graft.graphArtifact"

  /** Inline co-purchase derivation (the pre-artifact shape): DISTINCT
    * (order, part) incidence, per-order pair fan-out bounded by order
    * size (never corpus-quadratic), map-side-combinable support count,
    * support ≥ 2. */
  private[graft] def coPurchaseInline(s: SparkSession, dir: String): DataFrame = {
    val items = graft.Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    items.as("x").join(items.as("y"), Seq("o"))
      .where(col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
      .select("a", "b")
  }

  /** Inline click-graph derivation: one DIRECTED (user → item) edge per
    * distinct (user, clicked key); item ids live at −1−k. Callers mirror
    * to the undirected form themselves (both PageRank variants do). */
  private[graft] def clickEdgesInline(s: SparkSession, dir: String): DataFrame =
    graft.Tables.t(s, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("u"),
        (lit(-1L) - get_json_object(col("props"), "$.k").cast("long")).as("v"))
      .distinct()

  /** Distinct (order, part) incidence — the additive unit of the
    * co-purchase graph (orders are atomic, so per-order pair counts
    * sum across disjoint order batches). */
  private[graft] def itemsInline(s: SparkSession, dir: String): DataFrame =
    graft.Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()

  /** UNthresholded pair-support table (a, b, support) from an incidence
    * batch — what the artifact persists so appends stay additive (the
    * thresholded edge list is a projection, not the state). */
  private[graft] def supportFromItems(items: DataFrame): DataFrame =
    items.as("x").join(items.as("y"), Seq("o"))
      .where(col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))

  private def commit(s: SparkSession, outPath: String,
                     support: DataFrame, clicks: DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outPath), s.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(outPath)
    val staging = new org.apache.hadoop.fs.Path(outPath + ".staging")
    fs.delete(staging, true)
    support.write.mode("overwrite").parquet(
      new org.apache.hadoop.fs.Path(staging, "copurchase_support").toString)
    s.read.parquet(
      new org.apache.hadoop.fs.Path(staging, "copurchase_support").toString)
      .where(col("support") >= 2).select("a", "b")
      .write.mode("overwrite").parquet(
        new org.apache.hadoop.fs.Path(staging, "copurchase").toString)
    clicks.write.mode("overwrite").parquet(
      new org.apache.hadoop.fs.Path(staging, "click").toString)
    fs.delete(out, true)
    if (!fs.rename(staging, out))
      throw new IllegalStateException(s"artifact commit failed: $staging -> $out")
  }

  /** Derive both edge lists from `dir`'s tables and persist them under
    * `outPath` (staging + atomic rename), along with the additive
    * pair-support state [[append]] folds new batches into. Idempotent:
    * a re-build replaces the artifact wholesale. */
  def build(s: SparkSession, dir: String, outPath: String): Unit =
    buildFrom(s, itemsInline(s, dir), clickEdgesInline(s, dir), outPath)

  /** [[build]] from explicit incidence/click frames — the entry point
    * for partial-corpus builds (and the append spec's base). */
  private[graft] def buildFrom(s: SparkSession, items: DataFrame,
                               clicks: DataFrame, outPath: String): Unit =
    commit(s, outPath, supportFromItems(items), clicks.distinct())

  /** Incremental maintenance (the `AnnIndex.append` pattern for the
    * graph family): fold a batch of NEW orders' (order, part) incidence
    * and new click events into an existing artifact — support counts
    * sum (orders are atomic and batches must be order-disjoint with
    * the base, the same precondition a daily ingest satisfies by
    * construction), clicks union-distinct, and the thresholded edge
    * list is re-projected; staging + atomic rename, so readers never
    * see a partial state. Cost is O(batch pairs + touched support
    * rows), never a corpus re-derivation. */
  def append(s: SparkSession, itemsBatch: DataFrame,
             clicksBatch: DataFrame, artPath: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(artPath), s.sparkContext.hadoopConfiguration)
    val supPath = new org.apache.hadoop.fs.Path(artPath, "copurchase_support")
    require(fs.exists(supPath),
      s"no pair-support state under $artPath - rebuild with build() first")
    val merged = s.read.parquet(supPath.toString)
      .unionByName(supportFromItems(itemsBatch))
      .groupBy("a", "b").agg(sum("support").as("support"))
      .localCheckpoint(true) // cut lineage from the files being replaced
    val clicks = s.read.parquet(
      new org.apache.hadoop.fs.Path(artPath, "click").toString)
      .unionByName(clicksBatch).distinct()
      .localCheckpoint(true)
    commit(s, artPath, merged, clicks)
  }

  private def serve(s: SparkSession, sub: String): Option[DataFrame] =
    s.conf.getOption(Key).flatMap { root =>
      val p = new org.apache.hadoop.fs.Path(root, sub)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(s.read.parquet(p.toString)) else None
    }

  /** Co-purchase edge list (a, b): served from the artifact when one is
    * configured and present, inline-derived otherwise. */
  def coPurchase(s: SparkSession, dir: String): DataFrame =
    serve(s, "copurchase").getOrElse(coPurchaseInline(s, dir))

  /** Directed click edge list (u, v): artifact-served or inline. */
  def clickEdges(s: SparkSession, dir: String): DataFrame =
    serve(s, "click").getOrElse(clickEdgesInline(s, dir))
}
