package graft.functions

import org.apache.spark.sql.DataFrame

/** Hashed-feature linear quality model — the fastText-style learned
  * gate of published curation pipelines (hashed bag-of-ngrams × weight
  * vector), as DATA: a (bucket, w_milli) weight table with B buckets.
  * Training happens offline; the engine's job is INFERENCE
  * ([[graft.llm.TextOps.linearQualityScore]]) — a codegen'd
  * expression, no shuffle, no UDF.
  *
  * Weights are integer milli-units so the per-document score sum is an
  * exact BIGINT (the repo-wide integer-moment discipline); the single
  * float op is the final normalized division at presentation.
  *
  * [[fixture]] is the deterministic stand-in for a trained model: a
  * Weyl-style mix of the bucket id into [-1000, 1000], replayable
  * verbatim in the DuckDB oracle (q258 recomputes the same formula
  * inline — the BpeKernel merge-table discipline: the oracle replays
  * the MODEL, not the training). A real deployment loads a trained
  * table via [[load]]; the scorer is indifferent to where the weights
  * came from. */
object QualityModel {

  /** Default model width: 512 hash buckets. */
  val Buckets = 512

  /** Deterministic fixture weights: w(b) = (b·2654435761 + 12345) mod
    * 2001 − 1000, an integer in [-1000, 1000]. */
  def fixture(buckets: Int = Buckets): Array[Int] =
    Array.tabulate(buckets)(b =>
      ((b.toLong * 2654435761L + 12345L) % 2001L - 1000L).toInt)

  /** DuckDB twin of [[fixture]] over a bucket SQL expression — MUST
    * stay in bit-lockstep with it. */
  def fixtureSql(bucketExpr: String): String =
    s"(($bucketExpr) * 2654435761 + 12345) % 2001 - 1000"

  /** Load a trained weight table (bucket, w_milli) into the dense
    * array the scorer broadcasts as a literal. The table is bounded by
    * the model width (≤ tens of KB) — the AnnIndex model-collect
    * discipline, never corpus-sized. Missing buckets weigh 0. */
  def load(weights: DataFrame, buckets: Int = Buckets): Array[Int] = {
    val out = new Array[Int](buckets)
    weights.select("bucket", "w_milli").collect().foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < buckets, s"bucket out of range: $b")
      out(b) = r.getInt(1)
    }
    out
  }
}
