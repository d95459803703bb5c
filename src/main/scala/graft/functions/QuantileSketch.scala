package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Input row for the sketch: a deterministic 60-bit sample hash `h`
  * (Fragments.sampleHash — first 15 hex chars of md5 over the row key)
  * and the sketched value `v` (an exact integer, e.g. cents). */
case class HV(h: Long, v: Long)

/** Sketch buffer: up to 4k staged (h, v) pairs (`len` live slots — the
  * arrays are preallocated to capacity and mutated in place between
  * compactions, so reduce is O(1) per row, not O(k) array copies), plus
  * the exact running row count, which survives merges so the final row
  * carries n without a second scan. */
case class QsBuf(hs: Array[Long], vs: Array[Long], len: Int, n: Long)

/** Result: the k sample values sorted ascending (the r-th element IS
  * the r/k-quantile estimate) and the exact input row count. */
case class QsResult(sample: Array[Long], n: Long)

/** Mergeable quantile sketch as a typed [[Aggregator]] — completes the
  * sketch algebra next to HLL (q111), KMV (q232), Count-Min (q117) and
  * Misra–Gries (q141): HLL ✓ KMV ✓ CMS ✓ MG ✓ quantiles now ✓.
  *
  * Design: a bottom-k-by-hash uniform sample (the KMV discipline of
  * q232 applied to order statistics). Every row carries a deterministic
  * hash of its KEY; the sketch keeps the k rows with the smallest
  * (h, v) pairs — a uniform random sample whose selection is a pure
  * function of the data, NOT of encounter order. That property is what
  * makes the sketch
  *
  *  - **mergeable**: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  *    bottom-k(B)) — the exact KMV merge law, proved by
  *    QuantileSketchSpec's merge-law test; a persisted sketch composes
  *    with `graft.Compact`-style incremental maintenance;
  *  - **oracle-replayable**: DuckDB reproduces the identical sample
  *    with `ORDER BY h, v LIMIT k` (q257's oracle does exactly that).
  *    A classical KLL sketch is NEITHER — its compaction coin-flips
  *    depend on stream order, the same insertion-order dependence that
  *    made HNSW a documented skip (SCALE.md) — while the bottom-k
  *    sample has the textbook ±O(1/√k) uniform rank-error envelope
  *    (Vitter's reservoir analysis; spec-pinned at 4σ on the fixture).
  *
  * The r-th smallest sample value estimates the r/k quantile; the
  * expected rank error is √(p(1-p)/k) ≈ 0.03 at k=256. State is O(k)
  * per group regardless of input size; reduce amortizes compaction by
  * letting the staging buffer fill to 4k before each O(k log k) cut. */
class QuantileSketchAgg(k: Int)
    extends Aggregator[HV, QsBuf, QsResult] with Serializable {
  require(k >= 1, s"k must be >= 1: $k")
  private val cap = 4 * k

  /** Bottom-`keep` of the first `len` slots by (h, v), returned as a
    * fresh (hs, vs, len) triple sorted by (h, v). */
  private def bottom(hs: Array[Long], vs: Array[Long], len: Int,
                     keep: Int): (Array[Long], Array[Long], Int) = {
    val idx = Array.range(0, len).sortBy(i => (hs(i), vs(i)))
    val m = math.min(keep, len)
    val oh = new Array[Long](cap); val ov = new Array[Long](cap)
    var i = 0
    while (i < m) { oh(i) = hs(idx(i)); ov(i) = vs(idx(i)); i += 1 }
    (oh, ov, m)
  }

  override def zero: QsBuf =
    QsBuf(new Array[Long](cap), new Array[Long](cap), 0, 0L)

  override def reduce(b: QsBuf, a: HV): QsBuf = {
    // in-place append into the preallocated slots; the previous QsBuf
    // shell is dead after this call, so sharing the arrays is safe
    if (b.len < cap) {
      b.hs(b.len) = a.h; b.vs(b.len) = a.v
      QsBuf(b.hs, b.vs, b.len + 1, b.n + 1)
    } else {
      val (oh, ov, m) = bottom(b.hs, b.vs, b.len, k)
      oh(m) = a.h; ov(m) = a.v
      QsBuf(oh, ov, m + 1, b.n + 1)
    }
  }

  override def merge(x: QsBuf, y: QsBuf): QsBuf = {
    val hs = new Array[Long](x.len + y.len)
    val vs = new Array[Long](x.len + y.len)
    System.arraycopy(x.hs, 0, hs, 0, x.len)
    System.arraycopy(y.hs, 0, hs, x.len, y.len)
    System.arraycopy(x.vs, 0, vs, 0, x.len)
    System.arraycopy(y.vs, 0, vs, x.len, y.len)
    val (oh, ov, m) = bottom(hs, vs, hs.length, k)
    QsBuf(oh, ov, m, x.n + y.n)
  }

  override def finish(b: QsBuf): QsResult = {
    val (_, ov, m) = bottom(b.hs, b.vs, b.len, k)
    QsResult(ov.take(m).sorted, b.n)
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[QsBuf] =
    org.apache.spark.sql.Encoders.product[QsBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[QsResult] =
    org.apache.spark.sql.Encoders.product[QsResult]
}
