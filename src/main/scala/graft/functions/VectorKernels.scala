package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Vector kernels for similarity search over array<double> embeddings.
  * Same left-to-right accumulation order as the `aggregate`/`zip_with`
  * folds they replace (bit-identical results, oracle parity preserved);
  * ~10× faster because higher-order-function lambdas are interpreted
  * while these run as one static call inside whole-stage codegen. */
object CosineKernel {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object DotKernel {
  /** Plain dot product (left-to-right accumulation — matches both the
    * `aggregate`/`zip_with` fold and typical SQL `list_dot_product`
    * implementations up to float associativity). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }
}

object NearestCellKernel {
  /** Argmax-cosine cell assignment in one pass: semantics IDENTICAL to
    * ranking `round(cosine(v, c_i), 6)` descending with ties broken by
    * the smallest cell id (the formulation the q50 oracle replays) —
    * rounding uses the same HALF_UP decimal rule as Spark's `round`,
    * NaN similarities (zero vectors) are never selected unless every
    * cell is NaN. One kernel call replaces nlist separate cosine
    * expressions + an array_min over structs. */
  def compute(v: ArrayData, cells: Array[Long], centroids: Array[Array[Double]]): Long = {
    val n = v.numElements()
    var bestCell = cells(0)
    var bestSim = Double.NaN
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val m = math.min(n, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = v.getDouble(i); val y = cv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (!sim.isNaN) {
        // valueOf (not the exact-binary constructor) matches Spark's
        // Round, which goes through the decimal string representation
        val r = java.math.BigDecimal.valueOf(sim)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (bestSim.isNaN || r > bestSim ||
          (r == bestSim && cells(c) < bestCell)) {
          bestSim = r
          bestCell = cells(c)
        }
      }
      c += 1
    }
    bestCell
  }
}

object SrpKernel {
  /** Sign-random-projection bucket: bit i = sign of Σ_j ±v_j where the
    * sign is the parity of xxhash64(i+offset, j) — the exact chained-hash
    * semantics of `functions.xxhash64(lit(i+offset), j)` (seed 42, fold
    * left), so buckets match the column-level formulation. */
  def compute(v: ArrayData, bits: Int, offset: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < bits) {
      val planeSeed = XXH64.hashInt(i + offset, 42L)
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = v.getDouble(j)
        if ((XXH64.hashInt(j, planeSeed) & 1L) == 1L) dot += x else dot -= x
        j += 1
      }
      if (dot > 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }
}

/** (array<double>, array<double>) → double cosine similarity. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName,
    GraftTypeCheck.isDoubleArray(left.dataType) && GraftTypeCheck.isDoubleArray(right.dataType),
    "ARRAY<DOUBLE>, ARRAY<DOUBLE>", left.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineKernel.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** (array<double>, array<double>) → double dot product. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName,
    GraftTypeCheck.isDoubleArray(left.dataType) && GraftTypeCheck.isDoubleArray(right.dataType),
    "ARRAY<DOUBLE>, ARRAY<DOUBLE>", left.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotKernel.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** array<double> → long SRP bucket key of `bits` bits. */
case class SrpBucketExpr(child: Expression, bits: Int, offset: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName, GraftTypeCheck.isDoubleArray(child.dataType), "ARRAY<DOUBLE>", child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"
  override protected def nullSafeEval(v: Any): Any =
    SrpKernel.compute(v.asInstanceOf[ArrayData], bits, offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpKernel.compute($c, $bits, $offset)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<double> → long id of the nearest centroid (see
  * [[NearestCellKernel]]). Centroids ride inside the expression as
  * plain arrays — broadcast-as-literal, evaluated in one call. */
case class NearestCellExpr(child: Expression, cells: Array[Long],
                           centroids: Array[Array[Double]]) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(cells.length == centroids.length && cells.nonEmpty)
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName, GraftTypeCheck.isDoubleArray(child.dataType), "ARRAY<DOUBLE>", child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell"
  override protected def nullSafeEval(v: Any): Any =
    NearestCellKernel.compute(v.asInstanceOf[ArrayData], cells, centroids)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqKernel {
  private def round6(d: Double): Double =
    // valueOf (decimal-string repr) matches Spark's Round semantics;
    // the exact-binary BigDecimal constructor does NOT
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Squared L2 between block `b` of `v` and block `b` of centroid `cv`,
    * accumulated left-to-right over the block dims — the order an
    * explicit `(x1-c1)*(x1-c1) + … + (xs-cs)*(xs-cs)` SQL chain uses, so
    * an external engine replays it bit-for-bit. */
  private def blockDist(v: ArrayData, cv: Array[Double], b: Int, sub: Int): Double = {
    var d = 0.0
    var i = 0
    while (i < sub) {
      val x = v.getDouble(b * sub + i) - cv(b * sub + i)
      d += x * x
      i += 1
    }
    d
  }

  /** Product-quantization encode: for each of `m` equal blocks, the ID of
    * the codebook vector whose block is nearest in rounded (6 dp) squared
    * L2, ties to the smallest id. Codebook rides inside the expression
    * (broadcast-as-literal) — pure map-side, no join, no shuffle. */
  def encode(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]], m: Int): ArrayData = {
    val dim = v.numElements()
    val sub = dim / m
    val out = new Array[Long](m)
    var b = 0
    while (b < m) {
      var bestId = 0L
      var bestD = Double.NaN
      var c = 0
      while (c < cents.length) {
        val r = round6(blockDist(v, cents(c), b, sub))
        if (bestD.isNaN || r < bestD || (r == bestD && ids(c) < bestId)) {
          bestD = r; bestId = ids(c)
        }
        c += 1
      }
      out(b) = bestId
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Asymmetric-distance computation: Σ over blocks of the rounded (6 dp)
    * squared L2 between the query block and the centroid block the code
    * points at — blocks accumulate in ascending order (left-assoc `+`
    * chain in SQL). */
  def adc(q: ArrayData, codes: ArrayData, ids: Array[Long],
          cents: Array[Array[Double]], m: Int): Double = {
    val sub = q.numElements() / m
    var s = 0.0
    var b = 0
    while (b < m) {
      val code = codes.getLong(b)
      var c = 0
      var idx = -1
      while (idx < 0 && c < ids.length) {
        if (ids(c) == code) idx = c
        c += 1
      }
      require(idx >= 0,
        s"unknown PQ code $code in block $b: codes were encoded with a " +
          "different codebook than the one passed to pq_adc")
      s += round6(blockDist(q, cents(idx), b, sub))
      b += 1
    }
    s
  }
}

/** array<double> → array<long> of per-block nearest codebook-vector ids
  * (see [[PqKernel.encode]]). */
case class PqEncodeExpr(child: Expression, ids: Array[Long],
                        cents: Array[Array[Double]], m: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(ids.length == cents.length && ids.nonEmpty)
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName, GraftTypeCheck.isDoubleArray(child.dataType), "ARRAY<DOUBLE>", child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], ids, cents, m)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<double> query, array<long> codes) → double approximate squared
  * L2 (see [[PqKernel.adc]]). */
case class PqAdcExpr(left: Expression, right: Expression, ids: Array[Long],
                     cents: Array[Array[Double]], m: Int) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(ids.length == cents.length && ids.nonEmpty)
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.expect(
    prettyName,
    GraftTypeCheck.isDoubleArray(left.dataType) &&
      right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType == LongType,
    "(ARRAY<DOUBLE>, ARRAY<BIGINT>)", left.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqKernel.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ids, cents, m)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  def srpBucket(v: Column, bits: Int, offset: Int): Column =
    GraftBridge.column(SrpBucketExpr(GraftBridge.expression(v), bits, offset))
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  def nearestCell(v: Column, cells: Array[Long], centroids: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCellExpr(GraftBridge.expression(v), cells, centroids))
  def pqEncode(v: Column, ids: Array[Long], cents: Array[Array[Double]], m: Int): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(v), ids, cents, m))
  def pqAdc(q: Column, codes: Column, ids: Array[Long],
            cents: Array[Array[Double]], m: Int): Column =
    GraftBridge.column(PqAdcExpr(GraftBridge.expression(q), GraftBridge.expression(codes), ids, cents, m))
}
