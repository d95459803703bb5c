package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite a PURE range-predicate inner join
  * (`p BETWEEN lo AND hi`, no equi keys) into the bucketized equi-join
  * of [[graft.operators.RangeJoin]] — automatically, for any user query.
  *
  * Without the rule, Spark plans such joins as BroadcastNestedLoopJoin /
  * CartesianProduct: O(|points|·|intervals|). The rewrite bins both
  * sides by `spark.graft.rangeJoin.binWidth` (a long, in the column's
  * units; 0/unset disables the rule), joins on the bin, and keeps the
  * original range predicate as a residual. A point lands in one bin and
  * an interval replicates to every bin it overlaps, so every qualifying
  * pair meets exactly once — same rows, hash-join cost.
  *
  * This is the (c)-tier extension point of the build plan (custom
  * `Rule[LogicalPlan]` via `SparkSessionExtensions` /
  * `spark.experimental.extraOptimizations`) — used where expression- or
  * operator-composition can't change the JOIN STRATEGY itself.
  *
  * Scope guards: inner joins, integral-typed bounds, the condition is
  * exactly the two range conjuncts (an equi+range join already
  * hash-joins on its equi keys), batch plans only. Binning uses
  * truncating division, which is monotone — `lo ≤ p ≤ hi` implies
  * `bin(lo) ≤ bin(p) ≤ bin(hi)` for any sign — so coverage is exact.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def bin(e: Expression, w: Long): Expression =
    IntegralDivide(toLong(e), Literal(w))

  /** e as "point ≥ bound": covers `p >= lo` and `lo <= p`. */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case LessThanOrEqual(lo, p)    => Some((p, lo))
    case _                         => None
  }

  /** e as "point ≤ bound": covers `p <= hi` and `hi >= p`. */
  private def upperBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(p, hi)    => Some((p, hi))
    case GreaterThanOrEqual(hi, p) => Some((p, hi))
    case _                         => None
  }

  /** Match (point, lo, hi) out of the two conjuncts, either order. */
  private def rangeShape(a: Expression, b: Expression): Option[(Expression, Expression, Expression)] =
    (for ((p1, lo) <- lowerBound(a); (p2, hi) <- upperBound(b)
          if p1.semanticEquals(p2)) yield (p1, lo, hi)).orElse(
      for ((p1, lo) <- lowerBound(b); (p2, hi) <- upperBound(a)
           if p1.semanticEquals(p2)) yield (p1, lo, hi))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinWidthKey, "0").toLong
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), hint)
          if !j.isStreaming =>
        rangeShape(c1, c2) match {
          case Some((p, lo, hi))
              if integral(p) && integral(lo) && integral(hi) &&
                p.references.subsetOf(left.outputSet) &&
                lo.references.subsetOf(right.outputSet) &&
                hi.references.subsetOf(right.outputSet) =>
            rewrite(j, left, right, p, lo, hi, w, hint, swapped = false)
          case Some((p, lo, hi))
              if integral(p) && integral(lo) && integral(hi) &&
                p.references.subsetOf(right.outputSet) &&
                lo.references.subsetOf(left.outputSet) &&
                hi.references.subsetOf(left.outputSet) =>
            rewrite(j, right, left, p, lo, hi, w, hint, swapped = true)
          case _ => j
        }
    }
  }

  private def rewrite(j: Join, pointSide: LogicalPlan, intervalSide: LogicalPlan,
                      p: Expression, lo: Expression, hi: Expression,
                      w: Long, hint: JoinHint, swapped: Boolean): LogicalPlan = {
    val pBin = Alias(bin(p, w), "__graft_bin_p")()
    val points = Project(pointSide.output :+ pBin, pointSide)

    // Sequence(start > stop) throws; such intervals can't match anyway
    val nonEmpty = Filter(LessThanOrEqual(lo, hi), intervalSide)
    val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    val intervals = Generate(
      Explode(Sequence(bin(lo, w), bin(hi, w), None, Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binAttr), child = nonEmpty)

    val cond = And(EqualTo(pBin.toAttribute, binAttr), j.condition.get)
    val joined =
      if (swapped) Join(intervals, points, Inner, Some(cond), hint)
      else Join(points, intervals, Inner, Some(cond), hint)
    Project(j.output, joined)
  }
}
