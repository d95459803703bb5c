package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A NATIVE as-of join operator — the (c)-tier extension point of the
  * build plan (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`),
  * used here for the one operator whose semantics no built-in composition
  * plans optimally: [[graft.operators.AsOf.join]] expresses as-of via a
  * tagged-union window (one shuffle of BOTH sides into one sorted pass),
  * whereas this physical operator keeps the sides separate — each child
  * is hash-clustered on its own key and sorted (key, ts), then a single
  * forward merge per partition emits every left row with the most recent
  * right row at-or-before its timestamp.
  *
  * Why this wins at 100 TB: the union-window form materializes
  * left+right rows through ONE window sort with null-padded payload
  * columns from both sides; the merge form sorts each side at its own
  * (narrower) width, streams them against each other with O(1) state
  * (one buffered right row), and preserves the left side's ordering for
  * downstream operators. Semantics match `AsOf.join` exactly: `>=` match
  * (ties match), latest tie-break wins, unmatched lefts keep nulls.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute, rightTie: Attribute)
  extends BinaryNode {
  // the exec compares right-side values with the LEFT side's interpreted
  // orderings, so mismatched types would surface as a ClassCastException
  // deep inside the partition merge — fail at plan construction instead
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join keys must have matching types: left ${leftKey.dataType} " +
      s"vs right ${rightKey.dataType} (cast one side explicitly)")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join timestamps must have matching types: left ${leftTs.dataType} " +
      s"vs right ${rightTs.dataType} (cast one side explicitly)")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute, rightTie: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // each side clusters on its own key; EnsureRequirements makes the two
  // hash partitionings co-compatible (the shuffled-join contract)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // rights additionally sort by the tie-break so "last seen" is the
  // deterministic winner among equal (key, ts) rows
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  // the merge emits lefts in their incoming order — downstream sorts on
  // (key, ts) are already satisfied
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering
  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference[Expression](leftKey, lOut)
    val lTsB = BindReferences.bindReference[Expression](leftTs, lOut)
    val rKeyB = BindReferences.bindReference[Expression](rightKey, rOut)
    val rTsB = BindReferences.bindReference[Expression](rightTs, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind the right side nullable: unmatched lefts read the all-null
      // row, which a non-nullable binding would skip the null check for
      val joiner = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      var rHead: InternalRow = null
      var rDone = false
      var lastMatch: InternalRow = null // copied buffer, O(1) state
      var curKey: Any = null

      def advanceRight(): Unit =
        if (rIter.hasNext) rHead = rIter.next() else { rHead = null; rDone = true }

      // values evaluated off a sort iterator's row alias its REUSED
      // buffer (UTF8String, struct keys); anything retained across an
      // iterator advance must be owned by a copy
      def own(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case other => other // primitives arrive boxed and immutable
      }

      lIter.map { lRow =>
        numOutputRows += 1
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) joiner(joined(lRow, nullRight))
        else {
          if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
            lastMatch = null
            curKey = own(lk)
          }
          var continue = !rDone
          while (continue) {
            if (rHead == null && !rDone) advanceRight()
            if (rHead == null) continue = false
            else {
              val rk = rKeyB.eval(rHead)
              if (rk == null) { rHead = null; advanceRight() }
              else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) { rHead = null; advanceRight() }
                else if (c == 0) {
                  val rt = rTsB.eval(rHead)
                  if (rt == null) { rHead = null; advanceRight() }
                  else if (tsOrd.compare(rt, lt) <= 0) {
                    lastMatch = rHead.copy()
                    rHead = null; advanceRight()
                  } else continue = false
                } else continue = false
              }
            }
          }
          if (lastMatch != null) numMatched += 1
          joiner(joined(lRow, if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
