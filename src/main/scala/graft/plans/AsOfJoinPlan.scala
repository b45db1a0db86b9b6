package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, BindReferences, Expression,
  GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** The as-of join as a FIRST-CLASS operator: custom logical node + planner
  * strategy + physical exec, registered through SparkSessionExtensions —
  * rung (c) of the custom-operator ladder (SURVEY §7.3), for the one
  * whole-operator semantic Spark lacks natively.
  *
  * Semantics (identical to [[graft.operators.AsOf.asOfJoin]] and DuckDB's
  * ASOF LEFT JOIN): for every left row, the single right row with the
  * greatest ts <= the left row's ts (`forward = false`) or the smallest
  * ts >= it (`forward = true`) within the same key, optionally no farther
  * than `tolerance` (in the ts type's native unit — micros for timestamps);
  * emitted as a nullable `__match` struct of the right payload.
  *
  * Physical shape: both children hash-clustered on the key and sorted by
  * (key, ts) ASCENDING — the planner's EnsureRequirements inserts the
  * exchanges and sorts — then ONE streamed merge pass per partition in
  * EITHER direction: backward carries the latest at-or-before right row,
  * forward peeks the not-yet-consumed right lookahead. O(1) state per key,
  * no window frames, no union materialization. This is the plan a native
  * engine would run, and what the union-and-carry composition approximates
  * with a window. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    payload: Seq[NamedExpression], matchAttr: AttributeReference,
    forward: Boolean = false, tolerance: Option[Long] = None)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ matchAttr

  override def producedAttributes: AttributeSet = AttributeSet(matchAttr)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. Injected by
  * [[GraftExtensions]] via `injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.payload,
        n.matchAttr, n.forward, n.tolerance,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    payload: Seq[NamedExpression], matchAttr: Attribute,
    forward: Boolean, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchAttr

  override def producedAttributes: AttributeSet = AttributeSet(matchAttr)

  /** Hash-cluster both sides on the key; EnsureRequirements co-partitions
    * the two shuffles (same single-expression key, same partition count). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Sorted by (key, ts) on both sides — the merge walk's contract (both
    * directions walk ascending; forward just defers consumption). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  /** Left rows pass through in place: partitioning and ordering survive,
    * so a downstream aggregation on the key reuses this exchange. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val fwd = forward
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      val lKeyB = BindReferences.bindReference(leftKey, lOut)
      val lTsB = BindReferences.bindReference(leftTs, lOut)
      val rKeyB = BindReferences.bindReference(rightKey, rOut)
      val rTsB = BindReferences.bindReference(rightTs, rOut)
      val payloadProj = UnsafeProjection.create(payload, rOut)
      val resultProj = UnsafeProjection.create(output, output)
      val matchWrapper = new GenericInternalRow(1)
      val joined = new JoinedRow
      // tolerance compares the RAW internal values, which are Long-like for
      // every type a gap is meaningful on (TimestampType = micros since
      // epoch, integer types = themselves)
      def asLong(v: Any): Long = v match {
        case n: java.lang.Number => n.longValue()
        case other => throw new UnsupportedOperationException(
          s"as-of tolerance needs a numeric/timestamp ts, got $other")
      }
      def inTol(lTs: Any, rTs: Any): Boolean = tol match {
        case None => true
        case Some(t) =>
          val gap = if (fwd) asLong(rTs) - asLong(lTs)
            else asLong(lTs) - asLong(rTs)
          gap <= t
      }

      new Iterator[InternalRow] {
        // backward: single candidate — the latest right row at-or-before
        // the current left position for the current key. forward: the
        // lookahead rRow itself IS the candidate. O(1) state either way.
        private var candSet = false
        private var candKey: Any = null
        private var candTs: Any = null
        private var candPayload: InternalRow = null
        private var rRow: InternalRow = null // lookahead (not yet consumed)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyB.eval(l)
          val lTs = lTsB.eval(l)
          if (candSet && (lKey == null ||
              keyOrd.compare(candKey, lKey) != 0)) candSet = false
          var matchRow: InternalRow = null
          if (lKey != null && lTs != null) {
            var advance = true
            while (advance) {
              if (rRow == null) {
                if (rIter.hasNext) rRow = rIter.next() else advance = false
              }
              if (rRow != null) {
                val rKey = rKeyB.eval(rRow)
                val rTs = rTsB.eval(rRow)
                if (rKey == null || rTs == null) rRow = null // unmatched
                else {
                  val c = keyOrd.compare(rKey, lKey)
                  if (c < 0) rRow = null // behind every future left key too
                  else if (!fwd && c == 0 &&
                      tsOrd.compare(rTs, lTs) <= 0) {
                    candSet = true
                    candKey = InternalRow.copyValue(rKey)
                    candTs = InternalRow.copyValue(rTs)
                    candPayload = payloadProj(rRow).copy()
                    rRow = null
                  } else if (fwd && c == 0 &&
                      tsOrd.compare(rTs, lTs) < 0) {
                    rRow = null // strictly before: useless for this and
                                // every later left row of this key
                  } else advance = false // right is at-or-ahead; stop
                }
              }
            }
            if (!fwd) {
              if (candSet && inTol(lTs, candTs)) matchRow = candPayload
            } else if (rRow != null) {
              // peek WITHOUT consuming: the same right row may be the
              // nearest follower of later left rows too
              val rKey = rKeyB.eval(rRow)
              val rTs = rTsB.eval(rRow)
              if (rKey != null && keyOrd.compare(rKey, lKey) == 0 &&
                  rTs != null && inTol(lTs, rTs))
                matchRow = payloadProj(rRow)
            }
          }
          matchWrapper.update(0, matchRow)
          resultProj(joined(l, matchWrapper))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
