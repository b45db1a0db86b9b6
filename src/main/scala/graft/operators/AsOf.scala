package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic operator Spark lacks natively:
  * for every left row, the single closest right row per key — the greatest
  * right timestamp <= the left timestamp (`backward`, the default) or the
  * smallest right timestamp >= it (`forward`) — optionally within a maximum
  * gap (`tolerance`).
  *
  * Implementation is the union-and-carry pattern (composition of built-ins,
  * preference (a) of the custom-operator ladder): tag both sides, union,
  * and carry the nearest right payload across with a running
  * `last(..., ignoreNulls)` (backward) or `first(..., ignoreNulls)`
  * (forward) window ordered by (ts, side) — the side tag makes right rows
  * at equal timestamps visible to the left row's frame, so ties match
  * ("at-or-before" / "at-or-after").
  *
  * Scale: ONE shuffle on the join key (the union is shuffled once for the
  * window), versus the naive range-join's key x key explosion. State per
  * key is a single carried struct — this is also exactly how the streaming
  * variant would hold state.
  */
object AsOf {

  /** `left`/`right` must share `key` and `ts` column names given here; the
    * right payload arrives as a `__match` struct column (null when no right
    * row qualifies).
    *
    * @param direction `"backward"` (greatest right ts <= left ts — the
    *   default, DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`) or `"forward"`
    *   (smallest right ts >= left ts).
    * @param tolerance optional maximum gap between the left ts and the
    *   matched right ts, as a Column comparable to `ts - ts` (an INTERVAL
    *   literal for timestamp columns, a number for numeric ones); matches
    *   farther away resolve to null, exactly like pandas `merge_asof`'s
    *   tolerance. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String], direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    // carry the right ts inside the payload struct so the tolerance check
    // can see how far the matched row actually is. Right rows with a null
    // key or ts can never satisfy "greatest ts <= / smallest ts >=" — drop
    // them up front so the window cannot carry one (matches the exec form
    // and DuckDB ASOF, where a null never orders against anything)
    val rTagged = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts),
        struct((col(ts).as("__mts") +: rightPayload.map(col)): _*)
          .as("__p"))
      // backward: right sorts BEFORE left at equal ts (inside the
      // trailing frame); forward: right sorts AFTER left (inside the
      // leading frame) — both make equal-ts rows match
      .withColumn("__side", lit(if (backward) 0 else 2))
    val lSlim = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(rTagged.schema("__p").dataType))
    val unioned = lSlim.unionByName(rTagged, allowMissingColumns = true)
    val ordered = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
    val matched =
      if (backward)
        last(col("__p"), ignoreNulls = true).over(ordered.rowsBetween(
          Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__p"), ignoreNulls = true).over(ordered.rowsBetween(
          Window.currentRow, Window.unboundedFollowing))
    val gapOk = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        // the nearest row is the ONLY candidate that can be in tolerance:
        // anything farther in scan order is farther in time too
        if (backward) col(ts) - matched.getField("__mts") <= tol
        else matched.getField("__mts") - col(ts) <= tol
    }
    val stripped = struct(
      rightPayload.map(n => matched.getField(n).as(n)): _*)
    unioned
      // a left row with a null key or ts has no order position either —
      // null match, same as the exec (without the guard, a FORWARD join
      // would let a nulls-first left row see every real right row in its
      // leading frame)
      .withColumn("__match",
        when(col(key).isNotNull && col(ts).isNotNull &&
          matched.isNotNull && gapOk, stripped))
      .filter(col("__side") === 1)
      .drop("__side", "__p")
  }

  /** The FIRST-CLASS form: same semantics and output shape as [[asOfJoin]],
    * executed by the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]] — streamed merge over co-partitioned
    * sorted children, O(1) state, no window frames). Requires a session
    * with [[graft.plans.GraftExtensions]] registered (the planner strategy
    * lives there).
    *
    * @param direction `"backward"` or `"forward"` as in [[asOfJoin]].
    * @param tolerance optional maximum gap in the ts column's NATIVE unit —
    *   microseconds for TimestampType (Spark's internal representation),
    *   the column's own unit for integer columns. */
  def asOfJoinExec(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightPayload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{StructField, StructType}
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val sp = left.sparkSession
    // alias the right side's columns: fresh exprIds keep a self-join's
    // children attribute-disjoint (the analyzer's DeduplicateRelations
    // does not descend into a custom node)
    val rPrep = right.select(
      (col(key).as("__rkey") +: col(ts).as("__rts") +:
        rightPayload.map(n => col(n).as(n))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rPrep.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val payload = rightPayload.map(n => attr(rPlan, n))
    val matchAttr = AttributeReference("__match",
      StructType(payload.map(a => StructField(a.name, a.dataType,
        a.nullable))), nullable = true)()
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts),
      attr(rPlan, "__rkey"), attr(rPlan, "__rts"), payload, matchAttr,
      forward = direction == "forward", tolerance = tolerance)
    org.apache.spark.sql.graft.DatasetBridge.ofRows(sp, node)
  }
}
