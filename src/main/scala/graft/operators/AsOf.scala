package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic operator Spark lacks natively:
  * for every left row, the single right row with the greatest timestamp
  * <= the left timestamp, per key.
  *
  * Implementation is the union-and-carry pattern (composition of built-ins,
  * preference (a) of the custom-operator ladder): tag both sides, union,
  * and carry the last right payload forward with a running `last(...,
  * ignoreNulls)` window ordered by (ts, side) — right rows sort before left
  * rows at equal timestamps, so ties match ("at-or-before").
  *
  * Scale: ONE shuffle on the join key (the union is shuffled once for the
  * window), versus the naive range-join's key x key explosion. State per
  * key is a single carried struct — this is also exactly how the streaming
  * variant would hold state.
  */
object AsOf {

  /** `left`/`right` must share `key` and `ts` column names given here; the
    * right payload arrives as a `__match` struct column (null when no right
    * row precedes the left row). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String]): DataFrame = {
    val rTagged = right
      .select(col(key), col(ts),
        struct(rightPayload.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val lSlim = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(rTagged.schema("__p").dataType))
    val unioned = lSlim.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__p")
  }

  /** The FIRST-CLASS form: same semantics and output shape as [[asOfJoin]],
    * executed by the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]] — streamed merge over co-partitioned
    * sorted children, O(1) state, no window frames). Requires a session
    * with [[graft.plans.GraftExtensions]] registered (the planner strategy
    * lives there). */
  def asOfJoinExec(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{StructField, StructType}
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
      attr(rPlan, "__rkey"), attr(rPlan, "__rts"), payload, matchAttr)
    org.apache.spark.sql.graft.DatasetBridge.ofRows(sp, node)
  }
}
