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
}
