package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC snapshot compaction: fold a change batch (upserts + deletes) into a
  * base snapshot, latest version per key wins — the periodic-merge job
  * every incrementally-maintained 100 TB table runs.
  *
  * Input contract: base and changes share the payload schema plus
  * `versionCol` (monotone per key) and `opCol` ('u' upsert / 'd' delete);
  * the base snapshot is all-'u' at its snapshot version.
  *
  * Scale shape: one union (no shuffle), one window keyed by the primary
  * key — Spark executes rank-then-filter with WindowGroupLimit map-side
  * pruning, so each key's state is O(1) and the only shuffle partitions by
  * key. No driver state; deletes drop AFTER the rank so a delete only
  * wins when it is genuinely newest. */
object Cdc {

  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String): DataFrame = {
    val all = base.unionByName(changes)
    // tiebreak: on equal versions a delete outranks an upsert ('d' < 'u'
    // ascending), so the merge is deterministic even for degenerate feeds
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol))
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "d")
      .drop("__rn", opCol)
  }
}
