package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: fill calendar gaps in per-key daily series
  * and carry the last observation forward — the standard warehouse step
  * before charting, drift detection, or joining a sparse metric against a
  * dense one.
  *
  * Shape: one tiny per-key min/max aggregation, a calendar `explode`
  * whose row count IS the output size (never more), a left join of the
  * dense calendar against the observations on (key, date), and one
  * window per key ordered by date for the forward carry. The join and
  * the window share the hash-partitioning on key, and the carry's sort
  * is the per-key series length — output-sized, which is the floor for
  * any forward-fill. Nothing scales with the RAW row count except the
  * initial pre-aggregation the caller does.
  */
object GapFill {

  /** `df` must have one row per (key, date) — pre-aggregate first. Returns
    * one row per key per calendar day in [min(date), max(date)] of that
    * key: `key, date, <value> (forward-filled), is_gap`. The first day of
    * every key is an observation by construction, so the filled value is
    * never null. */
  def fillDaily(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
    val cal = span.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
        .as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    cal.join(df, Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(valueCol),
        col(valueCol).isNull.as("is_gap"))
  }
}
