package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality screen a pipeline runs
  * before committing 100 TB to a training mix: per column, row count,
  * null count, exact distinct count, min/max.
  *
  * All columns profile in a SINGLE aggregation: Spark plans the multiple
  * `count(DISTINCT ...)`s with one Expand (row multiplication map-side,
  * one shuffle total) rather than one job per column; min/max/counts ride
  * the same pass. Output is long-format via `stack`, one row per column.
  *
  * For a quick estimate-only profile at petabyte scale, swap the exact
  * distinct for [[Sketches.hllMergedDistinct]] partials; the exact form is
  * what the oracle can replay. */
object Profile {

  /** Profile numeric columns: (col_name, n, n_nulls, n_distinct, min_v,
    * max_v) with min/max cast to double. */
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n, n_nulls, n_distinct, min_v, max_v)"))
  }
}
