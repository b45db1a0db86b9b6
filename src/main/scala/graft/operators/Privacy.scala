package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy risk screening for training-data release — the governance
  * counterpart of the PII scrub (t5): before a corpus (or its metadata)
  * ships, measure how identifiable its rows are. k-anonymity (Sweeney
  * 2002): every quasi-identifier combination must be shared by >= k rows.
  * l-diversity (Machanavelli et al. 2007): within each such group the
  * sensitive attribute must take >= l distinct values, or the group leaks
  * the sensitive value even at size k.
  *
  * Shape: ONE hash aggregation over the quasi-identifier key computes
  * both group size and per-group sensitive diversity (a distinct-agg the
  * engine plans as the standard two-phase expand), then a result-sized
  * roll-up to the report row. Nothing downstream of the first shuffle
  * depends on data size — the 100 TB cost is one groupBy.
  */
object Privacy {

  /** One-row report: total groups, smallest group, groups/rows below the
    * k floor, and the minimum sensitive-value diversity over all groups.
    * Empty inputs report zeros (vacuously anonymous), not nulls. */
  def kAnonymityReport(df: DataFrame, qis: Seq[Column], sensitive: Column,
      k: Int): DataFrame = {
    require(qis.nonEmpty && k >= 1)
    val groups = df.groupBy(qis: _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(sensitive).as("__l"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      coalesce(min(col("__n")), lit(0L)).as("min_group"),
      coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
        .as("groups_at_risk"),
      coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
        lit(0L)).as("rows_at_risk"),
      coalesce(min(col("__l")), lit(0L)).as("min_l"))
      .select(lit(k).as("k"), col("n_groups"), col("min_group"),
        col("groups_at_risk"), col("rows_at_risk"), col("min_l"))
  }
}
