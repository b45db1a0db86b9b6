package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Bridge to `Dataset.ofRows`, which is `private[sql]` — the documented way
  * to wrap a custom LogicalPlan (e.g. graft.plans.AsOfJoinNode) into a
  * DataFrame. Lives under org.apache.spark.sql for access; the rest of
  * graft uses only this object. */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
