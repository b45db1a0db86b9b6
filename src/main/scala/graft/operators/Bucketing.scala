package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support for exchange-free ("co-located") joins.
  *
  * Writing both sides of a recurring join bucketed (and sorted) on the join
  * key means every subsequent join between them is a zero-shuffle sort-merge
  * join: each task reads matching buckets from both tables. At 100 TB this
  * converts the nightly fact-fact join from a full-cluster shuffle into a
  * local merge per bucket — the single biggest recurring-shuffle saving
  * available to a pipeline that owns its storage layout.
  *
  * Bucket count guidance: (table size / target partition size), rounded to a
  * power of two shared by both join sides (equal counts, or one a multiple
  * of the other).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key — planner emits a
    * sort-merge join with NO Exchange on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
