package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpr

/** Multi-dimensional data layout for scan pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet footers carry per-column min/max, and Spark's file source skips
  * row groups whose stats exclude the predicate. A single-column sort only
  * clusters ONE dimension; Z-ordering sorts by the Morton interleave of two
  * keys so files stay narrow in BOTH dimensions and predicates on either
  * column prune.
  *
  * `zorderBy` is a plain range repartition + in-partition sort on the
  * interleaved value — one shuffle, the same cost as any global sort, and
  * the write stays fully distributed.
  */
object Layout {

  /** Morton code of the two keys (low 16 bits each). */
  def zvalue(x: Column, y: Column): Column = ZOrderExpr.zorder16(x, y)

  /** Cluster df for writing: range-partition + sort by the Morton code of
    * (x, y). Each output file then covers a small rectangle of the
    * (x, y) domain instead of a full stripe. */
  def zorderBy(df: DataFrame, x: Column, y: Column,
      numPartitions: Int): DataFrame = {
    val z = zvalue(x, y).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hilbert index of the two keys (low 8 bits each) — consecutive
    * indices are always ADJACENT grid cells (Morton jumps at power-of-two
    * boundaries), so range-sorted files get tighter (x, y) bounding boxes
    * and footer stats prune more. The reason table formats offer Hilbert
    * clustering beside Z-order. */
  def hilbertValue(x: Column, y: Column): Column =
    graft.functions.HilbertExpr.hilbert8(x, y)

  /** [[zorderBy]] with the Hilbert key: range repartition + in-partition
    * sort, one shuffle, fully distributed write. */
  def hilbertBy(df: DataFrame, x: Column, y: Column,
      numPartitions: Int): DataFrame = {
    val h = hilbertValue(x, y).as("__h")
    df.withColumn("__h", h)
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }
}
