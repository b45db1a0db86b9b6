package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join without a theta-join.
  *
  * Spark plans a join whose only condition is `v >= lo AND v < hi` as
  * BroadcastNestedLoopJoin (or worse, a cartesian product) — O(|probe| *
  * |intervals|) comparisons, a scale killer the moment the interval side
  * stops being tiny. The standard fix (used by every warehouse engine's
  * range-join optimization) is binning: quantize the value domain into
  * fixed-width bins, explode each interval to the bins it covers, map each
  * probe row to its single bin, equi-join on the bin id, and re-apply the
  * exact range predicate as a residual filter.
  *
  * Scale properties:
  *   - The join is a plain hash equi-join on the bin id: broadcastable when
  *     the exploded interval side is small, shuffle-partitionable on the bin
  *     key when it is not. Never a nested loop.
  *   - Expansion cost is |intervals| * (avgSpan/binWidth + 1) rows — pick
  *     binWidth near the median interval span so each interval explodes to
  *     O(1) bins while each bin matches O(1) intervals.
  *   - Overlapping intervals are handled naturally (a probe row joins every
  *     interval whose bin list contains its bin and whose residual predicate
  *     passes); skewed bins can further be salted with [[Skew]] if one bin
  *     dominates.
  *
  * The reference engine (kulalexey/XmlStreamProcessor) has no join at all;
  * this is part of the §2.2 relational surface built beyond it.
  */
object RangeJoin {

  /** Join `probe` to `intervals` on `loCol <= valueCol < hiCol`.
    *
    * @param binWidth            bin size in value units (> 0)
    * @param broadcastIntervals  broadcast the exploded interval side (right
    *                            for config/dimension-sized interval tables);
    *                            set false to shuffle both sides on the bin id
    */
  def binned(probe: DataFrame, valueCol: Column, intervals: DataFrame,
      loCol: Column, hiCol: Column, binWidth: Double,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(floor(loCol / binWidth).cast("long"),
        floor(hiCol / binWidth).cast("long"))))
    val side =
      if (broadcastIntervals) broadcast(binnedIntervals) else binnedIntervals
    probe.withColumn("__bin", floor(valueCol / binWidth).cast("long"))
      .join(side, Seq("__bin"))
      .filter(valueCol >= loCol && valueCol < hiCol)
      .drop("__bin")
  }
}
