package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Portable cardinality sketching.
  *
  * Linear counting: bucket every value into m cells by portable md5 hash,
  * count occupied cells, estimate distinct = -m * ln(1 - occupied/m). All
  * arithmetic is md5 + doubles, so any engine replays the estimate
  * bit-for-bit — unlike Spark's approx_count_distinct (HLL++ with
  * engine-private internals), this sketch is verifiable and mergeable
  * across systems (union corpora = OR the bucket bitmaps).
  *
  * Scale: the shuffle carries at most m distinct bucket ids with map-side
  * partial dedup — O(m) memory regardless of row count. Accuracy needs
  * m on the order of the true cardinality (standard error ~sqrt(m)/n per
  * Whang et al.); saturated sketches (occupied = m) return null.
  */
object Sketches {

  /** One-row DataFrame: (est_distinct rounded to 2, occupied) for `value`
    * over df. */
  def approxDistinct(df: DataFrame, value: Column, m: Int): DataFrame =
    df.select((Hashing.portableHash32(value) % m).as("__b"))
      .agg(countDistinct(col("__b")).as("occupied"))
      .select(
        round(lit(-m.toDouble) * log(lit(1.0) -
          col("occupied").cast("double") / m), 2).as("est_distinct"),
        col("occupied"))

  /** Two-level mergeable distinct count over Spark's Datasketches HLL:
    * one sketch per (group, shard) partial, then a lossless sketch UNION
    * per group — the shape a 100 TB pipeline needs, because partial
    * sketches can be computed per day/partition/file, persisted
    * (BinaryType), and re-unioned later without touching raw rows again.
    * Standard error ~1.04/sqrt(2^lgK) (~1.6% at lgK=12).
    *
    * Output: (group, est_distinct) — estimate is engine-private (unlike
    * [[approxDistinct]]'s replayable linear counting), so gates assert an
    * error bound vs the exact count rather than hash equality. */
  def hllMergedDistinct(df: DataFrame, group: Column, shard: Column,
      value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(group.as("__g"), shard.as("__s"))
      .agg(hll_sketch_agg(value, lgK).as("__sk"))
      .groupBy(col("__g"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), true))
        .as("est_distinct"))
}
