package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key of two table versions as added /
  * removed / changed / unchanged in ONE pass: a single full outer join on
  * the key, with value comparison as a null-safe struct equality (no row
  * hashing, so the comparison is type-exact and oracle-replayable).
  *
  * This is the audit primitive behind incremental pipelines: "what did
  * yesterday's load actually change?" run table-vs-table at 100 TB. The
  * join shuffles both sides once on the key — the minimum possible for an
  * exact diff; at scale both snapshots of the same table are typically
  * written with the same bucketing/partitioning, which turns the exchange
  * into a co-located merge (see [[Bucketing]]). The reference is a
  * single-snapshot parser (Parser.cs:119-208); diffing successive parses
  * is how its users detect feed changes, here as one relational operator.
  */
object Diff {

  /** Diff `v2` (new) against `v1` (old) on `key`; `valueCols` are the
    * compared payload columns (both sides must have them). Output: key,
    * `change_type` ∈ added|removed|changed|unchanged, and the old/new
    * payload columns prefixed `old_`/`new_`. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, key: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    // presence markers, not key nullness, drive the classification: a
    // NULL-key row never joins (SQL equality), so keying the change type
    // off __k1/__k2 nullness would label v1's null-key row "added". With
    // markers it correctly reads "removed" / "added" per side (null keys
    // are never treated as the same entity — document, don't guess).
    val left = v1.select(col(key).as("__k1"), lit(1).as("__p1"),
      struct(valueCols.map(col): _*).as("__v1"))
    val right = v2.select(col(key).as("__k2"), lit(1).as("__p2"),
      struct(valueCols.map(col): _*).as("__v2"))
    val joined = left.join(right, col("__k1") === col("__k2"), "full_outer")
    val changeType = when(col("__p1").isNull, "added")
      .when(col("__p2").isNull, "removed")
      .when(!(col("__v1") <=> col("__v2")), "changed")
      .otherwise("unchanged")
    val olds = valueCols.map(c => col(s"__v1.$c").as(s"old_$c"))
    val news = valueCols.map(c => col(s"__v2.$c").as(s"new_$c"))
    joined.select(
      (coalesce(col("__k1"), col("__k2")).as(key) +:
        changeType.as("change_type") +: (olds ++ news)): _*)
  }

  /** Aggregate a diff into its audit summary: one row per change_type with
    * the key count and a key checksum (sum of keys — order-independent,
    * oracle-replayable). */
  def diffSummary(diff: DataFrame, key: String): DataFrame =
    diff.groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"), sum(col(key)).as("key_sum"))
      .orderBy(col("change_type"))
}
