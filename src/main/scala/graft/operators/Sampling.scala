package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic dataset splitting for training pipelines.
  *
  * Assignment is a pure function of the row's key (portable md5 hash mod
  * 100), so it is reproducible in any engine, independent of partitioning
  * and row order, and STABLE UNDER CORPUS GROWTH: a document keeps its
  * split forever, no matter what is added or removed around it — the
  * property random sampling and `randomSplit` lack, and the one that
  * prevents train/test contamination across corpus versions.
  *
  * Scale: one codegen'd hash per row, no shuffle, no state.
  */
object Sampling {

  /** GPT-style sequence-packing layout: documents concatenated in a stable
    * order and chunked into `capacity`-token windows. Emits each doc's
    * global token offset, its pack (context window) id, and whether it
    * straddles a window boundary — the bookkeeping a pretraining data
    * loader needs. One window-function pass (running sum over the order
    * key); fully deterministic and engine-portable.
    *
    * Scale: a single global ordering is a one-partition window at the
    * extreme; shard first (e.g. by [[hashSplit]] or date) and pack within
    * shards, exactly as distributed tokenizer pipelines do. */
  def packingLayout(df: DataFrame, orderKey: Column, nTokens: Column,
      capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderKey)
    df.withColumn("__n", nTokens)
      .withColumn("start_offset",
        coalesce(sum(col("__n")).over(
          w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("pack_id", expr(s"start_offset div $capacity"))
      .withColumn("spans_boundary",
        expr(s"(start_offset + __n - 1) div $capacity") > col("pack_id"))
      .drop("__n")
  }

  /** Add a `split` column ("train" / "val" / "test") by hash percent:
    * [0, trainPct) -> train, [trainPct, trainPct+valPct) -> val, rest test.
    */
  def hashSplit(df: DataFrame, key: Column, trainPct: Int,
      valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be within [0, 100]")
    val bucket = Hashing.portableHash32(key) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
