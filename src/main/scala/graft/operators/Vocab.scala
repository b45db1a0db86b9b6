package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction: dense, sorted, deterministic token ids — the
  * tokenizer-building step of a training-data pipeline (token -> id maps
  * must be contiguous 0..V-1 for embedding tables).
  *
  * The naive `row_number() OVER (ORDER BY token)` is a single-partition
  * window — the exact scale killer t8 eliminated for sequence packing. Same
  * cure here, two phases:
  *   1. range-partition + sort the distinct tokens (one shuffle — the same
  *      cost as any global sort) and materialize the partitioning to a
  *      scratch parquet round-trip (a RELIABLE materialization: unlike
  *      localCheckpoint, a lost executor re-reads the files instead of
  *      killing the lineage — the production-safe form);
  *   2. fetch per-partition COUNTS (numPartitions integers — config-sized,
  *      never rows), prefix-sum them on the driver, and add the partition's
  *      offset to a per-partition row number (a window PARTITIONed on the
  *      partition id, so every partition numbers its slice in parallel).
  *      The offset lookup is a constant array literal indexed by the
  *      partition id — O(1) per row and codegen-friendly at any partition
  *      count, never an O(numPartitions)-deep conditional chain.
  *
  * Ids are reproducible run-to-run: they depend only on the sorted token
  * order, not on partitioning or scheduling.
  */
object Vocab {

  /** (token, id) with ids dense in [0, V), ordered by token. */
  def contiguousIds(tokens: DataFrame, tokenCol: Column,
      numPartitions: Int): DataFrame = {
    // one materialization: the counts job and the numbering job must see
    // the SAME range boundaries (RangePartitioner samples its input) —
    // __pid is stamped as a COLUMN before the cut, so the two downstream
    // jobs agree regardless of how the staged bytes re-split
    val sorted = graft.Tables.stage(
      tokens.select(tokenCol.as("token"))
        .na.drop(Seq("token")).distinct()
        .repartitionByRange(numPartitions, col("token"))
        .sortWithinPartitions(col("token"))
        .withColumn("__pid", spark_partition_id()),
      "graft-vocab")
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 until numPartitions)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
      .take(numPartitions)
    // element_at is 1-based; __pid is 0-based
    val offsetExpr =
      element_at(typedLit(offsets), col("__pid").cast("int") + 1)
    sorted
      .withColumn("id", offsetExpr +
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(col("token"))) - 1)
      .select(col("token"), col("id"))
  }

  /** Encode a token column to its vocab id by joining against the vocab
    * (shuffle equi-join on the token — broadcastable when the vocab is
    * small enough). */
  def encode(tokens: DataFrame, tokenCol: Column,
      vocab: DataFrame): DataFrame =
    tokens.join(vocab, tokenCol === vocab("token")).drop("token")
}
