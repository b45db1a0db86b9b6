package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContainExpr

/** Bloom-filter semi-join pruning — the runtime-filter pattern made
  * explicit as an operator.
  *
  * A semi join `fact WHERE key IN (SELECT key FROM dim WHERE ...)` shuffles
  * the FULL fact table on the key before any dim row can reject anything.
  * At 100 TB the shuffle, not the join, is the bill. The fix every engine
  * converges on: scan the (much smaller) dim side once, build a compact
  * bloom filter over its keys, and filter fact rows in the scan stage —
  * before the exchange — so only plausibly-matching rows are shuffled.
  * Bloom filters have no false negatives, so the result is exactly the
  * semi join; false positives only cost shuffle bytes (fpp-tunable).
  *
  * Driver state is one filter of ~`-n*ln(fpp)/ln(2)^2` bits (≈1.2 MB for
  * 1M keys at 1% fpp) built by a distributed `treeAggregate`
  * (`DataFrameStatFunctions.bloomFilter`) — config-sized, same class as
  * the ANN centroid fetch, never O(rows).
  */
object BloomPrune {

  /** Serialized bloom filter over `dim`'s `keyCol` (BIGINT) values. */
  def buildBloom(dim: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bf = dim.na.drop(Seq(keyCol)).stat.bloomFilter(keyCol,
      expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `fact LEFT SEMI JOIN dim ON factKey = dimKey`, with a bloom prefilter
    * on the fact side so pruned rows never reach the shuffle. Exact —
    * the residual semi join removes any bloom false positives. */
  def prunedSemiJoin(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, expectedItems: Long, fpp: Double = 0.01,
      dimKeyName: String): DataFrame = {
    val bytes = buildBloom(dim, dimKeyName, expectedItems, fpp)
    fact.filter(BloomMightContainExpr.might_contain(factKey, bytes))
      .join(dim, factKey === dimKey, "left_semi")
  }
}
