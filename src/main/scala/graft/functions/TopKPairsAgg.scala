package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k — the aggregate that makes "keep at most k rows
  * per key" safe at corpus scale.
  *
  * `collect_list` + `array_sort` + `slice` computes the same answer but its
  * aggregation state is the WHOLE group: one million-row domain = one
  * million-element buffer on a single reducer. This Aggregator's state is
  * capped at k (rank, id) pairs at every point of the partial-aggregation
  * tree: `reduce` inserts into a sorted buffer and drops the overflow,
  * `merge` is a sorted-merge truncated at k. Both are associative and
  * commutative with `zero` = empty, so Spark runs it with map-side partial
  * combine — the shuffle carries at most k pairs per (partition, group),
  * never the group itself.
  *
  * Ordering is ascending lexicographic (rank, id); ranks are expected to be
  * portable hashes so the selection is deterministic across engines and
  * partitionings (ties broken by id).
  *
  * Buffer layout is a flat `Array[Long]` `[n, r0, id0, r1, id1, ...]` of
  * fixed capacity 2k+1 — primitive, allocation-free per row, and encoded by
  * Spark as a single binary array value.
  */
final class TopKPairsAgg(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k > 0, "k must be > 0")

  override def zero: Array[Long] = new Array[Long](2 * k + 1) // n = 0

  // ascending (rank, id) comparison of pair p in buf vs (r, id)
  private def lt(br: Long, bi: Long, r: Long, id: Long): Boolean =
    br < r || (br == r && bi < id)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val n = buf(0).toInt
    val (r, id) = in
    if (n == k) {
      // full: reject anything >= current max (the last pair)
      val lr = buf(2 * k - 1); val li = buf(2 * k)
      if (!lt(r, id, lr, li)) return buf
    }
    // binary search for insertion point among n sorted pairs
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(buf(1 + 2 * mid), buf(2 + 2 * mid), r, id)) lo = mid + 1
      else hi = mid
    }
    val keep = math.min(n, k - 1) // pairs retained after position lo
    var i = keep
    while (i > lo) { // shift right, dropping the overflow pair
      buf(1 + 2 * i) = buf(1 + 2 * (i - 1))
      buf(2 + 2 * i) = buf(2 + 2 * (i - 1))
      i -= 1
    }
    buf(1 + 2 * lo) = r
    buf(2 + 2 * lo) = id
    buf(0) = math.min(n + 1, k).toLong
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a(0).toInt; val nb = b(0).toInt
    if (nb == 0) return a
    if (na == 0) return b
    val out = new Array[Long](2 * k + 1)
    var ia = 0; var ib = 0; var n = 0
    while (n < k && (ia < na || ib < nb)) {
      val takeA = ib >= nb || (ia < na &&
        lt(a(1 + 2 * ia), a(2 + 2 * ia), b(1 + 2 * ib), b(2 + 2 * ib)))
      if (takeA) {
        out(1 + 2 * n) = a(1 + 2 * ia); out(2 + 2 * n) = a(2 + 2 * ia)
        ia += 1
      } else {
        out(1 + 2 * n) = b(1 + 2 * ib); out(2 + 2 * n) = b(2 + 2 * ib)
        ib += 1
      }
      n += 1
    }
    out(0) = n.toLong
    out
  }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] = {
    val n = buf(0).toInt
    (0 until n).map(i => (buf(1 + 2 * i), buf(2 + 2 * i)))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKPairsAgg {
  /** Column-API form: `topKPairs(k)(rankCol, idCol)` (two bigint columns —
    * the tuple input encoder flattens to two UDAF arguments); returns
    * `array<struct<_1: bigint, _2: bigint>>` of the k smallest pairs. */
  def topKPairs(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKPairsAgg(k), ExpressionEncoder[(Long, Long)]())
    (rank: Column, id: Column) => fn(rank, id)
  }
}
