package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded WEIGHTED k-minimum-values aggregate — the state of a TUPLE
  * (weighted theta) sketch: [[BottomKDistinctAgg]]'s k smallest distinct
  * hashes, each carrying the Σweight of its arrivals (the additive
  * "summary" of the Datasketches tuple-sketch design, re-expressed as a
  * portable integer state).
  *
  * State is a flat `Array[Long]` `[n, h0..h_{k-1}, w0..w_{k-1}]` of
  * fixed capacity 2k+1, hashes sorted ascending, weights parallel —
  * capped at k at EVERY point of the partial-aggregation tree (reduce =
  * dedup binary-search insert that SUMS the weight on a duplicate hash,
  * merge = sorted merge summing shared hashes' weights, truncated at k),
  * associative and commutative with zero = empty.
  *
  * Weight fidelity argument (why eviction may discard a slot's weight):
  * a hash in the FINAL bottom-k has global distinct-rank ≤ k, so fewer
  * than k distinct hashes are below it in EVERY partial buffer — it is
  * never evicted anywhere, and every arrival's weight lands in a buffer
  * that survives to the merge root. A hash that IS evicted somewhere has
  * ≥ k smaller hashes in that buffer alone, so the merged result drops
  * it before the final state regardless of its (now partial) weight. */
final class WeightedBottomKAgg(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k > 0, "k must be > 0")

  override def zero: Array[Long] = new Array[Long](2 * k + 1) // n = 0

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val v = in._1
    val w = in._2
    val n = buf(0).toInt
    // full and strictly above the max: cannot enter, cannot be a dup
    if (n == k && v > buf(k)) return buf
    // binary search over the n sorted hashes at buf(1..n)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(1 + mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(1 + lo) == v) { // duplicate: sum the weight
      buf(1 + k + lo) = Math.addExact(buf(1 + k + lo), w)
      return buf
    }
    val keep = math.min(n, k - 1) // full: evict the largest slot
    var i = keep
    while (i > lo) {
      buf(1 + i) = buf(i)
      buf(1 + k + i) = buf(k + i)
      i -= 1
    }
    buf(1 + lo) = v
    buf(1 + k + lo) = w
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
      if (ib >= nb || (ia < na && a(1 + ia) < b(1 + ib))) {
        out(1 + n) = a(1 + ia); out(1 + k + n) = a(1 + k + ia); ia += 1
      } else if (ia >= na || a(1 + ia) > b(1 + ib)) {
        out(1 + n) = b(1 + ib); out(1 + k + n) = b(1 + k + ib); ib += 1
      } else { // shared hash: one slot, summed weight
        out(1 + n) = a(1 + ia)
        out(1 + k + n) = Math.addExact(a(1 + k + ia), b(1 + k + ib))
        ia += 1; ib += 1
      }
      n += 1
    }
    out(0) = n.toLong
    out
  }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] = {
    val n = buf(0).toInt
    (0 until n).map(i => (buf(1 + i), buf(1 + k + i)))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object WeightedBottomKAgg {
  /** Column-API form: `weightedBottomK(k)(hashCol, weightCol)` over two
    * bigint columns; returns `array<struct<_1: bigint, _2: bigint>>` of
    * the k smallest distinct hashes ascending with their Σweights. */
  def weightedBottomK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new WeightedBottomKAgg(k),
      ExpressionEncoder[(Long, Long)]())
    (h: Column, w: Column) => fn(h, w)
  }
}
