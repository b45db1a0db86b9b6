package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-minimum-VALUES aggregate — the state of a KMV / theta-style
  * distinct sketch ([[graft.operators.Sketches.bottomKState]]).
  *
  * Keeps the k smallest DISTINCT bigint inputs. The distinctness is the
  * difference from [[TopKPairsAgg]] (whose duplicate pairs legitimately
  * occupy slots): a KMV sketch is a uniform sample of the distinct HASH
  * domain, so a duplicate arrival must be a no-op or the θ estimator
  * double-counts hot values. State is a sorted flat `Array[Long]`
  * `[n, v0, v1, ...]` of fixed capacity k+1 — capped at k at EVERY point
  * of the partial-aggregation tree (reduce = dedup binary-search insert,
  * merge = sorted dedup merge truncated at k), associative and
  * commutative with zero = empty, so the shuffle carries at most k values
  * per (partition, group) regardless of corpus size.
  */
final class BottomKDistinctAgg(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, "k must be > 0")

  override def zero: Array[Long] = new Array[Long](k + 1) // n = 0

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val n = buf(0).toInt
    if (n == k && v >= buf(k)) return buf // full and not smaller than max
    // binary search over the n sorted values at buf(1..n)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(1 + mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(1 + lo) == v) return buf // duplicate: no-op
    val keep = math.min(n, k - 1)
    var i = keep
    while (i > lo) { buf(1 + i) = buf(i); i -= 1 }
    buf(1 + lo) = v
    buf(0) = math.min(n + 1, k).toLong
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a(0).toInt; val nb = b(0).toInt
    if (nb == 0) return a
    if (na == 0) return b
    val out = new Array[Long](k + 1)
    var ia = 0; var ib = 0; var n = 0
    while (n < k && (ia < na || ib < nb)) {
      val v =
        if (ib >= nb) { val x = a(1 + ia); ia += 1; x }
        else if (ia >= na) { val x = b(1 + ib); ib += 1; x }
        else if (a(1 + ia) < b(1 + ib)) { val x = a(1 + ia); ia += 1; x }
        else if (a(1 + ia) > b(1 + ib)) { val x = b(1 + ib); ib += 1; x }
        else { val x = a(1 + ia); ia += 1; ib += 1; x } // shared: once
      out(1 + n) = v
      n += 1
    }
    out(0) = n.toLong
    out
  }

  override def finish(buf: Array[Long]): Seq[Long] = {
    val n = buf(0).toInt
    (0 until n).map(i => buf(1 + i))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object BottomKDistinctAgg {
  /** Column-API form: `bottomK(k)(hashCol)` over a bigint column; returns
    * `array<bigint>` of the k smallest distinct values, ascending. */
  def bottomK(k: Int): Column => Column = {
    val fn = udaf(new BottomKDistinctAgg(k), ExpressionEncoder[Long]())
    (h: Column) => fn(h)
  }
}
