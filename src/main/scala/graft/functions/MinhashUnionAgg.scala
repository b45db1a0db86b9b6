package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable MinHash-signature union — a real `Aggregator[IN, BUF, OUT]`
  * (SURVEY §2.2 UDAF row).
  *
  * The MinHash sketch of a UNION of document sets is the element-wise min of
  * the per-document signatures, so the aggregator is associative and
  * commutative with a clean identity (the empty-set sentinel `MinhashP`):
  * exactly the algebra Spark's partial aggregation wants. At scale the merge
  * runs map-side (partial per partition, k longs per group shuffled), so a
  * corpus-wide per-domain sketch costs one small shuffle; the same property
  * makes it usable in streaming state merges.
  *
  * Pairs with [[Hashing.minhashSig]] / `Dedup.withMinhashSig`: group docs,
  * union their signatures, estimate cross-group Jaccard from the merged
  * sketches without revisiting the text.
  */
final class MinhashUnionAgg(k: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Hashing.MinhashP)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      require(sig.length == k, s"signature length ${sig.length} != k=$k")
      var i = 0
      while (i < k) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinhashUnionAgg {
  /** Column-API form: `minhashUnion(8)(col("sig"))` over an
    * `array<bigint>` signature column. */
  def minhashUnion(k: Int): Column => Column = {
    val fn = udaf(new MinhashUnionAgg(k), ExpressionEncoder[Seq[Long]]())
    (sig: Column) => fn(sig)
  }
}
