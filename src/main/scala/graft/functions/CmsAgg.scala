package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable count-min sketch over a string column — approximate
  * frequencies for EVERY item in fixed memory (d x w counters,
  * d = ceil(ln(1/delta)), w = ceil(2/eps)), the heavy-hitter companion to
  * the cardinality sketches (linear counting t5, HLL t12).
  *
  * The estimate never undercounts and overcounts by at most eps * N with
  * probability 1 - delta, so `estimate in [exact, exact + eps*N]` is a
  * testable invariant. Partial sketches merge losslessly (counter-wise
  * add), so Spark aggregates map-side and shuffles one d x w grid per
  * group — the same persist-and-reunion shape as the HLL path, and the
  * fixed seed keeps the sketch deterministic across runs and engines.
  */
final class CmsAgg(eps: Double, delta: Double, seed: Int)
    extends Aggregator[String, CountMinSketch, Array[Byte]] {

  override def zero: CountMinSketch = CountMinSketch.create(eps, delta, seed)

  override def reduce(buf: CountMinSketch, item: String): CountMinSketch = {
    if (item != null) buf.addString(item)
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b)
    a
  }

  override def finish(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[CountMinSketch] =
    Encoders.javaSerialization[CountMinSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CmsAgg {
  /** Column-API form: one serialized sketch per group. */
  def cmsSketch(eps: Double, delta: Double, seed: Int): Column => Column = {
    val fn = udaf(new CmsAgg(eps, delta, seed), Encoders.STRING)
    c => fn(c)
  }

  def estimate(bytes: Array[Byte], item: String): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      .estimateCount(item)

  /** Counter-wise sum of serialized sketches (same eps/delta/seed) —
    * the epoch-merge used by [[graft.streaming.StreamOps.cmsEpochSink]].
    * Associative and commutative but NOT idempotent: a replayed blob
    * doubles its counts, which is why the streaming sink must make
    * epochs idempotent by partition overwrite before this fold. */
  def mergeBytes(blobs: Seq[Array[Byte]]): Array[Byte] = {
    require(blobs.nonEmpty, "mergeBytes needs at least one sketch")
    val merged = blobs.map(b =>
        CountMinSketch.readFrom(new ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val out = new ByteArrayOutputStream()
    merged.writeTo(out)
    out.toByteArray
  }
}
