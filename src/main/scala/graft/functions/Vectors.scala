package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions. Sums fold left-to-right in array order, in double — the
  * DuckDB oracle replays the same fold, so results are bit-identical.
  *
  * Scale: codegen'd expressions over primitive arrays; no UDF boxing, no
  * shuffle. For 100 TB ANN, pair with the LSH bucketing in operators.Ann so
  * the full corpus is never cross-joined.
  */
object Vectors {

  private def d(c: Column): Column = c.cast("double")

  def dot(a: Column, b: Column): Column = VectorExprs.vec_dot(a, b)

  def norm2(a: Column): Column = VectorExprs.vec_norm2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine rounded for cross-engine hash compares. */
  def cosineR(a: Column, b: Column, scale: Int = 4): Column =
    round(cosine(a, b), scale)

  /** Exact squared L2 distance between two vector columns — zip + left
    * fold in double arithmetic (the Pq ADC fold), replayable as a list
    * fold in any engine. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  /** Largest absolute component — the symmetric-quantization scale basis. */
  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(d(x))))

  /** Symmetric int8 quantization: q_i = round(x_i * 127 / maxAbs). At 100 TB
    * this is the 4x storage/bandwidth lever for embedding columns (float32
    * -> int8 + one scale per vector); arithmetic is plain doubles + a
    * half-away-from-zero round, so any engine replays it bit-for-bit. */
  def quantize(v: Column, maxAbsC: Column): Column =
    transform(v, x => round(d(x) * lit(127.0) / maxAbsC).cast("int"))

  /** Inverse of [[quantize]] (up to rounding error). */
  def dequantize(q: Column, maxAbsC: Column): Column =
    transform(q, x => d(x) * maxAbsC / lit(127.0))

  /** Sign-bit LSH bucket from a fixed set of hyperplane vectors: bit i set
    * iff dot(v, plane_i) >= 0. With planes drawn deterministically from the
    * dataset itself (e.g. the first k embeddings), the bucketing is fully
    * reproducible in SQL. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(VectorExprs.vec_dot(v, planeCol) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
}
