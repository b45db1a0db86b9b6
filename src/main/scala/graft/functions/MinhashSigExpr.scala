package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over a token array: word n-gram shingling,
  * dedup, portable md5 hashing, and all k permutation minima in a single
  * loop — no intermediate shingle/hash arrays, ONE md5 per distinct
  * shingle.
  *
  * Computes EXACTLY the values of the declarative pipeline in
  * [[Hashing.shingles]] / [[Hashing.minhashSig]] (which the DuckDB oracles
  * replay): shingle = n tokens joined by ' ', hash = first 8 md5 hex chars
  * as a long, sig_i = min over shingles of (h*A_i + B_i) mod P, empty ->
  * the P sentinel. The Column formula costs k interpreted higher-order
  * passes over materialized arrays; this runs at digest speed.
  */
case class MinhashSigExpr(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string> tokens, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    MinhashSigExpr.compute(v.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashSigExpr.compute($a, $n, $k);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinhashSigExpr {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static evaluator shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val mins = Array.fill(k)(Hashing.MinhashP)
    val nTok = tokens.numElements()
    if (nTok >= n) {
      val md = digests.get()
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= nTok - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          j += 1
        }
        val shingle = sb.toString
        if (seen.add(shingle)) {
          md.reset()
          val d = md.digest(UTF8String.fromString(shingle).getBytes)
          // first 8 md5 hex chars = first 4 digest bytes, big-endian
          val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
          var p = 0
          while (p < k) {
            val v = (h * Hashing.minhashA(p) + Hashing.minhashB(p)) %
              Hashing.MinhashP
            if (v < mins(p)) mins(p) = v
            p += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf).toArray[Any])
  }

  def minhash_sig(tokens: Column, n: Int, k: Int): Column =
    ColumnBridge.column(
      MinhashSigExpr(ColumnBridge.expression(tokens), n, k))
}
