package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass 64-bit SimHash over a token array.
  *
  * Computes EXACTLY the same value as the Column formula in
  * [[Hashing.simhash64FromHashes]] (md5 word 0 votes bits 0-31, word 1 votes
  * bits 32-63, vote = sum of (2*bit-1), bit set iff vote > 0) — the DuckDB
  * oracle replays that formula — but in a single pass: one md5 per token,
  * a primitive 64-int vote array, no per-bit re-scan. The Column form costs
  * 64 interpreted `aggregate()` folds over the hash arrays (~35 s for 5 k
  * docs at sf0.1); this runs at digest speed.
  *
  * Codegen emits a static call (the loop itself is compiled Scala), keeping
  * the expression inside whole-stage codegen without interpretation. */
case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string> tokens, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Simhash64Expr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Simhash64Expr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Simhash64Expr {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static evaluator shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val md = digests.get()
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // md5 hex word 0 = digest bytes 0-3 (big-endian), word 1 = bytes 4-7
        val lo = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
          ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        val hi = ((d(4) & 0xff) << 24) | ((d(5) & 0xff) << 16) |
          ((d(6) & 0xff) << 8) | (d(7) & 0xff)
        var j = 0
        while (j < 32) {
          votes(j) += (((lo >>> j) & 1) << 1) - 1
          votes(j + 32) += (((hi >>> j) & 1) << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sh |= 1L << j
      j += 1
    }
    sh
  }

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(Simhash64Expr(ColumnBridge.expression(tokens)))
}
