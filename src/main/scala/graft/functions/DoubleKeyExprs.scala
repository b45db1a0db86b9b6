package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Order-reversing double→long key (and its inverse) — the bridge that
  * lets a DESCENDING similarity score ride the k-capped ASCENDING
  * [[TopKPairsAgg]] instead of a per-group `row_number` window.
  *
  * A qid-partitioned rank window sorts every candidate row inside each
  * query partition — for brute-force scoring that is a |corpus|-sized sort
  * per query. Encoding the score as a long key whose ascending order is
  * the score's descending order turns the same reduction into a map-side
  * partially-aggregated top-k whose shuffle carries ≤ k pairs per
  * (partition, group).
  *
  * Encoding (Lucene's sortable-bits transform, then bitwise NOT to
  * reverse): `-0.0` is normalized to `0.0` first so the two zeros rank
  * identically (SQL comparison semantics); `b = doubleToLongBits(v)`;
  * `s = b ^ ((b >> 63) & 0x7fffffffffffffffL)` sorts ascending as a
  * signed long exactly like `v` (the sign bit is preserved, the mantissa/
  * exponent bits of negatives are flipped); `~s` reverses the order with
  * no overflow case. NaN's canonical bits sort above +Inf ascending, so a
  * NaN score ranks FIRST under the reversed key — the same "NaN is
  * greatest" order Spark's `desc` sort uses. The transform is exact and
  * self-inverse up to the NOT, so [[DoubleFromDescKeyExpr]] recovers the
  * original double bit-for-bit (cross-engine hash compares still work).
  */
case class DoubleDescKeyExpr(child: Expression) extends UnaryExpression {
  // Analysis-time type gate (AbstractDataType/ExpectsInputTypes is
  // private[sql]): a non-double child must fail during analysis, not as
  // a runtime ClassCastException or a codegen compile error.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE child, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "double_desc_key"
  override def nullSafeEval(v: Any): Any = {
    var d = v.asInstanceOf[Double]
    if (d == 0.0) d = 0.0 // normalize -0.0
    val b = java.lang.Double.doubleToLongBits(d)
    ~(b ^ ((b >> 63) & 0x7fffffffffffffffL))
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      s"""
         |double $d = ($v == 0.0) ? 0.0 : $v;
         |long $b = java.lang.Double.doubleToLongBits($d);
         |${ev.value} = ~($b ^ (($b >> 63) & 0x7fffffffffffffffL));
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Exact inverse of [[DoubleDescKeyExpr]]: recovers the original double
  * from the reversed sortable key (the sortable-bits transform is an
  * involution, so decode = NOT, then the same transform). */
case class DoubleFromDescKeyExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT child, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_from_desc_key"
  override def nullSafeEval(v: Any): Any = {
    val s = ~v.asInstanceOf[Long]
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s")
      s"""
         |long $s = ~$v;
         |${ev.value} =
         |  java.lang.Double.longBitsToDouble($s ^ (($s >> 63) & 0x7fffffffffffffffL));
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DoubleKeyExprs {
  def doubleDescKey(v: Column): Column =
    ColumnBridge.column(DoubleDescKeyExpr(ColumnBridge.expression(v)))
  def doubleFromDescKey(k: Column): Column =
    ColumnBridge.column(DoubleFromDescKeyExpr(ColumnBridge.expression(k)))
}
