package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of the low 16 bits of two BIGINT keys —
  * the data-layout primitive behind multi-dimensional clustering: sorting
  * by the interleaved value places rows close in BOTH key dimensions into
  * the same files, so parquet min/max footer stats prune scans for
  * predicates on either column. Codegen emits the classic O(log w)
  * shift-mask spread (no loop, no branch).
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder16"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder16 needs (BIGINT, BIGINT), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrderExpr.interleave16(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ZOrderExpr.interleave16($l, $r);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object ZOrderExpr {

  /** Spread the low 16 bits of v to even bit positions 0,2,..,30. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** x bits at even positions, y bits at odd — 32-bit Morton code. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  def zorder16(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
