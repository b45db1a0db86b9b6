package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of two 8-bit BIGINT keys — the second layout key
  * beside [[ZOrderExpr]]'s Morton interleave. The Hilbert curve visits
  * every cell of the 256x256 grid so that CONSECUTIVE indices are always
  * ADJACENT cells (the Morton curve jumps at every power-of-two
  * boundary), which tightens per-file bounding boxes when range-sorting
  * for scan pruning — the reason table formats offer Hilbert clustering
  * beside Z-order. Classic xy2d bit transform (Hilbert 1891; iterative
  * form per Warren, Hacker's Delight §16): 8 rounds of quadrant
  * selection + rotation, pure integer ops, codegen'd as a static call
  * exactly like zorder16.
  */
case class HilbertExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert8 needs (BIGINT, BIGINT), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertExpr.hilbert8(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.HilbertExpr.hilbert8($l, $r);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object HilbertExpr {

  /** Hilbert d-index of (x, y) on the 256x256 grid (low 8 bits used).
    * Quadrant values by (rx, ry): (0,0)->0, (0,1)->1, (1,1)->2,
    * (1,0)->3 — i.e. (3*rx) XOR ry; rotation: ry==0 flips (when rx==1)
    * then swaps the axes. */
  def hilbert8(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFL
    var y = yIn & 0xFFL
    var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert8(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
