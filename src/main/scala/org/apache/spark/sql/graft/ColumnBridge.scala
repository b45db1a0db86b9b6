package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{CommonExpressionDef,
  CommonExpressionId, CommonExpressionRef, Expression, With}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Bridge to the classic Column <-> catalyst Expression conversions, which
  * are `private[sql]` in Spark 4 (Column is backed by ColumnNode there).
  * Lives under org.apache.spark.sql to access them; the rest of graft uses
  * only this object.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst `With` (CommonExpressionDef/Ref): evaluate each of `commons`
    * ONCE and reference the results multiple times in `body`. The optimizer
    * (RewriteWithExpression) splits them into dedicated Projects — the
    * sanctioned cure for expensive repeated subexpressions (our per-row XML
    * parses). Only valid at projection level, not inside lambda functions.
    */
  /** The refs must carry their data types explicitly: `With`'s own helper
    * builds refs from unresolved defs, which breaks pre-analysis
    * `.getField` on them — our call sites know every common's type
    * statically. */
  def withCommon(commons: Seq[(Column, DataType)])(
      body: Seq[Column] => Column): Column = {
    val defs = commons.map { case (c, _) =>
      CommonExpressionDef(expression(c), new CommonExpressionId())
    }
    val refs = defs.zip(commons).map { case (d, (_, dt)) =>
      new CommonExpressionRef(d.id, dt, true)
    }
    column(With(expression(body(refs.map(column))), defs))
  }
}
