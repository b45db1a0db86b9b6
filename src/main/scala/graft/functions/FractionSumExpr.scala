package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** EXACT RATIONAL SUM of an array<struct<n: bigint, d: bigint>> of
  * fractions → struct<n: bigint, d: bigint> in lowest terms — the
  * primitive Brandes dependency accumulation needs
  * ([[graft.operators.Graph.betweennessPivots]]): δ values are sums of
  * σ-ratio fractions, and a float sum would be order-dependent under
  * distributed aggregation (the house rule), while unreduced
  * cross-multiplied integer sums overflow int64 after a handful of
  * terms. This folds in BigInteger with a gcd reduction at every step,
  * so intermediates stay at their canonical (lowest-terms) magnitude
  * and the RESULT IS ORDER-INDEPENDENT — exact rational addition is
  * associative-commutative, which is what makes a `collect_list`
  * (arbitrary partition order) a sound input. The final lowest-terms
  * value must fit int64 (longValueExact — an honest ArithmeticException
  * past the envelope, never a silent wrap); a SQL oracle reproduces it
  * with any exact integer fold plus ONE final gcd canonicalization,
  * regardless of its own fold order. Empty arrays sum to 0/1;
  * denominators must be ≥ 1. */
case class FractionSumExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))
  override def prettyName: String = "fraction_sum"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _), StructField(_, LongType, _, _))),
        _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"fraction_sum needs array<struct<bigint, bigint>>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    FractionSumExpr.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FractionSumExpr.fold($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FractionSumExpr {

  /** BigInteger gcd-reduced left fold; see the class doc for why the
    * fold order cannot matter. */
  def fold(arr: ArrayData): InternalRow = {
    var n = BigInteger.ZERO
    var d = BigInteger.ONE
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 2)
      val xn = BigInteger.valueOf(row.getLong(0))
      val xd = BigInteger.valueOf(row.getLong(1))
      if (xd.signum() <= 0)
        throw new ArithmeticException(s"fraction_sum: denominator <= 0")
      val nn = n.multiply(xd).add(xn.multiply(d))
      val dd = d.multiply(xd)
      val g = nn.gcd(dd)
      if (g.signum() == 0) { n = BigInteger.ZERO; d = BigInteger.ONE }
      else { n = nn.divide(g); d = dd.divide(g) }
      i += 1
    }
    new GenericInternalRow(Array[Any](n.longValueExact(),
      d.longValueExact()))
  }

  def fracSum(fractions: Column): Column =
    ColumnBridge.column(FractionSumExpr(
      ColumnBridge.expression(fractions)))
}
