package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Primitive-loop vector kernels. The `zip_with`/`aggregate` higher-order
  * functions evaluate interpreted lambdas with per-element boxing — ~100x
  * slower than a tight loop over the underlying primitive arrays. These
  * expressions keep the exact same left-to-right double-accumulation
  * semantics (bit-identical results, so the DuckDB fold oracles still
  * hash-match) while running at array-copy speed.
  *
  * Element types float and double are both supported (embeddings are
  * float[]; hyperplane literals are double[]).
  */
private[functions] object VecEval {
  def elemAt(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalArgumentException(
      s"vector element type must be float/double, got $other")
  }

  /** Java accessor snippet for codegen. */
  def elemJava(arr: String, i: String, t: DataType): String = t match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(
      s"vector element type must be float/double, got $other")
  }
}

case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  private lazy val lt =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rt =
    right.dataType.asInstanceOf[ArrayType].elementType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += VecEval.elemAt(a, i, lt) * VecEval.elemAt(b, i, rt)
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${VecEval.elemJava(a, i, lt)} * ${VecEval.elemJava(b, i, rt)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class Norm2Expr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2"
  private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < a.numElements()) {
      val x = VecEval.elemAt(a, i, et)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = ${VecEval.elemJava(a, i, et)};
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExprs {
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  def vec_norm2(a: Column): Column =
    ColumnBridge.column(Norm2Expr(ColumnBridge.expression(a)))
}
