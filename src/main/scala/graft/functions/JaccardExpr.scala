package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass exact Jaccard similarity between two string arrays under SET
  * semantics — |A ∩ B| / |A ∪ B|, empty union -> 0.0 — bit-identical to
  * `size(array_intersect)/size(array_union)` (which the DuckDB oracles
  * replay as inter/(|A|+|B|-inter) over distinct sets) but in one hash-set
  * pass instead of two interpreted collection expressions per pair. This
  * is the inner loop of near-dup verification: it runs once per CANDIDATE
  * pair, the hottest scalar in the dedup pipeline at corpus scale. */
case class JaccardExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard needs two array<string> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object JaccardExpr {

  /** Static evaluator shared by interpreted eval and generated code.
    * Null elements participate as one distinct value, matching Spark's
    * array_intersect/array_union set semantics. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[String]()
    var aNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aNull = true
      else setA.add(a.getUTF8String(i).toString): Unit
      i += 1
    }
    val seenB = new java.util.HashSet[String]()
    var bNull = false
    var inter = 0L
    var bOnly = 0L
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bNull = true
      else {
        val s = b.getUTF8String(i).toString
        if (seenB.add(s)) {
          if (setA.contains(s)) inter += 1 else bOnly += 1
        }
      }
      i += 1
    }
    // null-as-element: in the intersection iff on both sides, in the union
    // iff on either
    if (aNull && bNull) inter += 1
    val union = setA.size.toLong + bOnly +
      (if (aNull || bNull) 1L else 0L)
    if (union == 0L) 0.0 else inter.toDouble / union
  }

  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardExpr(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
