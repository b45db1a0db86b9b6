package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingle SET of a string: the distinct n-grams of
  * the space-tokenized input in first-occurrence order — bit-identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(slice(...))))`
  * (parity-tested in OperatorSpec) but without the higher-order-function
  * machinery, which evaluates its lambda interpreted per shingle and
  * materializes the duplicated array first. This feeds the exact-Jaccard
  * verify stage of every dedup pipeline (d5, d11-d13), where it runs once
  * per DOCUMENT side of each candidate pair. */
case class ShingleSetExpr(child: Expression, n: Int,
    distinct: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "shingle_set" else "shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"shingle_set needs a string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleSetExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleSetExpr.compute($c, $n, " +
        s"$distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSetExpr {

  /** Static evaluator shared by interpreted eval and generated code.
    * Tokenization is `split(c, " ")` with limit -1 (trailing empty tokens
    * kept); LinkedHashSet preserves first-occurrence order, exactly like
    * Spark's array_distinct. */
  def compute(input: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = input.toString.split(" ", -1)
    val total = toks.length - (n - 1)
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet preserves first-occurrence order (= array_distinct);
    // the non-distinct form keeps every shingle in document order.
    val acc: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String](total)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      acc.add(sb.toString): Unit
      i += 1
    }
    val out = new Array[Any](acc.size)
    val it = acc.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  def shingle_set(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleSetExpr(ColumnBridge.expression(c), n))

  /** All n-gram shingles in document order, duplicates kept — the multiset
    * form n-gram language-model statistics need. */
  def shingles(c: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleSetExpr(ColumnBridge.expression(c), n, distinct = false))
}
