package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge table to one word — the ENCODE side of the
  * tokenizer whose TRAINING is `operators/Bpe.trainMerges` (t18). Returns
  * the word's subword pieces after all merges.
  *
  * Semantics (defined, engine-portable): the word starts as its code-point
  * symbols; each merge (a, b), taken in ascending rank order, runs ONE
  * greedy left-to-right non-overlapping pass replacing adjacent [a, b]
  * with [ab]. A single pass per merge is stable for a fixed pair (merging
  * the leftmost occurrence can never create a new occurrence of the SAME
  * pair to its left), so this equals repeat-until-fixpoint per merge and
  * replays exactly in the oracle's string-rewrite recursion. Sequential
  * rank order (rather than the rank-priority-queue loop some runtimes
  * use) is part of the operator's contract.
  *
  * The merge table is a plan literal — broadcast once inside the codegen
  * reference object, per-row work is the merge loop over an
  * array-of-String symbols buffer. Stays inside whole-stage codegen via a
  * static helper call, the [[BloomMightContainExpr]] pattern.
  */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_apply needs a STRING word, got ${child.dataType}")
  }

  @transient private lazy val table: BpeApplyExpr.MergeTable =
    new BpeApplyExpr.MergeTable(merges.map(_._1).toArray,
      merges.map(_._2).toArray)

  override def nullSafeEval(input: Any): Any =
    BpeApplyExpr.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeApplyExpr.MergeTable].getName)
    val helper = BpeApplyExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $helper.encode($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeApplyExpr {

  /** Codegen-referenced parameter object: parallel left/right arrays. */
  final class MergeTable(val lefts: Array[String], val rights: Array[String])
      extends Serializable

  /** Static per-row kernel (called from generated code). */
  def encode(word: UTF8String, t: MergeTable): ArrayData = {
    val s = word.toString
    // initial symbols: one per code point
    var syms = new Array[String](s.codePointCount(0, s.length))
    var ci = 0
    var si = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val n = Character.charCount(cp)
      syms(si) = s.substring(ci, ci + n)
      ci += n
      si += 1
    }
    var m = 0
    while (m < t.lefts.length && syms.length > 1) {
      val a = t.lefts(m)
      val b = t.rights(m)
      val out = new java.util.ArrayList[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out.add(a + b)
          i += 2
        } else {
          out.add(syms(i))
          i += 1
        }
      }
      if (out.size != syms.length) syms = out.toArray(new Array[String](0))
      m += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_): Any))
  }

  def bpe_apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeApplyExpr(ColumnBridge.expression(word), merges))
}
