package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical first step of text-corpus
  * cleaning (decomposed e + combining accent -> composed é), which Spark
  * has no built-in for. Codegen emits a static call; the JDK normalizer
  * matches DuckDB's `nfc_normalize`, which is what the oracle replays.
  * Fast path: pure-ASCII strings (the overwhelming majority of corpus
  * bytes) skip normalization entirely. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.norm($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalizeExpr {
  def norm(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity on ASCII
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
}
