package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency probe against a pre-built [[CountMinSketch]] (built by
  * [[CmsAgg]], fetched as config-sized driver state like the ANN
  * centroids): deserializes once per executor via the codegen reference
  * object, then each row costs d hash probes. */
case class CmsEstimateExpr(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs a STRING item, got ${child.dataType}")

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  override def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.estimateCount($c.toString());")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CmsEstimateExpr {
  def cms_estimate(item: Column, bytes: Array[Byte]): Column =
    ColumnBridge.column(
      CmsEstimateExpr(ColumnBridge.expression(item), bytes))
}
