package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] over long keys —
  * the executor half of the classic runtime-filter pattern: build a compact
  * filter from the dimension side's join keys, broadcast it inside the plan,
  * and drop fact rows that cannot possibly join BEFORE they reach the
  * shuffle. No false negatives (pruning is always sound); false positives
  * only cost a wasted shuffle row.
  *
  * The filter bytes ride along as a node parameter (same shape Spark's own
  * `InjectRuntimeFilter` gives its bloom subquery result) and deserialize
  * once per executor via the codegen reference object, not once per row.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a BIGINT key, got ${child.dataType}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // Reference the deserialized filter once; each row is two hash probes.
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomMightContainExpr {
  def might_contain(key: Column, bytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(key), bytes))
}
