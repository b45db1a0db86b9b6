package graft.xml

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `from_xml` replacement for FLAT native read schemas (root attributes +
  * repeated scalar children + single-scalar containers).
  *
  * Spark's `from_xml` creates a fresh Woodstox stream reader per row —
  * `SymbolTable.makeChild` dominates its profile on record-sized documents
  * (measured via jstack on the x4 struct path). This expression parses the
  * common record shape with [[XmlFastScan.flatStruct]] (one pass over the
  * UTF8 bytes, values copied straight from the input buffer) and falls back
  * PER ROW to Spark's own `XmlToStructsEvaluator` for anything outside the
  * proven-equivalent subset (prolog, entities, mixed content, empty or
  * padded values, namespaces, malformed markup, …) — so the semantics are
  * from_xml's by construction, including mixed-content serialization (x6)
  * and PERMISSIVE handling of corrupt documents (x10).
  *
  * A per-thread LRU keyed by a defensive copy of the input (UTF8String
  * hashCode hashes raw bytes — no decode) makes the duplicate references a
  * bound projection holds O(1), replacing [[XmlMemoParseExpr]]'s
  * String-keyed memo whose every lookup paid a UTF8→UTF16 decode.
  */
case class XmlFlatParseExpr(child: Expression, schema: StructType)
  extends UnaryExpression {

  override def dataType: DataType = schema
  override def nullable: Boolean = true
  override def prettyName: String = "xml_flat_parse"

  @transient private lazy val spec: XmlFastScan.FlatSpec =
    XmlFastScan.FlatSpec.of(schema).getOrElse(
      throw new IllegalStateException(
        "xml_flat_parse on a non-flat schema: " + schema.catalogString))

  // Spark's real evaluator, created lazily per executor; the options are
  // the DSL's from_xml options, so fallback rows parse EXACTLY as the
  // from_xml path did. TimeZone only affects date/timestamp fields, which
  // a flat schema cannot contain.
  @transient private lazy val fallback = {
    val opts = Map.newBuilder[String, String]
    Bind.xmlOptions.forEach((k, v) => opts += (k -> v))
    def nullify(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = nullify(f.dataType), nullable = true)))
      case ArrayType(et, _) => ArrayType(nullify(et), containsNull = true)
      case other => other
    }
    org.apache.spark.sql.catalyst.expressions.xml.XmlToStructsEvaluator(
      opts.result(), nullify(schema), "_corrupt_record", Some("UTC"),
      Literal(UTF8String.fromString(""), StringType))
  }

  @transient private lazy val schemaKey: String = schema.catalogString

  def evalFlat(input: UTF8String): Any = {
    val perSchema = XmlFlatParseExpr.memo.get()
    var cache = perSchema.get(schemaKey)
    if (cache == null) {
      cache = XmlFlatParseExpr.newLru()
      perSchema.put(schemaKey, cache)
    }
    val hit = cache.get(input)
    if (hit != null || cache.containsKey(input)) return hit
    val fast = XmlFastScan.flatStruct(input, spec)
    val res =
      if (!(fast eq XmlFastScan.Bail)) fast
      else fallback.evaluate(input)
    // defensive key copy: the input may alias a reused row buffer
    cache.put(input.clone(), res)
    res
  }

  override def nullSafeEval(input: Any): Any =
    evalFlat(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("expr", this, "graft.xml.XmlFlatParseExpr")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $self.evalFlat($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XmlFlatParseExpr {
  private final val MemoSlots = 4

  private def newLru(): java.util.LinkedHashMap[UTF8String, Any] =
    new java.util.LinkedHashMap[UTF8String, Any](MemoSlots * 2, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[UTF8String, Any]): Boolean =
        size() > MemoSlots
    }

  private val memo = new ThreadLocal[
      java.util.HashMap[String, java.util.LinkedHashMap[UTF8String, Any]]] {
    override def initialValue() =
      new java.util.HashMap[String,
        java.util.LinkedHashMap[UTF8String, Any]]()
  }
}
