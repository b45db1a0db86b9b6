package graft.xml

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Memoizing wrapper around a `from_xml` parse.
  *
  * The DSL's bound projection references the per-row parsed struct from
  * every member expression (often under `when` branches), and after column
  * pruning / constant propagation those references become IDENTICAL COPIES
  * of the `from_xml` call in one Project — Spark's subexpression elimination
  * does not collapse them (measured: x1 evaluates the parse ~9x per row,
  * ~6x slower end-to-end). Wrapping the parse in this expression makes every
  * duplicate first evaluate the (cheap) xml-string child and look the result
  * up in a small per-thread LRU keyed by (result type, xml text) — the
  * actual parse then runs once per row, exactly like the StAX path's
  * XmlStax.children memo.
  *
  * CodegenFallback is deliberate: generating the child inline would run the
  * parse before this wrapper could intercept it. The fallback call keeps the
  * surrounding Project inside whole-stage codegen; the interpreted overhead
  * is noise next to the parse itself.
  */
case class XmlMemoParseExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "xml_memo_parse"

  /** The parse expression's own input — the raw xml string column. */
  @transient private lazy val strChild: Expression = child.children.head

  /** Schema cache key, computed once per expression instance. Duplicated
    * references may be DISTINCT instances with distinct (equal) DataType
    * objects — identity keying would miss and StructType.equals per lookup
    * dominates (both measured) — so key by the schema string, whose
    * hashCode the JVM caches. */
  @transient private lazy val schemaKey: String = dataType.catalogString

  override def eval(input: InternalRow): Any = {
    val s = strChild.eval(input)
    if (s == null) null
    else {
      val perSchema = XmlMemoParseExpr.memo.get()
      var cache = perSchema.get(schemaKey)
      if (cache == null) {
        cache = XmlMemoParseExpr.newLru()
        perSchema.put(schemaKey, cache)
      }
      val key = s.toString
      if (cache.containsKey(key)) cache.get(key)
      else {
        val r = child.eval(input)
        cache.put(key, r)
        r
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object XmlMemoParseExpr {
  private final val MemoSlots = 4

  private[xml] def newLru(): java.util.LinkedHashMap[String, Any] =
    new java.util.LinkedHashMap[String, Any](MemoSlots * 2, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Any]): Boolean = size() > MemoSlots
    }

  private val memo = new ThreadLocal[
      java.util.HashMap[String, java.util.LinkedHashMap[String, Any]]] {
    override def initialValue() =
      new java.util.HashMap[String, java.util.LinkedHashMap[String, Any]]()
  }
}
