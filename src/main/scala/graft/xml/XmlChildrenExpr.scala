package graft.xml

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData,
  GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression: extract matching depth-1 children of an XML string
  * as `array<struct<tag,xml,value>>`, in document order.
  *
  * This is the one custom operator the native XML source cannot express
  * (SURVEY.md §7.3): the reference's wildcard dispatch + `Tag()` capture +
  * per-child array emit (reference Parser.cs:166-187, 257-316). Evaluation is
  * a single StAX pass per value (CodegenFallback — the XML tokenization
  * dominates, codegen of the wrapper would not help).
  *
  * Scale: embarrassingly parallel per row; no state, no shuffle. The returned
  * children carry re-parsable outer XML so downstream exact-member binding
  * stays on the codegen'd `from_xml` path.
  */
case class XmlChildrenExpr(child: Expression, patterns: Seq[String],
    fromRoot: Boolean, needOuter: Boolean = true, needValue: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = XmlChildrenExpr.outType
  override def nullable: Boolean = true
  override def prettyName: String = "xml_children"

  // computed once per instance; the hot memo path then hashes only the
  // xml string (see XmlStax.specKey)
  @transient private lazy val specKey: String =
    XmlStax.specKey(patterns, fromRoot, needOuter, needValue)

  override def nullSafeEval(input: Any): Any =
    XmlChildrenExpr.evalJava(input.asInstanceOf[UTF8String], patterns,
      fromRoot, specKey, needOuter, needValue)

  // a real doGenCode (vs CodegenFallback) keeps the surrounding projection
  // inside whole-stage codegen; the generated code just calls the static
  // evaluator
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("patterns", patterns,
      "scala.collection.immutable.Seq")
    val key = ctx.addReferenceObj("specKey", specKey, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.xml.XmlChildrenExpr.evalJava($c, $pats,
         |  $fromRoot, $key, $needOuter, $needValue);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XmlChildrenExpr {
  val elemType: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("xml", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    // the child's own attributes, extracted in the same StAX pass —
    // attribute binds on array elements need no from_xml re-parse
    StructField("attrs", MapType(StringType, StringType,
      valueContainsNull = false), nullable = false)))
  val outType: DataType = ArrayType(elemType, containsNull = false)

  // Memoize the CONSTRUCTED ArrayData (not just the Seq[Child]): a bound
  // projection evaluates the same extraction from many member expressions,
  // and rebuilding UTF8Strings per reference was a measured hotspot. The
  // cached GenericArrayData is immutable and safe to share within a thread.
  private final val MemoSlots = 4
  private val memo = new ThreadLocal[
      java.util.HashMap[String, java.util.LinkedHashMap[String, ArrayData]]] {
    override def initialValue() =
      new java.util.HashMap[String,
        java.util.LinkedHashMap[String, ArrayData]]()
  }
  private def newLru(): java.util.LinkedHashMap[String, ArrayData] =
    new java.util.LinkedHashMap[String, ArrayData](MemoSlots * 2, 0.75f,
        true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ArrayData]): Boolean =
        size() > MemoSlots
    }

  def evalJava(input: UTF8String, patterns: Seq[String],
      fromRoot: Boolean): ArrayData =
    evalJava(input, patterns, fromRoot, XmlStax.specKey(patterns, fromRoot),
      needOuter = true, needValue = true)

  /** Static evaluator shared by interpreted eval and generated code. */
  def evalJava(input: UTF8String, patterns: Seq[String],
      fromRoot: Boolean, specKey: String, needOuter: Boolean,
      needValue: Boolean): ArrayData = {
    // byte-level fast path (value-only capture of leaf children): no
    // toString decode, no StAX, values copied straight from the input
    // bytes; anything outside the proven-equivalent subset falls through
    val fast = XmlFastScan.children(input, patterns, specKey, fromRoot,
      needOuter, needValue)
    if (!(fast eq XmlFastScan.Bail)) return fast.asInstanceOf[ArrayData]
    val xml = input.toString
    val perSpec = memo.get()
    var cache = perSpec.get(specKey)
    if (cache == null) {
      cache = newLru()
      perSpec.put(specKey, cache)
    }
    val hit = cache.get(xml)
    if (hit != null || cache.containsKey(xml)) hit
    else {
      val res = build(XmlStax.children(xml, patterns, fromRoot, specKey,
        needOuter, needValue))
      cache.put(xml, res)
      res
    }
  }

  // pruned outer/value fields are "" for every child — share one constant
  private def utf8(s: String): UTF8String =
    if (s.isEmpty) UTF8String.EMPTY_UTF8 else UTF8String.fromString(s)

  // attribute-less children (the common case) share one immutable empty map
  private val emptyMap = new ArrayBasedMapData(
    new GenericArrayData(Array.empty[Any]),
    new GenericArrayData(Array.empty[Any]))

  /** One Child as the `elemType` struct row (shared by the array builder
    * and the first-match expression). */
  def buildChildRow(c: XmlStax.Child): InternalRow = {
    val attrs = if (c.attrs.isEmpty) emptyMap else {
      val n = c.attrs.length
      val ks = new Array[Any](n)
      val vs = new Array[Any](n)
      var j = 0
      while (j < n) {
        val a = c.attrs(j)
        ks(j) = UTF8String.fromString(a._1)
        vs(j) = UTF8String.fromString(a._2)
        j += 1
      }
      new ArrayBasedMapData(new GenericArrayData(ks),
        new GenericArrayData(vs))
    }
    // direct GenericInternalRow: InternalRow.apply boxes through a varargs
    // Seq per child, measurable on million-child explodes
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(c.tag), utf8(c.outer),
        utf8(c.value), attrs))
  }

  private def build(res: Seq[XmlStax.Child]): ArrayData = {
    if (res == null) return null
    val out = new Array[Any](res.length)
    var i = 0
    while (i < res.length) {
      out(i) = buildChildRow(res(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static evaluator for [[XmlChildrenAtExpr]] — same ArrayData memo,
    * container-prefixed key. */
  def evalJavaAt(input: UTF8String, container: String,
      patterns: Seq[String], specKey: String, needOuter: Boolean,
      needValue: Boolean): ArrayData = {
    val fast = XmlFastScan.childrenAt(input, container, patterns, specKey,
      needOuter, needValue)
    if (!(fast eq XmlFastScan.Bail)) return fast.asInstanceOf[ArrayData]
    val xml = input.toString
    val perSpec = memo.get()
    var cache = perSpec.get(specKey)
    if (cache == null) {
      cache = newLru()
      perSpec.put(specKey, cache)
    }
    val hit = cache.get(xml)
    if (hit != null || cache.containsKey(xml)) hit
    else {
      val res = build(XmlStax.childrenAt(xml, container, patterns, specKey,
        needOuter, needValue))
      cache.put(xml, res)
      res
    }
  }
}

/** Fused container descent ([[XmlStax.childrenAt]]): matching children of
  * the first depth-1 child named `container`, extracted in ONE StAX pass
  * over the document. Replaces the two-pass
  * `xml_children(first_child(doc, container).xml, patterns)` shape, whose
  * intermediate step serializes the container's outer XML only to
  * re-tokenize it — the dominant cost of the nested-array bind (x3).
  * Null when the container is absent or the document malformed (the
  * two-pass form's semantics exactly). */
case class XmlChildrenAtExpr(child: Expression, container: String,
    patterns: Seq[String], needOuter: Boolean = true,
    needValue: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = XmlChildrenExpr.outType
  override def nullable: Boolean = true
  override def prettyName: String = "xml_children_at"

  @transient private lazy val specKey: String =
    "at:" + container + ":" +
      XmlStax.specKey(patterns, fromRoot = true, needOuter, needValue)

  override def nullSafeEval(input: Any): Any =
    XmlChildrenExpr.evalJavaAt(input.asInstanceOf[UTF8String], container,
      patterns, specKey, needOuter, needValue)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cont = ctx.addReferenceObj("container", container, "java.lang.String")
    val pats = ctx.addReferenceObj("patterns", patterns,
      "scala.collection.immutable.Seq")
    val key = ctx.addReferenceObj("specKey", specKey, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.xml.XmlChildrenExpr.evalJavaAt($c, $cont,
         |  $pats, $key, $needOuter, $needValue);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First matching depth-1 child of an XML string as a nullable
  * `struct<tag,xml,value,attrs>` — the codegen'd form of
  * `get(filter(xml_children(x), ch => activeCond(name, ch.tag)), 0)`.
  *
  * The HOF form evaluates INTERPRETED (higher-order functions are
  * CodegenFallback) and materializes the filtered array per member
  * expression; this expression linear-scans the memoized StAX extraction
  * (same per-thread cache as [[XmlChildrenExpr]], so N members on one row
  * still parse once) and builds ONE struct for the winner. Dispatch is the
  * reference's (Parser.cs:166-187): an exact `memberName` matches by
  * equality; a glob member matches `prefix*suffix` minus any tag claimed
  * by an exact member or by a LATER-registered glob (last-glob-wins). */
case class XmlFirstChildExpr(child: Expression, capturePatterns: Seq[String],
    fromRoot: Boolean, memberName: String, exactNames: Seq[String],
    laterGlobs: Seq[String], needOuter: Boolean = true,
    needValue: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = XmlChildrenExpr.elemType
  override def nullable: Boolean = true
  override def prettyName: String = "xml_first_child"

  @transient private lazy val specKey: String =
    XmlStax.specKey(capturePatterns, fromRoot, needOuter, needValue)
  @transient private lazy val exactSet: Set[String] = exactNames.toSet
  @transient private lazy val selfGlob: Option[XmlStax.Glob] =
    if (memberName.contains("*")) {
      val i = memberName.indexOf('*')
      Some(XmlStax.Glob(memberName.substring(0, i),
        memberName.substring(i + 1)))
    } else None
  @transient private lazy val laterCompiled: Seq[XmlStax.Glob] =
    laterGlobs.map { g =>
      val i = g.indexOf('*')
      XmlStax.Glob(g.substring(0, i), g.substring(i + 1))
    }

  private def matches(tag: String): Boolean = selfGlob match {
    case None => tag == memberName
    case Some(g) => g.matches(tag) && !exactSet.contains(tag) &&
      !laterCompiled.exists(_.matches(tag))
  }

  /** Instance evaluator referenced directly from the generated code. */
  def firstChild(input: UTF8String): InternalRow = {
    val fast = XmlFastScan.children(input, capturePatterns, specKey,
      fromRoot, needOuter, needValue)
    if (!(fast eq XmlFastScan.Bail)) {
      val arr = fast.asInstanceOf[org.apache.spark.sql.catalyst.util
        .GenericArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.array(i).asInstanceOf[InternalRow]
        if (matches(row.getUTF8String(0).toString)) return row
        i += 1
      }
      return null
    }
    val kids = XmlStax.children(input.toString, capturePatterns, fromRoot,
      specKey, needOuter, needValue)
    if (kids == null) return null
    var i = 0
    while (i < kids.length) {
      if (matches(kids(i).tag))
        return XmlChildrenExpr.buildChildRow(kids(i))
      i += 1
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    firstChild(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("expr", this,
      "graft.xml.XmlFirstChildExpr")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $self.firstChild($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reference `StringParser` semantics over a whole element string. */
case class XmlElementValueExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "xml_element_value"
  override def nullSafeEval(input: Any): Any =
    XmlElementValueExpr.evalJava(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.xml.XmlElementValueExpr.evalJava($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XmlElementValueExpr {
  def evalJava(input: UTF8String): UTF8String = {
    val v = XmlStax.elementValue(input.toString)
    if (v == null) null else UTF8String.fromString(v)
  }
}

object XmlFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API over [[XmlChildrenExpr]]. needOuter/needValue prune the
    * per-child `xml`/`value` serialization (pruned fields read as "") —
    * pass false only when nothing downstream reads the field. */
  def xml_children(c: Column, patterns: Seq[String], fromRoot: Boolean,
      needOuter: Boolean = true, needValue: Boolean = true): Column =
    ColumnBridge.column(
      XmlChildrenExpr(ColumnBridge.expression(c), patterns, fromRoot,
        needOuter, needValue))

  def xml_element_value(c: Column): Column =
    ColumnBridge.column(XmlElementValueExpr(ColumnBridge.expression(c)))

  /** Column API over [[XmlChildrenAtExpr]] — fused container descent. */
  def xml_children_at(c: Column, container: String, patterns: Seq[String],
      needOuter: Boolean = true, needValue: Boolean = true): Column =
    ColumnBridge.column(
      XmlChildrenAtExpr(ColumnBridge.expression(c), container, patterns,
        needOuter, needValue))
}
