package graft.xml

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import java.io.StringReader
import scala.collection.mutable

/** Single-pass StAX child extraction — the JVM core behind the `xml_children`
  * Catalyst expression.
  *
  * Mirrors the reference engine's cursor loop (reference:
  * XmlStreamProcessor/Parser.cs:119-208): one forward pass, dispatch on
  * depth-1 child names (exact or `*`-glob, Parser.cs:166-187), skip unmatched
  * subtrees wholesale, O(depth) memory. Where the reference fills typed
  * slots, we emit `(tag, outerXml, value)` triples for Spark to project:
  *   - `tag`   — the child's local name (reference `INode.Tag()`,
  *               Parser.cs:402-405);
  *   - `outer` — re-serialized outer XML of the child, safely re-parsable by
  *               `from_xml` (escaped text/attrs, .NET-style `<t />` for empty
  *               elements);
  *   - `value` — the reference `StringParser` semantics (Parser.cs:34-56):
  *               unescaped direct text concatenated with serialized child
  *               elements, in document order.
  *
  * Internal DTD entities are expanded (reference Test1.cs:257); external
  * entity resolution is disabled (no XXE).
  */
object XmlStax {

  final case class Child(tag: String, outer: String, value: String,
      attrs: Seq[(String, String)])

  /** `prefix*suffix` glob per Parser.cs:175-187 (split on first '*',
    * startsWith && endsWith; bare "*" matches everything). */
  final case class Glob(prefix: String, suffix: String) {
    def matches(name: String): Boolean =
      name.startsWith(prefix) && name.endsWith(suffix)
  }

  def compilePatterns(patterns: Seq[String]): (Set[String], Seq[Glob]) = {
    val (globs, exacts) = patterns.partition(_.contains("*"))
    (exacts.toSet, globs.map { p =>
      val i = p.indexOf('*')
      Glob(p.substring(0, i), p.substring(i + 1))
    })
  }

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.IS_REPLACING_ENTITY_REFERENCES,
      java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f
  }

  /** Per-thread memo of recent extractions. A bound projection references
    * the same extraction from several member expressions (often under
    * conditional branches where Spark's codegen subexpression elimination
    * does not reach), so the same (row, patterns) pair is evaluated several
    * times back-to-back on one thread — this makes the repeats O(1) without
    * any cross-row or cross-thread state. */
  private final val MemoSlots = 8
  private val memo =
    new ThreadLocal[java.util.LinkedHashMap[(String, Seq[String], Boolean),
        Seq[Child]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[(String, Seq[String], Boolean),
            Seq[Child]](MemoSlots * 2, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(String, Seq[String], Boolean),
                Seq[Child]]): Boolean = size() > MemoSlots
        }
    }

  /** Extract matching depth-1 children of `xml`'s root element (fromRoot) or
    * of a rootless fragment. Empty `patterns` matches every child. Returns
    * null on malformed input (PERMISSIVE posture — the Spark layer turns that
    * into a null row value). Memoized per thread (see above).
    */
  def children(xml: String, patterns: Seq[String],
      fromRoot: Boolean): Seq[Child] = {
    val key = (xml, patterns, fromRoot)
    val cache = memo.get()
    val hit = cache.get(key)
    if (hit != null || cache.containsKey(key)) hit
    else {
      val res = childrenUncached(xml, patterns, fromRoot)
      cache.put(key, res)
      res
    }
  }

  private def childrenUncached(xml: String, patterns: Seq[String],
      fromRoot: Boolean): Seq[Child] = {
    val (exacts, globs) = compilePatterns(patterns)
    val all = patterns.isEmpty
    def hit(name: String): Boolean =
      all || exacts.contains(name) || globs.exists(_.matches(name))

    val source = if (fromRoot) xml else s"<graft-wrap>$xml</graft-wrap>"
    var reader: XMLStreamReader = null
    try {
      reader = factory.createXMLStreamReader(new StringReader(source))
      // advance to the root element
      while (reader.getEventType != XMLStreamConstants.START_ELEMENT &&
          reader.hasNext) reader.next()
      if (reader.getEventType != XMLStreamConstants.START_ELEMENT) return Nil
      val out = mutable.ArrayBuffer.empty[Child]
      // iterate the root's direct children
      var ev = reader.next()
      while (ev != XMLStreamConstants.END_ELEMENT &&
          ev != XMLStreamConstants.END_DOCUMENT) {
        if (ev == XMLStreamConstants.START_ELEMENT) {
          val name = reader.getLocalName
          if (hit(name)) out += captureChild(reader)
          else skipSubtree(reader)
        }
        ev = reader.next()
      }
      out.toSeq
    } catch {
      case _: Exception => null
    } finally {
      if (reader != null) try reader.close() catch { case _: Exception => }
    }
  }

  /** Skip the subtree of the element the reader is positioned on, leaving
    * the reader on its END_ELEMENT (≙ reader.Skip(), Parser.cs:194-202). */
  private def skipSubtree(reader: XMLStreamReader): Unit = {
    var depth = 0
    var done = false
    while (!done) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT =>
          if (depth == 0) done = true else depth -= 1
        case XMLStreamConstants.END_DOCUMENT => done = true
        case _ =>
      }
    }
  }

  /** Reference `StringParser` view of a whole element (text + serialized
    * children): parse `xml` as a document and return the value of its root.
    * Null on malformed input. */
  def elementValue(xml: String): String = {
    var reader: XMLStreamReader = null
    try {
      reader = factory.createXMLStreamReader(new StringReader(xml))
      while (reader.getEventType != XMLStreamConstants.START_ELEMENT &&
          reader.hasNext) reader.next()
      if (reader.getEventType != XMLStreamConstants.START_ELEMENT) return null
      captureChild(reader).value
    } catch {
      case _: Exception => null
    } finally {
      if (reader != null) try reader.close() catch { case _: Exception => }
    }
  }

  /** Reader positioned ON the child's START_ELEMENT; consumes exactly its
    * subtree (reader ends on the child's END_ELEMENT). Builds the serialized
    * outer form and the reference-String `value` (unescaped direct text +
    * .NET-style serialized depth-1 elements, Parser.cs:34-56) in ONE pass.
    */
  private def captureChild(reader: XMLStreamReader): Child = {
    val tag = reader.getLocalName
    // the child element's own attributes, captured in the same pass so
    // downstream attribute binds need no re-parse (local names, as the
    // reference's reader.GetAttribute does — Parser.cs:241-249)
    val ownAttrs = {
      val n = reader.getAttributeCount
      val b = mutable.ArrayBuffer.empty[(String, String)]
      var i = 0
      while (i < n) {
        b += ((reader.getAttributeLocalName(i), reader.getAttributeValue(i)))
        i += 1
      }
      b.toSeq
    }
    val outer = new StringBuilder
    val value = new StringBuilder
    var depth = 0 // nesting below the child element; 0 = directly inside it
    var pendingOuter = false
    var pendingValue = false

    def closeOuter(selfClose: Boolean): Unit = if (pendingOuter) {
      outer.append(if (selfClose) " />" else ">")
      pendingOuter = false
    }
    def closeValue(selfClose: Boolean): Unit = if (pendingValue) {
      value.append(if (selfClose) " />" else ">")
      pendingValue = false
    }
    def writeStart(toValue: Boolean): Unit = {
      closeOuter(selfClose = false)
      if (toValue) closeValue(selfClose = false)
      val name = reader.getName.toString
      outer.append('<').append(name)
      if (toValue) value.append('<').append(name)
      var i = 0
      while (i < reader.getAttributeCount) {
        val a = " " + reader.getAttributeName(i).toString + "=\"" +
          escapeAttr(reader.getAttributeValue(i)) + "\""
        outer.append(a)
        if (toValue) value.append(a)
        i += 1
      }
      pendingOuter = true
      if (toValue) pendingValue = true
    }

    writeStart(toValue = false) // the child element's own start tag
    var done = false
    while (!done) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          writeStart(toValue = true)
        case XMLStreamConstants.END_ELEMENT =>
          val wasPending = pendingOuter
          closeOuter(selfClose = true)
          if (!wasPending)
            outer.append("</").append(reader.getName.toString).append('>')
          if (depth == 0) done = true
          else {
            val wasPendingV = pendingValue
            closeValue(selfClose = true)
            if (!wasPendingV)
              value.append("</").append(reader.getName.toString).append('>')
            depth -= 1
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          closeOuter(selfClose = false)
          outer.append(escapeText(reader.getText))
          if (depth == 0) value.append(reader.getText) // unescaped direct text
          else {
            closeValue(selfClose = false)
            value.append(escapeText(reader.getText))
          }
        case XMLStreamConstants.END_DOCUMENT =>
          done = true
        case _ => // comments, PIs: ignored (reference Test1.cs:233-271)
      }
    }
    Child(tag, outer.toString, value.toString, ownAttrs)
  }

  private def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def escapeAttr(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
