package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptContext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.{CodecStreams, OutputWriter}
import org.apache.spark.sql.types._

/** Row -> XML serializer behind the `graft-xml` write path (the reference
  * itself has no sink — Parser.cs:207 materializes an in-memory object —
  * so the mapping below is OURS, chosen to round-trip through the graft
  * read stack: [[XmlRowTagFileFormat]] splits files back into per-`rowTag`
  * records and the [[graft.xml.XmlParser]] DSL re-extracts every shape the
  * writer can emit).
  *
  * Mapping (schema-driven, no per-row reflection):
  *   - each row          -> `<rowTag> ... </rowTag>` on its own line (keeps
  *     files greppable and the read scan splittable: records never share a
  *     line with a root element, and no enclosing root is written unless
  *     `rootTag` is set — rootless files are exactly what the scanner's
  *     byte-range search handles best, reference Test1.cs:128-133 parses
  *     the same rootless shape);
  *   - scalar field      -> `<name>text</name>`; a NULL field is OMITTED,
  *     matching the parser's missing-element -> null contract;
  *   - struct field      -> nested element; fields named with
  *     `attributePrefix` (default `_`) become ATTRIBUTES on the enclosing
  *     element (`_id` -> `id='...'`), the DSL reads them via `attribute()`;
  *   - array field       -> the element REPEATS, one per entry, in array
  *     order (doc order is the array contract on read, Parser.cs:284-287);
  *     wrap the array in a single-field struct to get a container element
  *     (`struct(arr.as("item")).as("items")` -> `<items><item>..` which
  *     `a.array("items")(c => ...)` reads back); a null entry -> `<name/>`;
  *   - text is XML-escaped (`& < >`, plus `" '` inside attributes), so any
  *     string round-trips through the entity-decoding StAX reader;
  *   - timestamp -> `yyyy-MM-dd'T'HH:mm:ss[.ffffff]` UTC, date -> ISO,
  *     decimal -> plain string, binary -> base64 — each the form the
  *     corresponding reader cast parses.
  *
  * Scale: the writer is a straight per-partition streaming append — no
  * buffering beyond one row's StringBuilder, compression via the standard
  * codec stream, so N executors write N files exactly like text/csv/json.
  */
final class XmlOutputWriter(
    val path: String,
    dataSchema: StructType,
    rowTag: String,
    rootTag: Option[String],
    attrPrefix: String,
    context: TaskAttemptContext) extends OutputWriter {

  private val writer = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(
      CodecStreams.createOutputStream(context, new Path(path)),
      StandardCharsets.UTF_8), 64 * 1024)

  rootTag.foreach(r => writer.write(s"<$r>\n"))

  private val sb = new java.lang.StringBuilder(256)

  override def write(row: InternalRow): Unit = {
    sb.setLength(0)
    XmlOutputWriter.appendStruct(sb, rowTag, dataSchema, row, attrPrefix)
    sb.append('\n')
    writer.write(sb.toString)
  }

  override def close(): Unit = {
    rootTag.foreach(r => writer.write(s"</$r>\n"))
    writer.close()
  }
}

object XmlOutputWriter {

  /** Tag names the writer accepts: XML NameStartChar/NameChar subset. The
    * check runs once per schema in [[validateSchema]], not per row. */
  private val TagName = "^[A-Za-z_][A-Za-z0-9._-]*$".r

  /** Rejects schemas the XML mapping can't express, at plan time rather
    * than mid-write: bad element names, maps, nested arrays (an array
    * element that is itself an array has no tag to repeat — wrap the inner
    * array in a struct), and attribute-prefixed fields that aren't scalar. */
  def validateSchema(schema: StructType, attrPrefix: String): Unit = {
    def walkField(name: String, dt: DataType, inStruct: Boolean): Unit = {
      val attr = inStruct && name.startsWith(attrPrefix) &&
        name.length > attrPrefix.length
      val tag = if (attr) name.substring(attrPrefix.length) else name
      require(TagName.pattern.matcher(tag).matches(),
        s"graft-xml: field name '$name' is not a valid XML name")
      dt match {
        case st: StructType =>
          require(!attr, s"graft-xml: attribute field '$name' must be scalar")
          st.fields.foreach(f => walkField(f.name, f.dataType, inStruct = true))
        case ArrayType(et, _) =>
          require(!attr, s"graft-xml: attribute field '$name' must be scalar")
          et match {
            case _: ArrayType | _: MapType => require(false,
              s"graft-xml: array field '$name' has un-taggable element " +
                "type; wrap the inner collection in a struct")
            case st: StructType =>
              st.fields.foreach(f => walkField(f.name, f.dataType, true))
            case _ => ()
          }
        case _: MapType =>
          require(false, s"graft-xml: map field '$name' unsupported; " +
            "explode to an array of key/value structs")
        case _ => ()
      }
    }
    schema.fields.foreach(f => walkField(f.name, f.dataType, inStruct = true))
  }

  private def escapeText(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  private def escapeAttr(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '\'' => sb.append("&apos;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** Scalar value at `ordinal` rendered as the text the matching reader
    * cast parses back (XmlValues casts / DuckDB-compatible forms). */
  private def scalarText(dt: DataType, g: SpecializedGetters,
      ordinal: Int): String = dt match {
    case StringType => g.getUTF8String(ordinal).toString
    case IntegerType => java.lang.Integer.toString(g.getInt(ordinal))
    case LongType => java.lang.Long.toString(g.getLong(ordinal))
    case ShortType => java.lang.Short.toString(g.getShort(ordinal))
    case ByteType => java.lang.Byte.toString(g.getByte(ordinal))
    case DoubleType => java.lang.Double.toString(g.getDouble(ordinal))
    case FloatType => java.lang.Float.toString(g.getFloat(ordinal))
    case BooleanType => java.lang.Boolean.toString(g.getBoolean(ordinal))
    case d: DecimalType =>
      g.getDecimal(ordinal, d.precision, d.scale)
        .toJavaBigDecimal.toPlainString
    case DateType =>
      java.time.LocalDate.ofEpochDay(g.getInt(ordinal).toLong).toString
    case TimestampType =>
      // UTC ISO-8601; try_to_timestamp / DuckDB CAST parse it back
      java.time.LocalDateTime.ofInstant(
        DateTimeUtils.microsToInstant(g.getLong(ordinal)),
        java.time.ZoneOffset.UTC).toString
    case BinaryType =>
      java.util.Base64.getEncoder.encodeToString(g.getBinary(ordinal))
    case other =>
      throw new UnsupportedOperationException(
        s"graft-xml: cannot serialize $other")
  }

  /** One element named `tag` for the value at `ordinal` (repeats for
    * arrays). Nulls are handled by the CALLER (struct fields: omit; array
    * entries: `<tag/>`). */
  private def appendElement(sb: java.lang.StringBuilder, tag: String,
      dt: DataType, g: SpecializedGetters, ordinal: Int,
      attrPrefix: String): Unit = dt match {
    case st: StructType =>
      appendStruct(sb, tag, st, g.getStruct(ordinal, st.length), attrPrefix)
    case ArrayType(et, _) =>
      val arr = g.getArray(ordinal)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (arr.isNullAt(j)) sb.append('<').append(tag).append("/>")
        else appendElement(sb, tag, et, arr, j, attrPrefix)
        j += 1
      }
    case _ =>
      sb.append('<').append(tag).append('>')
      escapeText(sb, scalarText(dt, g, ordinal))
      sb.append("</").append(tag).append('>')
  }

  /** `<tag attr='..'>children</tag>`: attribute-prefixed scalar fields go
    * on the open tag, everything else nests; all-null/empty -> `<tag/>`. */
  private[graft] def appendStruct(sb: java.lang.StringBuilder, tag: String,
      st: StructType, row: SpecializedGetters, attrPrefix: String): Unit = {
    sb.append('<').append(tag)
    var i = 0
    val n = st.length
    while (i < n) {
      val f = st.fields(i)
      if (f.name.startsWith(attrPrefix) && f.name.length > attrPrefix.length
          && !row.isNullAt(i)) {
        sb.append(' ').append(f.name.substring(attrPrefix.length))
          .append("='")
        escapeAttr(sb, scalarText(f.dataType, row, i))
        sb.append('\'')
      }
      i += 1
    }
    val bodyStart = sb.length()
    sb.append('>')
    i = 0
    while (i < n) {
      val f = st.fields(i)
      if (!(f.name.startsWith(attrPrefix) && f.name.length > attrPrefix.length)
          && !row.isNullAt(i)) {
        appendElement(sb, f.name, f.dataType, row, i, attrPrefix)
      }
      i += 1
    }
    if (sb.length() == bodyStart + 1) {
      sb.setLength(bodyStart) // no children: self-close
      sb.append("/>")
    } else {
      sb.append("</").append(tag).append('>')
    }
  }
}
