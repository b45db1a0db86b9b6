package graft.xml

import java.io.ByteArrayOutputStream

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader,
  TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable Hadoop input format that emits one record per `rowTag` XML
  * element — the distributed realization of the reference's file-glob
  * dispatch (Parser.cs:175-187) for specs the native XML source cannot
  * express (wildcard / custom members need the raw element text).
  *
  * Each split scans its byte range for `<rowTag` starts; a record whose
  * start tag begins before the split end is owned by that split, and its
  * capture may read past the split boundary (the standard text-split
  * contract, so a 100 TB directory splits into independent tasks with no
  * coordination). Same-name nested elements are depth-counted within a
  * record.
  *
  * Documented limits (shared with every byte-level rowTag splitter):
  *   - a `rowTag` start inside a comment or CDATA section is taken literally;
  *   - attribute values must not contain '>';
  *   - a rowTag element nested inside ANOTHER rowTag element is only handled
  *     within one split — records should not nest across split boundaries;
  *   - compressed files are read as a single split (not splittable).
  */
object XmlElementInputFormat {
  val RowTagKey = "graft.xml.read.rowtag"

  /** Guard against a missing close tag silently swallowing a whole file. */
  val MaxRecordBytes: Int = 128 * 1024 * 1024
}

final class XmlElementInputFormat extends FileInputFormat[LongWritable, Text] {
  override protected def isSplitable(ctx: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(ctx.getConfiguration).getCodec(file) == null

  override def createRecordReader(split: InputSplit,
      ctx: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new XmlElementRecordReader
}

final class XmlElementRecordReader extends RecordReader[LongWritable, Text] {

  private var in: java.io.InputStream = _
  private var pos: Long = 0L
  private var start: Long = 0L
  private var end: Long = 0L
  private var rowTag: Array[Byte] = _
  private val key = new LongWritable
  private val value = new Text
  private var done = false

  override def initialize(split: InputSplit, ctx: TaskAttemptContext): Unit = {
    val fsplit = split.asInstanceOf[FileSplit]
    start = fsplit.getStart
    end = start + fsplit.getLength
    val tag = ctx.getConfiguration.get(XmlElementInputFormat.RowTagKey)
    require(tag != null && tag.nonEmpty, "rowTag not set")
    rowTag = tag.getBytes("UTF-8")
    val file = fsplit.getPath
    val fs = file.getFileSystem(ctx.getConfiguration)
    val fsin = fs.open(file)
    fsin.seek(start)
    in = new java.io.BufferedInputStream(fsin, 64 * 1024)
    pos = start
  }

  private def read1(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  private def isDelim(c: Int): Boolean =
    c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Consume the rest of an open tag after `<rowTag` + `delim`; returns the
    * depth delta: +1 for an open element, 0 for self-closing `<rowTag .../>`.
    * (In-tag bytes are captured when `buf` is non-null.) */
  private def finishOpenTag(delim: Int, buf: ByteArrayOutputStream): Int = {
    if (delim == '>') return 1
    var prev = delim
    var c = read1()
    while (c != -1 && c != '>') {
      if (buf != null) buf.write(c)
      prev = c
      c = read1()
    }
    if (c == '>' && buf != null) buf.write('>')
    if (prev == '/') 0 else 1
  }

  /** Match `rowTag` bytes right after a consumed '<' (or "</"); returns the
    * first non-matching / post-tag byte, or Int.MinValue on a full match
    * (caller then reads the delimiter). Consumed bytes are captured when
    * `buf` is non-null. */
  private def matchTag(buf: ByteArrayOutputStream): Int = {
    var i = 0
    while (i < rowTag.length) {
      val c = read1()
      if (c == -1) return -1
      if (buf != null) buf.write(c)
      if (c != rowTag(i)) return c
      i += 1
    }
    Int.MinValue
  }

  override def nextKeyValue(): Boolean = {
    if (done) return false
    // ---- phase 1: find a record start owned by this split ----
    var recStart = -1L
    var delim = -1
    var c = read1()
    while (recStart < 0) {
      if (c == -1) { done = true; return false }
      if (c == '<') {
        val ltPos = pos - 1
        if (ltPos >= end) { done = true; return false }
        val m = matchTag(null)
        if (m == Int.MinValue) {
          val d = read1()
          if (isDelim(d)) { recStart = ltPos; delim = d }
          else c = d // e.g. <recs...> with rowTag rec — keep scanning
        } else c = m match {
          case -1 => -1
          case b  => if (b == '<') b else read1()
        }
      } else c = read1()
    }
    // ---- phase 2: capture through the matching close tag ----
    val buf = new ByteArrayOutputStream(8192)
    buf.write('<'); buf.write(rowTag); buf.write(delim)
    var depth = finishOpenTag(delim, buf)
    while (depth > 0) {
      if (buf.size() > XmlElementInputFormat.MaxRecordBytes)
        throw new java.io.IOException(
          s"graft.xml: record at offset $recStart exceeds " +
            s"${XmlElementInputFormat.MaxRecordBytes} bytes — missing " +
            s"</${new String(rowTag, "UTF-8")}>?")
      val b = read1()
      if (b == -1) { done = true; return false } // truncated trailing record
      buf.write(b)
      if (b == '<') {
        val b2 = read1()
        if (b2 == -1) { done = true; return false }
        buf.write(b2)
        if (b2 == '/') {
          if (matchTag(buf) == Int.MinValue) {
            val b3 = read1()
            if (b3 == -1) { done = true; return false }
            buf.write(b3)
            if (b3 == '>') depth -= 1
          }
        } else if (b2 == rowTag(0)) {
          // potential nested open tag; first byte already consumed
          var i = 1
          var ok = true
          while (ok && i < rowTag.length) {
            val cc = read1()
            if (cc == -1) { done = true; return false }
            buf.write(cc)
            if (cc != rowTag(i)) ok = false else i += 1
          }
          if (ok) {
            val d = read1()
            if (d == -1) { done = true; return false }
            buf.write(d)
            if (isDelim(d)) depth += finishOpenTag(d, buf)
          }
        }
      }
    }
    key.set(recStart)
    value.set(buf.toByteArray)
    true
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
