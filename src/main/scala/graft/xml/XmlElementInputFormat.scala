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
  * record. `<!--...-->` comments and `<![CDATA[...]]>` sections are
  * recognized in both scan phases: a commented-out `<rowTag` does not start
  * a record, and a close tag inside a comment/CDATA does not end one.
  *
  * Documented limits (shared with every byte-level rowTag splitter):
  *   - attribute values must not contain '>';
  *   - a DOCTYPE internal subset (`<!DOCTYPE x [ ... ]>`) is skipped only to
  *     its first '>';
  *   - a rowTag element nested inside ANOTHER rowTag element is only handled
  *     within one split — records should not nest across split boundaries;
  *   - a comment/CDATA span is only honored within the split that sees its
  *     opening (a split boundary inside the span re-syncs at the next real
  *     record start);
  *   - compressed files are read as a single split (not splittable).
  */
object XmlElementInputFormat {
  val RowTagKey = "graft.xml.read.rowtag"

  /** Guard against a missing close tag silently swallowing a whole file. */
  val MaxRecordBytes: Int = 128 * 1024 * 1024
}

/** The scan state machine, shared by the Hadoop record reader (byte-range
  * splits), the `graft-xml` FileFormat
  * ([[org.apache.spark.sql.graft.XmlRowTagFileFormat]] — batch AND
  * streaming reads) and [[XmlRecordSplit]] (whole strings).
  * `read` supplies bytes (-1 = EOF); `pos` counts absolute consumed bytes
  * starting from `startPos`. */
final class XmlRecordScanner(read: () => Int,
    rowTag: Array[Byte], startPos: Long) {

  var pos: Long = startPos

  private def read1(): Int = {
    val b = read()
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

  /** Consume through `terminator` (already inside the construct). Captured
    * when `buf` is non-null. Returns false on EOF. KMP failure links keep
    * overlapping prefixes in sync (e.g. CDATA content "]]]>" must still
    * terminate on its trailing "]]>"). */
  private def skipUntil(terminator: Array[Byte],
      buf: ByteArrayOutputStream): Boolean = {
    val fail = new Array[Int](terminator.length)
    var k = 0
    var i = 1
    while (i < terminator.length) {
      while (k > 0 && terminator(i) != terminator(k)) k = fail(k - 1)
      if (terminator(i) == terminator(k)) k += 1
      fail(i) = k
      i += 1
    }
    var m = 0
    while (m < terminator.length) {
      val c = read1()
      if (c == -1) return false
      if (buf != null) buf.write(c)
      while (m > 0 && c != terminator(m)) m = fail(m - 1)
      if (c == terminator(m)) m += 1
    }
    true
  }

  private val CommentOpen = "!--".getBytes("US-ASCII")
  private val CdataOpen = "![CDATA[".getBytes("US-ASCII")
  private val CommentClose = "-->".getBytes("US-ASCII")
  private val CdataClose = "]]>".getBytes("US-ASCII")

  /** After a consumed "<!", classify + skip a comment (`<!--...-->`), CDATA
    * (`<![CDATA[...]]>`), or other markup declaration (to its first '>').
    * The leading '!' is NOT yet consumed — `first` is the byte after '<'.
    * Captured when `buf` is non-null. Returns false on EOF. */
  private def skipBang(buf: ByteArrayOutputStream): Boolean = {
    // match as much of "!--" / "![CDATA[" as possible; fall back to '>'
    var i = 1 // caller consumed '!' (position 0 of both opener patterns)
    var c = 0
    var isComment = true
    var isCdata = true
    while ((isComment && i < CommentOpen.length) ||
        (isCdata && i < CdataOpen.length)) {
      c = read1()
      if (c == -1) return false
      if (buf != null) buf.write(c)
      if (c == '>') return true // e.g. "<!>" — degenerate, done
      isComment = isComment && i < CommentOpen.length && c == CommentOpen(i)
      isCdata = isCdata && i < CdataOpen.length && c == CdataOpen(i)
      if (!isComment && !isCdata)
        return skipUntil(Array('>'.toByte), buf) // DOCTYPE etc.
      i += 1
    }
    if (isComment && i == CommentOpen.length) skipUntil(CommentClose, buf)
    else skipUntil(CdataClose, buf)
  }

  /** Next record whose `<rowTag` start lies strictly before `ownedEnd`
    * (absolute position), or null at EOF / ownership end / truncation. */
  def nextRecord(ownedEnd: Long): (Long, Array[Byte]) = {
    // ---- phase 1: find a record start owned by this range ----
    var recStart = -1L
    var delim = -1
    var c = read1()
    while (recStart < 0) {
      if (c == -1) return null
      if (c == '<') {
        val ltPos = pos - 1
        if (ltPos >= ownedEnd) return null
        val first = read1()
        if (first == '!') {
          // commented-out / CDATA'd rowTag text must not start a record
          if (!skipBang(null)) return null
          c = read1()
        } else if (first == '?') {
          if (!skipUntil("?>".getBytes("US-ASCII"), null)) return null
          c = read1()
        } else if (first == -1) return null
        else if (first == rowTag(0)) {
          val m = if (rowTag.length == 1) Int.MinValue else matchTagFrom(1)
          if (m == Int.MinValue) {
            val d = read1()
            if (isDelim(d)) { recStart = ltPos; delim = d }
            else c = d // e.g. <recs...> with rowTag rec — keep scanning
          } else c = m match {
            case -1 => -1
            case b  => if (b == '<') b else read1()
          }
        } else c = if (first == '<') first else read1()
      } else c = read1()
    }
    // ---- phase 2: capture through the matching close tag ----
    val buf = new ByteArrayOutputStream(8192)
    buf.write('<'); buf.write(rowTag, 0, rowTag.length); buf.write(delim)
    var depth = finishOpenTag(delim, buf)
    while (depth > 0) {
      if (buf.size() > XmlElementInputFormat.MaxRecordBytes)
        throw new java.io.IOException(
          s"graft.xml: record at offset $recStart exceeds " +
            s"${XmlElementInputFormat.MaxRecordBytes} bytes — missing " +
            s"</${new String(rowTag, "UTF-8")}>?")
      val b = read1()
      if (b == -1) return null // truncated trailing record
      buf.write(b)
      if (b == '<') {
        val b2 = read1()
        if (b2 == -1) return null
        buf.write(b2)
        if (b2 == '!') {
          // comment/CDATA content rides along uninterpreted: tags inside
          // must not bump the depth counter
          if (!skipBang(buf)) return null
        } else if (b2 == '/') {
          if (matchTag(buf) == Int.MinValue) {
            val b3 = read1()
            if (b3 == -1) return null
            buf.write(b3)
            if (b3 == '>') depth -= 1
          }
        } else if (b2 == rowTag(0)) {
          // potential nested open tag; first byte already consumed
          var i = 1
          var ok = true
          while (ok && i < rowTag.length) {
            val cc = read1()
            if (cc == -1) return null
            buf.write(cc)
            if (cc != rowTag(i)) ok = false else i += 1
          }
          if (ok) {
            val d = read1()
            if (d == -1) return null
            buf.write(d)
            if (isDelim(d)) depth += finishOpenTag(d, buf)
          }
        }
      }
    }
    (recStart, buf.toByteArray)
  }

  /** [[matchTag]] with the first `from` bytes already verified. */
  private def matchTagFrom(from: Int): Int = {
    var i = from
    while (i < rowTag.length) {
      val c = read1()
      if (c == -1) return -1
      if (c != rowTag(i)) return c
      i += 1
    }
    Int.MinValue
  }
}

/** Whole-string record splitting for the STREAMING read path: Structured
  * Streaming's file source delivers whole files (`text` + wholetext), and
  * this applies the exact same scan the batch input format runs over byte
  * ranges — one semantics, two transports. */
object XmlRecordSplit {
  def split(doc: String, rowTag: String): Seq[String] = {
    val in = new java.io.ByteArrayInputStream(doc.getBytes("UTF-8"))
    val sc = new XmlRecordScanner(() => in.read(),
      rowTag.getBytes("UTF-8"), 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var rec = sc.nextRecord(Long.MaxValue)
    while (rec != null) {
      out += new String(rec._2, "UTF-8")
      rec = sc.nextRecord(Long.MaxValue)
    }
    out.toSeq
  }
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
  private var scanner: XmlRecordScanner = _
  private var start: Long = 0L
  private var end: Long = 0L
  private val key = new LongWritable
  private val value = new Text
  private var done = false

  override def initialize(split: InputSplit, ctx: TaskAttemptContext): Unit = {
    val fsplit = split.asInstanceOf[FileSplit]
    start = fsplit.getStart
    end = start + fsplit.getLength
    val tag = ctx.getConfiguration.get(XmlElementInputFormat.RowTagKey)
    require(tag != null && tag.nonEmpty, "rowTag not set")
    val file = fsplit.getPath
    val fs = file.getFileSystem(ctx.getConfiguration)
    val fsin = fs.open(file)
    val codec = new CompressionCodecFactory(ctx.getConfiguration)
      .getCodec(file)
    if (codec != null) {
      // compressed file: isSplitable said no, so this single split covers
      // the whole file — scan the DECOMPRESSED stream from 0 to its end
      // (offsets/keys are decompressed-stream positions). Serial per file;
      // parallelism at scale comes from many files.
      start = 0L
      end = Long.MaxValue
      in = new java.io.BufferedInputStream(
        codec.createInputStream(fsin), 64 * 1024)
    } else {
      fsin.seek(start)
      in = new java.io.BufferedInputStream(fsin, 64 * 1024)
    }
    scanner = new XmlRecordScanner(() => in.read(),
      tag.getBytes("UTF-8"), start)
  }

  override def nextKeyValue(): Boolean = {
    if (done) return false
    scanner.nextRecord(end) match {
      case null =>
        done = true
        false
      case (recStart, bytes) =>
        key.set(recStart)
        value.set(bytes)
        true
    }
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (scanner.pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
