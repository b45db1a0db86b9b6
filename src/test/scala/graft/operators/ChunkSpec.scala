package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for segmenting/chunking: segment boundaries, the
  * keep-first election across documents (including a document whose every
  * segment first occurred elsewhere), and overlapping-window coverage
  * with a short tail. */
class ChunkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("segments: k-token blocks in document order, short tail kept") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Chunk.segments(df, col("text"), col("doc_id"), 2)
      .orderBy("seg_idx")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((0, "a b"), (1, "c d"), (2, "e")))
  }

  test("segmentDedup: first occurrence wins, docs reassemble in order") {
    import spark.implicits._
    // doc 1: [a b, c d]; doc 2: [c d, e f]  (c d repeats -> doc 2 loses it)
    // doc 3: [a b, c d]  -> loses everything, must still appear (empty)
    val df = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val got = Chunk.segmentDedup(df, col("text"), col("doc_id"), 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, "a b c d", 2, 0),
      (2L, "e f", 1, 1),
      (3L, "", 0, 2)))
  }

  test("segmentDedup: repeat within one document keeps only the first") {
    import spark.implicits._
    val df = Seq((7L, "x y x y z z")).toDF("doc_id", "text")
    val got = Chunk.segmentDedup(df, col("text"), col("doc_id"), 2)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3))).head
    assert(got == ("x y z z", 2, 1))
  }

  test("overlapping: stride coverage, shared prefix, short tail") {
    import spark.implicits._
    // 7 tokens, w=4, s=2 -> chunks at 0,2,4: sizes 4,4,3
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunk.overlapping(df, col("text"), col("doc_id"), 4, 2)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq(
      (0, 4, "a b c d"), (1, 4, "c d e f"), (2, 3, "e f g")))
  }

  test("overlapping: doc shorter than one window emits exactly one chunk") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = Chunk.overlapping(df, col("text"), col("doc_id"), 4, 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq((0, 2, "a b")))
  }
}
