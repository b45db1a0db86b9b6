package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch functions.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment — a real deployment swaps `decodeBlob` for a codec call); the
  * Spark-side contract — schema, binary payload transport, partition-batch
  * iteration, deterministic output — is real and exercised by the gate.
  *
  * Scale: blobs ride in parquet binary columns (no base64 inflation);
  * decode is mapPartitions so codec contexts initialize once per partition,
  * not per row — the pattern that matters at 100 TB where codec setup
  * dominates row-at-a-time UDFs.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], fmt: String,
      frame_size: Int)
  case class DecodedRow(doc_id: Long, n_bytes: Long, header_sum: Long,
      n_frames: Int, fmt: String)

  /** Attach a binary media column + metadata to the documents table (the
    * corpus-building step; here the bytes are the utf-8 text itself). */
  def attachBlobs(documents: DataFrame, frameSize: Int): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      lit("fake/raw").as("fmt"),
      lit(frameSize).as("frame_size"))

  /** STUB decode: a real implementation would hand `media` to an image /
    * audio codec here. The stub derives deterministic features (byte count,
    * 16-byte header checksum, frame count) so the pipeline shape — including
    * per-partition batching — is verifiable end to end. */
  def decodeBlob(b: MediaRow): DecodedRow = {
    val header = b.media.take(16)
    DecodedRow(
      doc_id = b.doc_id,
      n_bytes = b.media.length.toLong,
      header_sum = header.foldLeft(0L)((acc, x) => acc + (x & 0xff)),
      n_frames = (b.media.length + b.frame_size - 1) / b.frame_size,
      fmt = b.fmt)
  }

  /** Batch decode over partitions (codec init once per partition). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // real codecs would initialize their context here, once
      it.map(decodeBlob)
    }
  }

  case class ResizedRow(doc_id: Long, media: Array[Byte], fmt: String,
      width: Int, height: Int)

  /** STUB resize: a real implementation calls an image library; the stub
    * deterministically truncates/pads the payload to width*height bytes so
    * schema, batching, and payload transport are exercised. */
  def resize(spark: SparkSession, media: DataFrame, width: Int,
      height: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val target = width * height
      it.map { b =>
        val out = java.util.Arrays.copyOf(b.media, target)
        ResizedRow(b.doc_id, out, b.fmt, width, height)
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling (video-style): emit every `stride`-th frame_size
    * slice of the payload — one output row per sampled frame. A real
    * implementation would seek keyframes via the container format. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { b =>
        val n = (b.media.length + b.frame_size - 1) / b.frame_size
        (0 until n by stride).iterator.map { f =>
          val from = f * b.frame_size
          val until = math.min(from + b.frame_size, b.media.length)
          FrameRow(b.doc_id, f,
            java.util.Arrays.copyOfRange(b.media, from, until))
        }
      }
    }
  }
}
