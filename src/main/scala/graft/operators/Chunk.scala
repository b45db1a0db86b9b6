package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Segmenting and chunking operators for training-data pipelines:
  * fixed-width segment (paragraph-level) dedup with document reassembly,
  * and overlapping sliding-window chunking for RAG / pretraining context
  * packing.
  *
  * Scale design: all token slicing happens map-side inside whole-stage
  * codegen (split + transform + slice + posexplode — no UDFs, no window
  * over the corpus). Segment dedup shuffles twice, both on high-cardinality
  * keys: once on the segment text (keeper election via min(struct)) and
  * once on doc_id (reassembly). A corpus-wide window over segments would
  * serialize on a global sort; the groupBy form partial-aggregates
  * map-side and scales linearly.
  */
object Chunk {

  /** Non-overlapping k-token segments of a text column, in document
    * order: (doc_id, seg_idx, seg). The segment boundary plays the role
    * newline-delimited paragraphs play in a real corpus (the synthetic
    * `documents` table is single-line). The last segment may be short. */
  def segments(df: DataFrame, text: Column, id: Column, k: Int): DataFrame = {
    val toks = Text.tokens(text)
    val nseg = ceil(size(toks).cast("double") / k).cast("int")
    df.select(id.as("doc_id"),
        posexplode(transform(sequence(lit(0), greatest(nseg, lit(1)) - 1),
          i => array_join(slice(toks, i * k + 1, lit(k)), " "))))
      .select(col("doc_id"), col("pos").cast("int").as("seg_idx"),
        col("col").as("seg"))
  }

  /** Paragraph-level exact dedup (RefinedWeb/CCNet-style), on fixed
    * k-token segments: every distinct segment survives exactly once —
    * at its first occurrence in (doc_id, seg_idx) order — and each
    * document is reassembled from its surviving segments. Unlike
    * doc-level dedup (d1) this REMOVES repeated boilerplate *within*
    * otherwise-unique documents; unlike the dup-span measurement (t22)
    * it rewrites the corpus rather than scoring it.
    *
    * Keeper election is `min(struct(doc_id, seg_idx))` per segment — an
    * aggregation, not a corpus-wide window, so it partial-aggregates
    * map-side and shuffles each distinct segment once. Reassembly sorts
    * only within each document (array_sort over the collected
    * (seg_idx, seg) structs), so output is parallelism-deterministic.
    * A document whose every segment first appeared elsewhere comes back
    * with empty text and n_kept = 0 — it still appears (left join from
    * the per-doc totals), so downstream filters see the drop.
    *
    * Output: (doc_id, text_dedup, n_kept, n_dropped). */
  def segmentDedup(df: DataFrame, text: Column, id: Column,
      k: Int): DataFrame = {
    val segs = segments(df, text, id, k)
    val keep = segs.groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__k"))
    val kept = segs.join(keep, "seg")
      .filter(col("doc_id") === col("__k.doc_id") &&
        col("seg_idx") === col("__k.seg_idx"))
      .drop("__k")
    val totals = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_total"))
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x.getField("seg")), " ").as("text_dedup"),
        count(lit(1)).as("n_kept"))
    totals.join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).cast("int").as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).cast("int")
          .as("n_dropped"))
  }

  /** Overlapping sliding-window chunks — the RAG / pretraining context
    * shape: windows of `w` tokens advancing by stride `s` (< w ⇒
    * consecutive chunks share w - s tokens), every token covered, the
    * final chunk possibly short. Chunk count per doc is the closed-form
    * 1 + ⌈max(n - w, 0) / s⌉ so the expansion is computed per row inside
    * codegen — no join against a number table, no window.
    *
    * Output: (doc_id, chunk_id, n_tokens, chunk). */
  def overlapping(df: DataFrame, text: Column, id: Column, w: Int,
      s: Int): DataFrame = {
    require(s > 0 && w >= s, s"need 0 < stride <= width, got w=$w s=$s")
    val toks = Text.tokens(text)
    val n = size(toks)
    val nchunk =
      (floor((greatest(n - w, lit(0)) + lit(s - 1)).cast("double") / s)
        .cast("int") + 1)
    df.select(id.as("doc_id"),
        posexplode(transform(sequence(lit(0), nchunk - 1),
          i => slice(toks, i * s + 1, lit(w)))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        size(col("col")).cast("int").as("n_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }
}
