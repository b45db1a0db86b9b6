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

  /** Exact-substring duplicate-span REMOVAL (the rewrite Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", actually
    * apply to C4/RealNews — t22 computes the per-doc duplicate-gram
    * SCORE; this drops the duplicated spans and keeps the rest of the
    * document): every overlapping `n`-token gram that already occurred
    * earlier in the corpus (first occurrence in (doc_id, pos) order wins,
    * the d19 keeper rule — so one copy of every duplicated passage
    * SURVIVES) marks its token range [pos, pos+n-1] for removal; per
    * document the marked ranges merge (gaps-and-islands over token
    * positions, overlapping-or-adjacent intervals coalesce) and the
    * document is rebuilt from its uncovered tokens in order. A document
    * fully covered by duplicates surfaces with EMPTY text rather than
    * vanishing (the d19 precedent — downstream filters must see the
    * drop).
    *
    * Scale shape: the tokenize+explode+hash occurrence table — the
    * expensive part — is scratch-materialized once for its two consumers
    * (keeper election and the probe side of the join back). Grams travel
    * as 32-bit portable hashes, never strings (hash collisions are part
    * of the definition, as in t22). Keeper election is `min(struct)` —
    * a partial-aggregating shuffle on the gram hash, never a corpus-wide
    * window; the interval merge windows are partitioned BY DOC (a
    * document's duplicate spans, result-sized), so no global sort
    * exists anywhere. The rebuild is one `filter(transform(...))` over
    * the token array with the doc's merged spans riding as a
    * result-sized array column — pure codegen, no UDF.
    *
    * Output: (doc_id, text_clean, n_tokens, n_removed, n_spans). */
  def spanDedup(df: DataFrame, text: Column, id: Column,
      n: Int): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val occ = graft.Tables.stage(
      df.select(id.as("doc_id"),
          posexplode(Text.wordGrams(text, n)).as(Seq("pos", "__g")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          graft.functions.Hashing.portableHash32(col("__g")).as("__gh")),
      "graft-spandedup-occ")
    val keeper = occ.groupBy(col("__gh"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__k"))
    val dup = occ.join(keeper, "__gh")
      .filter(!(col("doc_id") === col("__k.doc_id") &&
        col("pos") === col("__k.pos")))
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + (n - 1)).as("e"))
    val byDoc = Window.partitionBy("doc_id").orderBy("s")
    val prevEnd = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = dup
      .withColumn("__new",
        when(prevEnd.isNull || col("s") > prevEnd + 1, 1).otherwise(0))
      .withColumn("__gid", sum(col("__new"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__gid"))
      .agg(min(col("s")).as("s0"), max(col("e")).as("e0"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s0"), col("e0"))))
        .as("spans"))
    df.select(id.as("doc_id"), Text.tokens(text).as("__toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        expr("CAST(array() AS array<struct<s0: bigint, e0: bigint>>)")))
      .withColumn("__kept", expr(
        "filter(transform(__toks, (t, i) -> " +
          "CASE WHEN exists(spans, p -> i >= p.s0 AND i <= p.e0) " +
          "THEN NULL ELSE t END), x -> x IS NOT NULL)"))
      .select(col("doc_id"),
        concat_ws(" ", col("__kept")).as("text_clean"),
        size(col("__toks")).as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).as("n_removed"),
        size(col("spans")).as("n_spans"))
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
