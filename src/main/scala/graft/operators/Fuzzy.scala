package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching via q-gram blocking — entity resolution ("are
  * these two names the same thing?") without the all-pairs join that is
  * impossible at scale.
  *
  * Shape: explode each distinct name into its character q-grams, self-join
  * on the gram (only names sharing at least one gram ever meet — the
  * blocking step), dedup the candidate pairs, then confirm with an exact
  * Levenshtein threshold. Cost is Σ bucket² over gram buckets instead of
  * N² — the same candidates-then-confirm discipline as the MinHash/LSH
  * dedup family ([[Dedup]]), with q-grams as the blocking key instead of
  * hashed shingles. Matching runs on the DISTINCT name vocabulary, which
  * is orders of magnitude smaller than the row count at 100 TB.
  *
  * Recall caveat (documented, standard): a pair at edit distance d is
  * guaranteed to share a q-gram only when max(|a|,|b|) ≥ q·(d+1); q = 3
  * with threshold 3 on short names is a heuristic block, and the oracle
  * replays the SAME blocking, so the gate pins the implemented semantics.
  */
object Fuzzy {

  /** Character q-grams of a string column (positional, duplicates kept —
    * blocking only needs membership; empty array below length q).
    * Codegen-friendly: `transform(sequence(...), substr)`, no UDF. Note
    * Spark's `sequence(1, n)` counts DOWN when n < 1, hence the guard. */
  def qgrams(c: Column, q: Int): Column =
    when(length(c) < q, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(c) - (q - 1)),
        i => c.substr(i, lit(q))))

  /** Matched pairs of DISTINCT values of `column` in `df` with
    * levenshtein ≤ maxDist, q-gram blocked. Output: (name1, name2, dist),
    * name1 < name2, each pair once.
    *
    * `maxGramBucket` hard-caps pathological gram buckets — "stop-grams"
    * shared by huge fractions of the vocabulary (think "ing", " co") whose
    * buckets would dominate Σ bucket²: any gram held by more than
    * `maxGramBucket` names is dropped from blocking, the same explicit
    * recall/cost trade as the LSH families' `maxBucket` ([[Dedup]]). The
    * count rides the same gram partitioning the self-join needs, so the
    * cap adds no extra shuffle. */
  def fuzzyPairs(df: DataFrame, column: String, q: Int, maxDist: Int,
      maxGramBucket: Long = Long.MaxValue): DataFrame = {
    require(q >= 1 && maxDist >= 0, "q >= 1, maxDist >= 0")
    val names = df.select(col(column).as("name")).distinct()
    val grams = names
      .select(col("name"), explode(qgrams(col("name"), q)).as("gram"))
      .distinct() // one (name, gram) membership row per pair
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    // staged: the self-join consumes it twice — one qgram explode pass,
    // not one per side
    val capped = graft.Tables.stage(
      if (maxGramBucket == Long.MaxValue) grams
      else grams.withColumn("__gc", count(lit(1)).over(w))
        .filter(col("__gc") <= maxGramBucket).drop("__gc"),
      "graft-fuzzy-grams")
    val cands = capped.as("a")
      .join(capped.as("b"), col("a.gram") === col("b.gram") &&
        col("a.name") < col("b.name"))
      .select(col("a.name").as("name1"), col("b.name").as("name2"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("name1"), col("name2")))
      .filter(col("dist") <= maxDist)
  }
}
