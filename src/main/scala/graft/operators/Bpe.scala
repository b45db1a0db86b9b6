package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — learning the merge list itself, the step that
  * turns a raw corpus into a subword tokenizer (t14/Vocab assume the vocab
  * already exists; this builds it).
  *
  * Scale shape (how real distributed BPE trainers work):
  *   1. ONE corpus-scale pass: pre-tokenize to words and aggregate a
  *      (word, freq) histogram — the only shuffle whose size tracks the
  *      corpus. From here on everything runs over the histogram, whose row
  *      count is the natural-language vocabulary (~1e6-1e8 rows at 100 TB),
  *      never the corpus.
  *   2. Bounded merge rounds over the cached histogram. Each round is
  *      (a) a map-side pair-extraction + one partial-agg shuffle to count
  *      adjacent symbol pairs weighted by word frequency, (b) a SINGLE-ROW
  *      driver collect of the argmax pair (orderBy+limit(1) plans as
  *      TakeOrdered — per-partition top-1, no global sort shuffle), and
  *      (c) a map-side string replace applying the merge. The per-round
  *      driver traffic is one row — the same config-sized-collect
  *      discipline as Ann's centroids.
  *
  * Symbol sequences are encoded as delimiter-wrapped strings
  * ("low" -> "|l||o||w|"): every symbol sits in its own "|...|" frame, so
  * applying merge (l,o) is the plain left-to-right non-overlapping string
  * replace "|l||o|" -> "|lo|" — exactly BPE's greedy left-to-right merge
  * order ("|l||l||l|" -> "|ll||l|"), with no ambiguity when one symbol is
  * a prefix of another. Java's `replace` and DuckDB's `replace` share
  * these semantics, so the oracle replays training verbatim in SQL.
  *
  * Training is restricted to alphabetic words (the classic BPE-on-letters
  * setup) so the corpus can never contain the "|" delimiter.
  *
  * Pair counting is the standard overlapping count (positions (i,i+1) for
  * all i): "lll" contributes 2 to (l,l) even though one application merges
  * only once — counts rank candidates, they are not application counts.
  * Ties break deterministically: count DESC, then (lhs, rhs) ASC.
  */
object Bpe {

  /** Wrap every character in its own delimiter frame: "low" -> "|l||o||w|". */
  private def initSymbols(word: Column): Column =
    regexp_replace(word, "(.)", "|$1|")

  /** "|l||o||w|" -> ["l","o","w"]. */
  private def symbols(sym: Column): Column =
    split(sym.substr(lit(2), length(sym) - 2), "\\|\\|")

  /** (word, freq) histogram of alphabetic words — the one corpus-scale job. */
  def wordHistogram(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(regexp_extract_all(textCol,
        lit("[A-Za-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` BPE merges. Returns one row per learned merge
    * (merge_rank, lhs, rhs, n = weighted pair count at selection time) plus
    * a trailing summary row (merge_rank = numMerges+1, lhs = "&lt;corpus&gt;")
    * whose n is the total corpus token count AFTER all merges — the encoded
    * output folded into the same verifiable table. */
  def trainMerges(docs: DataFrame, textCol: Column,
      numMerges: Int): DataFrame = {
    val sp = docs.sparkSession
    val hist = wordHistogram(docs, textCol)
      .withColumn("sym", initSymbols(col("word")))
      .select("freq", "sym")
      .cache() // vocab-sized, reused every round

    val merges = scala.collection.mutable.ArrayBuffer.empty[
      (Int, String, String, Long)]
    var cur = hist
    var exhausted = false
    for (r <- 1 to numMerges if !exhausted) {
      val syms = symbols(col("sym"))
      // adjacent pairs; single-symbol words contribute nothing (sequence()
      // would run DESCENDING for size=1, so the guard is load-bearing)
      val pairs = when(size(syms) >= 2,
        transform(sequence(lit(1), size(syms) - 1), i =>
          struct(element_at(syms, i).as("lhs"),
            element_at(syms, i + 1).as("rhs"))))
        .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))
      val best = cur.select(col("freq"), explode(pairs).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect() // argmax: ONE row to the driver per round
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, rt, n) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((r, l, rt, n))
        cur = cur.withColumn("sym",
          replace(col("sym"), lit(s"|$l||$rt|"), lit(s"|$l$rt|")))
      }
    }
    val corpusTokens = cur
      .select(sum(col("freq") * size(symbols(col("sym")))).as("t"))
      .collect()(0).getLong(0)
    hist.unpersist()
    val rows = merges.toSeq :+
      ((merges.length + 1, "<corpus>", "", corpusTokens))
    import sp.implicits._
    rows.toDF("merge_rank", "lhs", "rhs", "n").orderBy("merge_rank")
  }

  /** DuckDB replay of [[trainMerges]]: a generated K-round CTE chain —
    * per round, pair counts from the current symbol table, a LIMIT-1
    * argmax, and the same delimiter-framed replace. */
  def trainMergesSql(numMerges: Int): String = {
    val init =
      """WITH s0 AS MATERIALIZED (
        |  SELECT SUM(freq) AS freq,
        |         regexp_replace(word, '(.)', '|\1|', 'g') AS sym
        |  FROM (SELECT word, count(*)::BIGINT AS freq FROM (
        |          SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS word
        |          FROM documents) GROUP BY word)
        |  GROUP BY sym)""".stripMargin
    // GROUP BY sym above is a no-op fold (word<->sym is 1:1) that keeps the
    // CTE single-purpose; freq arithmetic identical to Spark's histogram.
    val rounds = (1 to numMerges).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT pr[1] AS lhs, pr[2] AS rhs, SUM(freq)::BIGINT AS n
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(syms)),
         |                i -> [syms[i], syms[i+1]])) AS pr
         |        FROM (SELECT freq,
         |                string_split(substr(sym, 2, length(sym)-2), '||') AS syms
         |              FROM $prev))
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT lhs, rhs, n FROM p$r ORDER BY n DESC, lhs, rhs LIMIT 1),
         |s$r AS MATERIALIZED (
         |  SELECT freq, replace(sym,
         |    '|' || (SELECT lhs FROM b$r) || '||' || (SELECT rhs FROM b$r) || '|',
         |    '|' || (SELECT lhs FROM b$r) || (SELECT rhs FROM b$r) || '|') AS sym
         |  FROM $prev)""".stripMargin
    }
    val mergeRows = (1 to numMerges).map { r =>
      s"SELECT $r AS merge_rank, lhs, rhs, n FROM b$r"
    }
    val corpusRow =
      s"""SELECT ${numMerges + 1} AS merge_rank, '<corpus>' AS lhs, '' AS rhs,
         |  (SELECT SUM(freq * len(string_split(substr(sym, 2, length(sym)-2), '||')))::BIGINT
         |   FROM s$numMerges) AS n""".stripMargin
    (Seq(init) ++ rounds).mkString(",\n") + "\n" +
      (mergeRows :+ corpusRow).mkString("\nUNION ALL\n") +
      "\nORDER BY merge_rank"
  }
}
