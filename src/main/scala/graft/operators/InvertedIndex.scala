package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the retrieval half of a
  * corpus pipeline (BM25 ranking lives in the t13 gate; this is the
  * index MATERIALIZATION and exact-phrase path).
  *
  * The index is kept at (token, doc_id) granularity: one row per posting,
  * positions as a doc-length-bounded int array. That IS the distributed
  * form — a stopword's posting list is millions of ROWS spread across
  * partitions, never one giant array in a single row (the
  * collect-everything-per-token shape dies on the first "the"). Partition
  * by token (or bucket it) and a term lookup is a partition-pruned scan;
  * phrase search never touches postings of terms outside the query.
  */
object InvertedIndex {

  /** One row per (token, doc): sorted occurrence positions + term
    * frequency. One explode + one (token, doc) hash-agg — positions
    * arrays are bounded by document length. */
  def build(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        posexplode(graft.functions.Text.tokens(text)).as(Seq("pos", "token")))
      .groupBy(col("token"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).cast("int").as("tf"))

  /** Exact phrase search over a positional index built by [[build]]:
    * returns (doc_id, n_matches) for documents containing the token
    * sequence `phrase` contiguously, with the occurrence count.
    *
    * Plan: filter the index to the query's terms (|phrase| single-token
    * lookups — with a token-partitioned index these are pruned scans),
    * then |phrase|-1 equi-joins on doc_id (posting-list-sized sides
    * only), then a codegen'd position intersection:
    * `size(filter(pos0, p -> array_contains(pos_i, p+i) for all i))`.
    * No shuffle carries anything bigger than the rarest term's postings
    * after the first semi-ish join. */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      index.filter(col("token") === lit(t))
        .select(col("doc_id"), col("positions").as(s"__p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, "doc_id"))
    val matches = phrase.indices.tail.foldLeft(col("__p0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"__p$i"), p + i))
    }
    joined.select(col("doc_id"), size(matches).cast("int").as("n_matches"))
      .filter(col("n_matches") > 0)
  }
}
