package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the glue of a RAG retrieval stack: a lexical
  * ranker (BM25, t13) and a dense ranker (embedding cosine, a1/a6) each
  * produce a top-N candidate list; reciprocal rank fusion (Cormack,
  * Clarke, Büttcher, SIGIR 2009) combines them without score calibration,
  * which is the reason it won TREC fusion tracks: ranks are comparable
  * across systems even when raw scores are not.
  *
  * Scale shape: the expensive work — scoring the corpus — happens inside
  * each upstream ranker, which at 100 TB is the distributed BM25 posting
  * aggregation (t13) and the bucketed ANN join (a6/a7); what reaches the
  * fusion is each system's RESULT-SIZED top-N list. Fusing N-row lists is
  * a join of tiny frames (Spark broadcasts them); the fold over systems
  * is left-to-right, so the double adds replay identically in any engine.
  * For a multi-query batch, fuse on (qid, doc_id) and rank per qid — the
  * join stays an equi-join, just on a wider key.
  */
object Retrieval {

  /** Fuse ranked candidate lists by reciprocal rank.
    *
    * @param systems ordered (name, df) pairs; each df has `doc_id` and
    *                `rank` (1-based position in that system's list; each
    *                doc at most once per system), plus the `queryKeys`
    *                columns when fusing a multi-query batch
    * @param k       the RRF damping constant (60 in the paper: makes the
    *                fused score robust to outlier top ranks)
    * @param topK    fused list depth (per query when `queryKeys` is set)
    * @param queryKeys batch mode: per-system ranks are per-query, the
    *                join key widens to (queryKeys..., doc_id), and topK
    *                applies per query via a rank window partitioned on
    *                the query keys — the "10M queries" form stays one
    *                equi-join + one partitioned window, no global sort
    * @return (queryKeys..., doc_id, <name>_rank ... per system in order,
    *         rrf) ordered by (rrf DESC, doc_id) within a query; a doc
    *         absent from a system has a null rank there and contributes
    *         0 from it
    */
  def rrfFuse(systems: Seq[(String, DataFrame)], k: Int = 60,
      topK: Int = 10, queryKeys: Seq[String] = Nil): DataFrame = {
    require(systems.nonEmpty, "need at least one ranked system")
    val keys = queryKeys :+ "doc_id"
    val renamed = systems.map { case (n, df) =>
      n -> df.select(keys.map(col) :+
        col("rank").cast("int").as(s"${n}_rank"): _*)
    }
    val joined = renamed.map(_._2)
      .reduce((a, b) => a.join(b, keys, "full_outer"))
    // left-to-right add order over systems — the oracle's fold
    val score = renamed.map { case (n, _) =>
      coalesce(lit(1.0) / (lit(k).cast("double") +
        col(s"${n}_rank").cast("double")), lit(0.0))
    }.reduceLeft(_ + _)
    val scored = joined.withColumn("rrf", score)
    if (queryKeys.isEmpty) {
      scored.orderBy(col("rrf").desc, col("doc_id")).limit(topK)
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(queryKeys.map(col): _*)
        .orderBy(col("rrf").desc, col("doc_id"))
      scored.withColumn("__r", org.apache.spark.sql.functions.row_number()
          .over(w))
        .filter(col("__r") <= topK).drop("__r")
    }
  }
}
