package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression scale path for
  * embedding search: split the D-dim vector into M contiguous subspaces,
  * quantize each subvector to its nearest codeword from a per-subspace
  * codebook of K entries, and store M small codes (here ints; bytes in a
  * packed layout) instead of D floats — a D·4 / M byte compression
  * (64-dim float → 4 codes = 64× here). Queries score candidates with
  * ASYMMETRIC DISTANCE COMPUTATION (ADC): the query precomputes its exact
  * L2² distance to every codeword (M·K values, config-sized), and each
  * candidate's approximate distance is M table lookups + M-1 adds — no
  * per-pair float loops over D. Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011.
  *
  * Scale: encoding is ONE map-side pass (argmin over the driver-held
  * codebooks inside codegen — the [[Ann]] centroid discipline: codebooks
  * are config-sized, the corpus never joins them). ADC scoring
  * broadcasts only the query set's distance tables; the corpus side
  * streams its (id, codes) rows — the 100 TB working set is the code
  * table, 64× smaller than the raw embeddings.
  *
  * Determinism: distances fold left-to-right over subvector components
  * in pure double arithmetic (floats widen exactly), codeword ties break
  * toward the lower code id, so encode + ADC are bit-replayable in any
  * engine with the same fold order.
  */
object Pq {

  /** Collect codebooks (m, j, cvec) driver-side: map from subspace m to
    * its codewords ordered by code id j. Code ids must be 0..K-1 per
    * subspace (ADC distance tables are indexed by j). */
  private def codebookSeq(
      codebooks: DataFrame): Map[Int, IndexedSeq[(Int, IndexedSeq[Double])]] = {
    val rows = codebooks
      .select(col("m").cast("int"), col("j").cast("int"),
        transform(col("cvec"), x => x.cast("double")))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
    val byM = rows.groupBy(_._1).map { case (m, rs) =>
      val cws = rs.map(t => (t._2, t._3)).sortBy(_._1).toIndexedSeq
      require(cws.map(_._1) == (0 until cws.size),
        s"subspace $m code ids must be contiguous 0..K-1")
      m -> cws
    }
    require(byM.keys.toSeq.sorted == (0 until byM.size),
      "subspace ids must be contiguous 0..M-1")
    byM
  }

  /** Exact L2² between a subvector column and a literal codeword:
    * per-component squared difference folded LEFT-TO-RIGHT (aggregate
    * HOF ≡ list_reduce with 0.0 prepended — the oracle's fold). */
  private def l2sq(sub: Column, cw: IndexedSeq[Double]): Column =
    aggregate(
      zip_with(sub, typedLit(cw.toArray),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)

  private def codeFor(vec: Column, m: Int, subDim: Int,
      cws: IndexedSeq[(Int, IndexedSeq[Double])]): Column = {
    val sub = slice(vec, m * subDim + 1, subDim)
    // ascending struct min: smallest distance, ties -> smallest code id
    array_min(array(cws.map { case (j, cw) =>
      struct(l2sq(sub, cw).as("d"), lit(j).as("j"))
    }: _*)).getField("j")
  }

  /** Encode the corpus to PQ codes: (id, codes: array<int> of length M).
    * One map-side pass, no shuffle (plan-asserted in OperatorSpec). */
  def encode(corpus: DataFrame, codebooks: DataFrame, subDim: Int): DataFrame =
    encodeWith(corpus, codebookSeq(codebooks), subDim)

  private def encodeWith(corpus: DataFrame,
      cb: Map[Int, IndexedSeq[(Int, IndexedSeq[Double])]],
      subDim: Int): DataFrame = {
    val ms = cb.keys.toSeq.sorted
    corpus.select(col("id"),
      array(ms.map(m => codeFor(col("vec"), m, subDim, cb(m))): _*)
        .as("codes"))
  }

  /** ADC top-k: approximate L2² of each (query, corpus row) pair as the
    * sum over subspaces of the query's precomputed distance to the row's
    * codeword — M lookups + M−1 adds per pair, summed in ascending-m
    * order. Returns (qid, rank, neighbor, adist), rank by (adist ASC,
    * id) per query, self-matches excluded. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, codebooks: DataFrame,
      subDim: Int, k: Int): DataFrame = {
    val cb = codebookSeq(codebooks)
    val ms = cb.keys.toSeq.sorted
    val codes = encodeWith(corpus, cb, subDim)
    // per-query ADC tables: dt_m[j] = L2²(query subvector m, codeword j)
    val q = queries.select(col("qid") +: ms.map { m =>
      array(cb(m).map { case (_, cw) =>
        l2sq(slice(col("qvec"), m * subDim + 1, subDim), cw)
      }: _*).as(s"__dt$m")
    }: _*)
    val joined = codes.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("id"))
    val adist = ms.map(m =>
        element_at(col(s"__dt$m"), col("codes").getItem(m) + 1))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    joined.withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("adist"), 4).as("adist"))
  }
}
