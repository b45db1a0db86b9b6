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

  /** Per-query ADC distance tables: `__dtm[j]` = exact L2² between the
    * query's subvector m and codeword j — M·K doubles per query row. */
  private def dtCols(qvec: Column,
      cb: Map[Int, IndexedSeq[(Int, IndexedSeq[Double])]],
      subDim: Int): Seq[Column] =
    cb.keys.toSeq.sorted.map { m =>
      array(cb(m).map { case (_, cw) =>
        l2sq(slice(qvec, m * subDim + 1, subDim), cw)
      }: _*).as(s"__dt$m")
    }

  /** ADC distance of a codes row against the riding `__dtm` tables:
    * M lookups + M−1 adds, summed in ascending-m order. */
  private def adistCol(ms: Seq[Int]): Column =
    ms.map(m => element_at(col(s"__dt$m"), col("codes").getItem(m) + 1))
      .reduceLeft(_ + _)

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
    val q = queries.select(col("qid") +: dtCols(col("qvec"), cb, subDim): _*)
    val joined = codes.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    joined.withColumn("adist", adistCol(ms))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("adist"), 4).as("adist"))
  }

  /** Exact L2² between two vector COLUMNS, same left-to-right fold as
    * the codeword form. */
  private def l2sqCols(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Per-subspace Lloyd training of the PQ codebooks — the train step of
    * Jégou et al. §III: each subspace independently runs k-means on the
    * corpus's subvectors, starting from `init` (same (m, j, cvec) shape
    * the search operators take). Assignment is the zero-shuffle map-side
    * argmin over the driver-held codebooks (the [[Ann.kmeansRefine]]
    * discipline); the update is one (m, j, pos) partial-agg shuffle of
    * component means ROUNDED to `scale` decimals — rounding absorbs the
    * ulp-level noise of float-summation order, which is what makes the
    * training replayable bit-for-bit in any engine. Codewords that lose
    * all members keep their previous value. Per iteration the driver
    * holds only M·K·subDim doubles — config-sized, never corpus-sized. */
  def trainCodebooks(corpus: DataFrame, init: DataFrame, subDim: Int,
      iters: Int, scale: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cb = codebookSeq(init)
    val ms = cb.keys.toSeq.sorted
    for (_ <- 0 until iters) {
      val perSub = ms.map { m =>
        struct(lit(m).as("m"), codeFor(col("vec"), m, subDim, cb(m)).as("j"),
          slice(col("vec"), m * subDim + 1, subDim).as("sv")).as(s"__a$m")
      }
      val means = corpus.select(explode(array(perSub: _*)).as("a"))
        .select(col("a.m"), col("a.j"), posexplode(col("a.sv")))
        .groupBy(col("m"), col("j"), col("pos"))
        .agg(round(avg(col("col").cast("double")), scale).as("mv"))
        .groupBy(col("m"), col("j"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s.getField("mv")).as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toIndexedSeq)
        .toMap
      cb = cb.map { case (m, cws) =>
        m -> cws.map { case (j, cv) => (j, means.getOrElse((m, j), cv)) }
      }
    }
    ms.flatMap(m => cb(m).map { case (j, cv) => (m, j, cv: Seq[Double]) })
      .toDF("m", "j", "cvec")
  }

  /** Exact L2² brute-force top-k — the truth reference for PQ recall
    * evaluation (the L2 counterpart of [[Ann.bruteForceTopK]]'s cosine).
    * Queries broadcast; corpus streams. */
  def bruteL2TopK(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("id"))
      .withColumn("dist", l2sqCols(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("dist"), 4).as("dist"))
  }

  /** ADC shortlist + EXACT re-rank — the production PQ pipeline (FAISS's
    * two-stage search): ADC's table lookups prune the corpus to a
    * `shortlist`-sized candidate set per query, then the exact L2² is
    * computed for candidates only and the true top-k of the shortlist
    * returned. Quantization error affects only shortlist membership —
    * every distance the caller sees is exact. At scale the exact re-rank
    * touches `|queries| × shortlist` rows, never the corpus: the
    * shortlist joins back to the (id, vec) table by id, an equi-join on
    * a high-cardinality key. Returns (qid, rank, neighbor, dist). */
  def adcRerankTopK(queries: DataFrame, corpus: DataFrame,
      codebooks: DataFrame, subDim: Int, shortlist: Int,
      k: Int): DataFrame = {
    val cand = adcTopK(queries, corpus, codebooks, subDim, shortlist)
      .select(col("qid"), col("neighbor"))
    val scored = cand
      .join(queries, "qid")
      .join(corpus.withColumnRenamed("id", "neighbor"), "neighbor")
      .withColumn("dist", l2sqCols(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"),
        round(col("dist"), 4).as("dist"))
  }

  /** RESIDUAL IVF+PQ — the encoding FAISS's IVFPQ actually uses
    * (Jégou et al. §V.A, Eq. 27): each vector quantizes its RESIDUAL
    * `vec − centroid(cell)` rather than the raw vector, and each query
    * scores a cell's candidates with ADC tables built from its OWN
    * residual against that cell's centroid. Residuals concentrate the
    * coordinate distribution around zero, which is what lets a trained
    * codebook spend its codewords where the mass is — the recall
    * advantage of IVFPQ over flat PQ at equal code budget (codebook
    * training itself is [[trainCodebooks]]'s job, composable here).
    *
    * Plan shape is EXACTLY [[ivfAdcTopK]]'s (same one map-side index
    * pass, same shuffle hash equi-join on cid, neither side broadcast):
    * the centroid each row needs rides INSIDE the argmin/probe struct
    * (d, cid, cvec) — config-sized literals, no extra join to look the
    * centroid back up — and the query's per-cell distance tables are
    * computed on the exploded (qid, cid) probe rows, so nprobe cells
    * cost nprobe table computations, not a corpus pass. All arithmetic
    * stays the left-fold double tree, so the whole residual pipeline
    * replays bit-for-bit in SQL. Returns (qid, rank, neighbor, adist). */
  def ivfResidualAdcTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, codebooks: DataFrame, subDim: Int,
      nprobe: Int, k: Int): DataFrame = {
    val cb = codebookSeq(codebooks)
    val ms = cb.keys.toSeq.sorted
    val cents = centSeq(centroids)
    require(cents.nonEmpty && nprobe >= 1 && nprobe <= cents.size,
      s"nprobe=$nprobe must be in [1, ${cents.size}]")
    // (d, cid, cvec) — the centroid rides along so the residual needs no
    // join; (d, cid) is unique, so struct ordering never compares cvec
    def cellScoresV(vec: Column): Column =
      array(cents.map { case (cid, cv) =>
        struct(l2sq(vec, cv).as("d"), lit(cid).as("cid"),
          typedLit(cv.toArray).as("cvec"))
      }: _*)
    def residual(vec: Column, cvec: Column): Column =
      zip_with(vec, cvec, (x, c) => x.cast("double") - c)
    val index = corpus
      .withColumn("__mc", array_min(cellScoresV(col("vec"))))
      .withColumn("__rv", residual(col("vec"), col("__mc.cvec")))
      .select(col("id"), col("__mc.cid").as("cid"),
        array(ms.map(m => codeFor(col("__rv"), m, subDim, cb(m))): _*)
          .as("codes"))
    val probes = queries
      .select(col("qid"), col("qvec"),
        explode(slice(array_sort(cellScoresV(col("qvec"))), 1, nprobe))
          .as("__pc"))
      .select((col("qid") +: col("__pc.cid").as("cid") +:
        dtCols(residual(col("qvec"), col("__pc.cvec")), cb, subDim)): _*)
    val cand = index.hint("shuffle_hash").join(probes, Seq("cid"))
      .filter(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    cand.withColumn("adist", adistCol(ms))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("adist"), 4).as("adist"))
  }

  /** Collect the coarse-centroid table driver-side: config-sized, like
    * the codebooks. */
  private def centSeq(
      centroids: DataFrame): IndexedSeq[(Long, IndexedSeq[Double])] =
    centroids.select(col("cid").cast("long"),
        transform(col("cvec"), x => x.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
      .sortBy(_._1).toIndexedSeq

  /** Per-row (L2², cid) scores against the driver-held centroids —
    * map-side, ties to the lower cid via struct ordering. */
  private def cellScoresFor(vec: Column,
      cents: Seq[(Long, IndexedSeq[Double])]): Column =
    array(cents.map { case (cid, cv) =>
      struct(l2sq(vec, cv).as("d"), lit(cid).as("cid"))
    }: _*)

  /** Degree-capped k-NN GRAPH over the corpus, candidates scoped by IVF
    * cell — the graph HNSW-style methods refine shortlists with, built
    * with the d16/SemDeDup candidate discipline: each vector considers
    * only its own coarse cell's members (ONE shuffle hash equi-join on
    * cid — never an all-pairs corpus self-join; the centroid count is
    * the knob that bounds cell size, exactly as in semantic dedup), ranks
    * them by exact L2² and keeps its `deg` nearest as directed edges.
    * The ranking window partitions by the VECTOR id — high-cardinality,
    * no global sort — and the stored graph is O(N·deg) ids, the
    * navigable structure a 100 TB corpus can actually persist. Cell
    * assignment is the same exact-L2² argmin (ties to the lower cid) as
    * [[ivfAdcTopK]]'s coarse quantizer, so graph and index agree and
    * the whole build replays in SQL. Returns (id, nbr). */
  def cellKnnGraph(corpus: DataFrame, centroids: DataFrame,
      deg: Int): DataFrame = {
    val cents = centSeq(centroids)
    require(cents.nonEmpty && deg >= 1,
      s"need centroids and deg >= 1, got ${cents.size} cents, deg=$deg")
    val assigned = corpus.select(col("id"), col("vec"),
      array_min(cellScoresFor(col("vec"), cents)).getField("cid").as("cid"))
    val left = assigned.select(col("cid"), col("id"), col("vec"))
    val right = assigned.select(col("cid"), col("id").as("nbr"),
      col("vec").as("__nvec"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("dist").asc, col("nbr"))
    left.hint("shuffle_hash").join(right, Seq("cid"))
      .filter(col("id") =!= col("nbr"))
      .withColumn("dist", l2sqCols(col("vec"), col("__nvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= deg)
      .select(col("id"), col("nbr"))
  }

  /** ADC shortlist + ONE k-NN-graph expansion hop + exact re-rank — the
    * graph-refined search the ANN ladder's LSH/IVF/PQ families lack:
    * a SMALL ADC shortlist seeds the candidate set, the [[cellKnnGraph]]
    * edges of every seed join in their neighbors ("neighbors of near
    * candidates are near" — the HNSW insight, one bounded hop instead of
    * a beam loop), and the exact L2² re-rank sees the union. Per query
    * the candidate set is ≤ shortlist·(1+deg) ids, so the expansion join
    * and re-rank touch |queries|·shortlist·deg rows, never the corpus;
    * the hop is an equi-join on the seed id against the O(N·deg) graph —
    * shuffle-shaped, nothing broadcast but the query-side ADC tables the
    * seed stage already broadcasts. Same recall/cost contract as
    * [[adcRerankTopK]] at equal candidate budget, but candidates follow
    * the metric structure instead of the quantizer's error surface.
    * Returns (qid, rank, neighbor, dist) with exact distances. */
  def adcGraphExpandTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, codebooks: DataFrame, subDim: Int,
      shortlist: Int, deg: Int, k: Int): DataFrame = {
    val graph = cellKnnGraph(corpus, centroids, deg)
    val seed = adcTopK(queries, corpus, codebooks, subDim, shortlist)
      .select(col("qid"), col("neighbor"))
    val hop = seed.join(graph.withColumnRenamed("id", "neighbor"),
        "neighbor")
      .select(col("qid"), col("nbr").as("neighbor"))
    val cand = seed.union(hop)
      .filter(col("qid") =!= col("neighbor")).distinct()
    val scored = cand.join(queries, "qid")
      .join(corpus.withColumnRenamed("id", "neighbor"), "neighbor")
      .withColumn("dist", l2sqCols(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"),
        round(col("dist"), 4).as("dist"))
  }

  /** IVF + PQ — the FAISS "IVFPQ" composition (Jégou et al. §V, non-
    * residual flavor): a coarse quantizer (the `centroids` table) scopes
    * each query to its `nprobe` nearest cells, and ADC scores only the
    * candidates inside those cells. The index a 100 TB corpus actually
    * stores is `(id, cid, codes)` — one int plus M small codes per row —
    * built in ONE zero-shuffle map-side pass (cell argmin + subspace
    * argmins over driver-held, config-sized tables).
    *
    * The candidate join is the a7 contract: queries are a distributed
    * TABLE carrying their ADC tables, matched to index rows by a shuffle
    * hash equi-join on `cid` — neither side broadcast. Coarse assignment
    * is exact L2² with the same left-to-right fold as encoding, ties to
    * the lower cid, so the whole index + search replays in SQL.
    *
    * @param centroids (cid: long, cvec: array) — the coarse codebook
    * @param nprobe    cells probed per query (recall/cost knob)
    */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, codebooks: DataFrame, subDim: Int,
      nprobe: Int, k: Int): DataFrame = {
    val cb = codebookSeq(codebooks)
    val ms = cb.keys.toSeq.sorted
    val cents: IndexedSeq[(Long, IndexedSeq[Double])] = centSeq(centroids)
    require(cents.nonEmpty && nprobe >= 1 && nprobe <= cents.size,
      s"nprobe=$nprobe must be in [1, ${cents.size}]")
    def cellScores(vec: Column): Column =
      array(cents.map { case (cid, cv) =>
        struct(l2sq(vec, cv).as("d"), lit(cid).as("cid"))
      }: _*)
    // the stored index: cell + codes in one map-side pass
    val index = corpus.select(col("id"),
      array_min(cellScores(col("vec"))).getField("cid").as("cid"),
      array(ms.map(m => codeFor(col("vec"), m, subDim, cb(m))): _*)
        .as("codes"))
    // query rows fan out to their nprobe cells, ADC tables riding along
    val probes = queries.select(
      (col("qid") +:
        explode(transform(
          slice(array_sort(cellScores(col("qvec"))), 1, nprobe),
          s => s.getField("cid"))).as("cid") +:
        dtCols(col("qvec"), cb, subDim)): _*)
    val cand = index.hint("shuffle_hash").join(probes, Seq("cid"))
      .filter(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    cand.withColumn("adist", adistCol(ms))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("adist"), 4).as("adist"))
  }
}
