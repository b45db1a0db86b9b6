package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two strategies:
  *   - `bruteForceTopK`: broadcast the (small) query set against the corpus
  *     — one corpus scan, cosine per (query, row), per-query top-k. Exact;
  *     the baseline and the verifier for the approximate path.
  *   - `lshTopK`: sign-bit hyperplane buckets computed per row (map-side);
  *     queries only meet corpus rows in their own bucket, so the join
  *     shuffles on the bucket key instead of cross-joining. With b planes the
  *     candidate set shrinks ~2^b-fold; recall is traded via multi-probe
  *     (not needed at gate scale).
  *
  * Scale: at 100 TB the brute-force path is only for small query batches
  * (broadcast); the LSH path shuffles corpus once on int bucket keys and
  * scales linearly. Top-k uses a rank window per query — with k small this
  * is a partial TakeOrdered per partition after AQE.
  */
object Ann {

  /** Exact top-k neighbors (cosine) of each query vector.
    * `queries`: (qid, qvec); `corpus`: (id, vec). Excludes self-matches. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms materialize once per row (not per pair): per-pair work is a
    // single dot-product fold
    val cn = corpus.withColumn("__nv", Vectors.norm2(col("vec")))
    val qn = queries.withColumn("__nq", Vectors.norm2(col("qvec")))
    val joined = cn.crossJoin(broadcast(qn))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim",
        Vectors.dot(col("qvec"), col("vec")) / (col("__nq") * col("__nv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("sim"), 4).as("sim"))
  }

  /** IVF (inverted-file) index: every corpus vector is assigned to its
    * nearest centroid cell (cosine, ties to the lower centroid id).
    * `centroids`: (cid, cvec) — small, broadcast. One pass over the corpus.
    *
    * Scale: with cells ~ sqrt(corpus), assignment is a broadcast
    * map-side pass and search touches nprobe/cells of the data. K-means
    * refinement of the centroids is an optional offline step — any fixed
    * centroid set (here: a deterministic stride sample) yields a correct
    * index. */
  def ivfIndex(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cn = corpus.withColumn("__nv", Vectors.norm2(col("vec")))
    val cc = centroids.withColumn("__nc", Vectors.norm2(col("cvec")))
    val scored = cn.crossJoin(broadcast(cc))
      .withColumn("__cs",
        Vectors.dot(col("vec"), col("cvec")) / (col("__nv") * col("__nc")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__cs").desc, col("cid"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("vec"), col("__nv"), col("cid"))
  }

  /** IVF search: probe the `nprobe` nearest cells of each query, rank
    * candidates within them by exact cosine. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val index = ivfIndex(corpus, centroids)
    val qn = queries.withColumn("__nq", Vectors.norm2(col("qvec")))
    val cc = centroids.withColumn("__nc", Vectors.norm2(col("cvec")))
    val qScored = qn.crossJoin(broadcast(cc))
      .withColumn("__cs",
        Vectors.dot(col("qvec"), col("cvec")) / (col("__nq") * col("__nc")))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("__cs").desc, col("cid"))
    val probes = qScored.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("qvec"), col("__nq"), col("cid"))
    val cand = index.join(broadcast(probes), Seq("cid"))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim",
        Vectors.dot(col("qvec"), col("vec")) / (col("__nq") * col("__nv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("sim"), 4).as("sim"))
  }

  /** Seeded Lloyd (k-means) refinement of an IVF centroid set: `iters`
    * deterministic iterations over the corpus starting from `init`
    * (cid, cvec). Assignment = nearest centroid by cosine with ties to the
    * lower cid (the same rule as [[ivfIndex]]); update = per-component mean
    * ROUNDED to `scale` decimals — rounding absorbs the ulp-level noise of
    * float-summation order, which is what makes the refinement replayable
    * bit-for-bit in any engine (the correctness oracle unrolls the same
    * iterations in SQL). Cells that lose all members keep their previous
    * centroid.
    *
    * Scale: like Spark MLlib's KMeans, each iteration materializes only the
    * centroid set on the driver (O(cells x dim) — config-sized, never
    * corpus-sized), so the corpus-side work per iteration is one
    * broadcast-join assignment pass plus one (cid, pos) partial-agg shuffle
    * of component sums. */
  def kmeansRefine(corpus: DataFrame, init: DataFrame, iters: Int,
      scale: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    var cents = init.select(col("cid").cast("long").as("cid"),
      transform(col("cvec"), x => x.cast("double")).as("cvec"))
    for (_ <- 0 until iters) {
      val cn = corpus.withColumn("__nv", Vectors.norm2(col("vec")))
      val cc = cents.withColumn("__nc", Vectors.norm2(col("cvec")))
      val w = Window.partitionBy(col("id"))
        .orderBy(col("__cs").desc, col("cid"))
      val assigned = cn.crossJoin(broadcast(cc))
        .withColumn("__cs",
          Vectors.dot(col("vec"), col("cvec")) / (col("__nv") * col("__nc")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("cid"), col("vec"))
      val means = assigned
        .select(col("cid"), posexplode(col("vec")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("col")), scale).as("m"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mvec"))
      val stepped = cents.as("c").join(means.as("m"), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mvec"), col("cvec")).as("cvec"))
      // driver-side materialization of the (small) centroid table keeps the
      // next iteration's plan shallow — MLlib does the same
      val rows = stepped.collect().toIndexedSeq
      cents = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), stepped.schema)
    }
    cents
  }

  /** LSH-bucketed top-k: candidates restricted to the query's sign-bit
    * bucket. `planes` are fixed hyperplanes (deterministic — e.g. the first
    * b corpus vectors), making the bucketing reproducible anywhere. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Seq[Seq[Double]]): DataFrame = {
    val cb = corpus.withColumn("bucket", Vectors.lshBucket(col("vec"), planes))
      .withColumn("__nv", Vectors.norm2(col("vec")))
    val qb = queries.withColumn("qbucket",
        Vectors.lshBucket(col("qvec"), planes))
      .withColumn("__nq", Vectors.norm2(col("qvec")))
    val joined = cb.join(broadcast(qb), col("bucket") === col("qbucket"))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim",
        Vectors.dot(col("qvec"), col("vec")) / (col("__nq") * col("__nv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("sim"), 4).as("sim"))
  }
}
