package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Portable cardinality sketching.
  *
  * Linear counting: bucket every value into m cells by portable md5 hash,
  * count occupied cells, estimate distinct = -m * ln(1 - occupied/m). All
  * arithmetic is md5 + doubles, so any engine replays the estimate
  * bit-for-bit — unlike Spark's approx_count_distinct (HLL++ with
  * engine-private internals), this sketch is verifiable and mergeable
  * across systems (union corpora = OR the bucket bitmaps).
  *
  * Scale: the shuffle carries at most m distinct bucket ids with map-side
  * partial dedup — O(m) memory regardless of row count. Accuracy needs
  * m on the order of the true cardinality (standard error ~sqrt(m)/n per
  * Whang et al.); saturated sketches (occupied = m) return null.
  */
object Sketches {

  /** One-row DataFrame: (est_distinct rounded to 2, occupied) for `value`
    * over df. */
  def approxDistinct(df: DataFrame, value: Column, m: Int): DataFrame =
    df.select((Hashing.portableHash32(value) % m).as("__b"))
      .agg(countDistinct(col("__b")).as("occupied"))
      .select(
        round(lit(-m.toDouble) * log(lit(1.0) -
          col("occupied").cast("double") / m), 2).as("est_distinct"),
        col("occupied"))

  /** Two-level mergeable distinct count over Spark's Datasketches HLL:
    * one sketch per (group, shard) partial, then a lossless sketch UNION
    * per group — the shape a 100 TB pipeline needs, because partial
    * sketches can be computed per day/partition/file, persisted
    * (BinaryType), and re-unioned later without touching raw rows again.
    * Standard error ~1.04/sqrt(2^lgK) (~1.6% at lgK=12).
    *
    * Output: (group, est_distinct) — estimate is engine-private (unlike
    * [[approxDistinct]]'s replayable linear counting), so gates assert an
    * error bound vs the exact count rather than hash equality. */
  def hllMergedDistinct(df: DataFrame, group: Column, shard: Column,
      value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(group.as("__g"), shard.as("__s"))
      .agg(hll_sketch_agg(value, lgK).as("__sk"))
      .groupBy(col("__g"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), true))
        .as("est_distinct"))

  /** PORTABLE deterministic HLL register table — the sketch leg of the
    * incremental-maintenance story ([[Ivm]]'s scaladoc points here):
    * exact count-distinct has no delta algebra, but its HLL REGISTERS
    * are a pure SEMILATTICE (register-wise max), so
    * merge(state(base), state(delta)) is IDENTICAL — register for
    * register — to state(base ∪ delta). Unlike the DataSketches binary
    * sketches above, whose union path promotes the internal mode and
    * shifts the estimate ~1% (probed), these registers are plain
    * engine-portable integers a SQL oracle replays exactly:
    * h = first 15 md5 hex chars (60 bits, always positive in a long),
    * bucket = h & 1023 (m = 1024), rho = leading-zero rank of the
    * remaining 50 bits computed as 51 − length(bin(w)) — bin() drops
    * leading zeros in both engines and bin(0) = "0" makes the all-zero
    * word land on the rho = 50 cap with no special case.
    *
    * Returns (grp, bucket, rho): at most m = 1024 rows per group
    * REGARDLESS of corpus size — the state a 100 TB pipeline stores per
    * day and folds by [[mergeHllStates]] without touching raw rows. */
  def portableHllState(df: DataFrame, grp: Column,
      value: Column): DataFrame = {
    val h = conv(substring(md5(value), 1, 15), 16, 10).cast("long")
    df.select(grp.as("grp"), h.as("h"))
      .select(col("grp"), col("h").bitwiseAND(lit(1023L)).as("bucket"),
        (lit(51) - length(bin(shiftright(col("h"), 10)))).as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Register-wise max over any number of [[portableHllState]] tables —
    * the lossless HLL merge (same shuffle shape as computing the state
    * over the concatenated inputs, but over ≤1024-row frames). */
  def mergeHllStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** BOTTOM-K (KMV / theta-style) distinct sketch state — the sketch
    * family HLL cannot provide: HLL registers UNION losslessly but
    * cannot INTERSECT, so the train∩eval distinct-overlap estimate at
    * 100 TB (contamination rate without [[Dedup.contamination]]'s exact
    * semi-join) needs a SAMPLE sketch. The k smallest portable 32-bit
    * hash values of a set are a uniform sample of its distinct hash
    * domain below a data-dependent threshold θ — mergeable (bottom-k of
    * a union = bottom-k over the concatenated bottom-ks, see
    * [[mergeBottomKStates]]) and intersectable ([[thetaIntersect]]).
    *
    * Returns (grp, h) rows, at most k per group, h ascending-distinct —
    * the state a pipeline persists per day/shard and folds later. The
    * heavy lifting rides [[graft.functions.BottomKDistinctAgg]], whose
    * state is capped at k values at every point of the partial-agg tree
    * (map-side combine ships ≤ k values per partition per group; the
    * raw distinct domain is never shuffled). Hashes are the portable
    * md5-derived 32-bit family, so a SQL oracle replays the sketch —
    * and therefore the whole estimate — bit-for-bit. */
  def bottomKState(df: DataFrame, grp: Column, value: Column,
      k: Int): DataFrame = {
    val bk = graft.functions.BottomKDistinctAgg.bottomK(k)
    df.select(grp.as("grp"), Hashing.portableHash32(value).as("__h"))
      .groupBy("grp").agg(bk(col("__h")).as("__hs"))
      .select(col("grp"), explode(col("__hs")).as("h"))
  }

  /** Fold any number of [[bottomKState]] tables into one: bottom-k of
    * the union — the same bounded UDAF over the concatenated ≤k-row
    * states (duplicate hashes shared by two partials collapse to one
    * slot inside the aggregate's dedup merge, exactly the semantics the
    * distinct-domain sample needs). */
  def mergeBottomKStates(states: Seq[DataFrame], k: Int): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    val bk = graft.functions.BottomKDistinctAgg.bottomK(k)
    states.reduce(_.unionByName(_))
      .groupBy("grp").agg(bk(col("h")).as("__hs"))
      .select(col("grp"), explode(col("__hs")).as("h"))
  }

  /** THETA-STYLE DISTINCT INTERSECTION over two single-set
    * [[bottomKState]] tables (columns (h); pass a filtered state's `h`
    * projection). The standard theta-sketch argument: with
    * θ_X = (the k-th smallest hash of X, exclusive) when the sketch is
    * FULL and θ_X = 2³² (the whole space — the sketch is exact) when
    * |X| < k, every distinct hash of X below θ = min(θ_A, θ_B) is
    * present in X's state, so the common hashes below θ are a uniform
    * θ∕2³²-rate sample of A∩B and
    *   est = n_common · 2³² ∕ θ
    * (exact — est = n_common — when both sketches are exact). Output is
    * ONE row: (ka, kb, theta, n_common, est_intersection), everything
    * integer except the single final float division, so both engines
    * reproduce the estimate bit-for-bit. Shape: two 1-row aggs
    * (broadcast), one ≤k×≤k hash equi-join. */
  /** FULL THETA SET ALGEBRA over two single-set [[bottomKState]]s — the
    * whole family of release-time corpus comparisons from ONE pair of
    * persisted sketches: distinct sizes of each side, of the union,
    * the intersection (t58's estimator), the difference A∖B, the
    * Jaccard similarity, and the CONTAMINATION-RATE estimate
    * |A∩B|∕|A| — at 100 TB the d14 question answered without the
    * exact distinct semi-join. One sampling argument covers all of it:
    * below θ = min(θ_A, θ_B) both states hold their COMPLETE distinct
    * hash sets, so the θ-samples S_A, S_B are uniform θ∕2³²-rate
    * samples of A and B and every set-algebra count scales by 2³²∕θ
    * (the side estimates degenerate to the classic KMV (k−1)·2³²∕h_k
    * when that side fixes θ, and to exact counts when both sketches
    * are under k). Integers until the final float divisions; ratio
    * estimates (jaccard, contamination rate) divide SAMPLE counts, so
    * the θ scale cancels exactly. Output is ONE row. */
  def thetaSetAlgebra(stateA: DataFrame, stateB: DataFrame,
      k: Int): DataFrame = {
    val full = lit(4294967296L)
    val aAgg = stateA.agg(count(lit(1)).as("ka"), max(col("h")).as("__ma"))
    val bAgg = stateB.agg(count(lit(1)).as("kb"), max(col("h")).as("__mb"))
    val th = aAgg.crossJoin(bAgg).select(col("ka"), col("kb"),
      least(
        when(col("ka") === k, col("__ma")).otherwise(full),
        when(col("kb") === k, col("__mb")).otherwise(full)).as("theta"))
    val thB = broadcast(th)
    val na = stateA.crossJoin(thB).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_a_sample"))
    val nb = stateB.crossJoin(thB).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_b_sample"))
    val nc = stateA.select(col("h")).join(stateB.select(col("h")), "h")
      .crossJoin(thB).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common"))
    def est(c: Column): Column =
      c.cast("double") * 4294967296.0 / col("theta").cast("double")
    thB.crossJoin(na).crossJoin(nb).crossJoin(nc)
      .select(col("ka"), col("kb"), col("theta"),
        col("n_a_sample"), col("n_b_sample"), col("n_common"),
        est(col("n_a_sample")).as("est_a"),
        est(col("n_b_sample")).as("est_b"),
        est(col("n_a_sample") + col("n_b_sample") - col("n_common"))
          .as("est_union"),
        est(col("n_common")).as("est_intersection"),
        est(col("n_a_sample") - col("n_common")).as("est_diff_ab"),
        when(col("n_a_sample") + col("n_b_sample") - col("n_common") > 0,
          col("n_common").cast("double") /
            (col("n_a_sample") + col("n_b_sample") - col("n_common"))
              .cast("double")).as("jaccard_est"),
        when(col("n_a_sample") > 0,
          col("n_common").cast("double") /
            col("n_a_sample").cast("double")).as("contamination_rate"))
  }

  /** WEIGHTED bottom-k (TUPLE sketch) state — [[bottomKState]] with an
    * additive Σweight summary per retained hash
    * ([[graft.functions.WeightedBottomKAgg]]): the state that makes
    * token-MASS overlap between sources estimable, not just distinct
    * membership — the budget currency of a curation pipeline is
    * occurrences, and a shingle shared by 2 docs vs 2 million is the
    * whole story at 100 TB. Returns (grp, h, w) rows, ≤k per group,
    * h ascending-distinct, w = total weight of that hash's value.
    * Mergeable exactly like the unweighted state (shared hashes sum
    * their weights — see the weight-fidelity argument on the UDAF). */
  def weightedBottomKState(df: DataFrame, grp: Column, value: Column,
      weight: Column, k: Int): DataFrame = {
    val wk = graft.functions.WeightedBottomKAgg.weightedBottomK(k)
    df.select(grp.as("grp"), Hashing.portableHash32(value).as("__h"),
        weight.cast("long").as("__w"))
      .groupBy("grp").agg(wk(col("__h"), col("__w")).as("__hw"))
      .select(col("grp"), explode(col("__hw")).as("__e"))
      .select(col("grp"), col("__e._1").as("h"), col("__e._2").as("w"))
  }

  /** Fold any number of [[weightedBottomKState]] tables into one: the
    * same bounded UDAF over the concatenated ≤k-row states — shared
    * hashes sum their weights inside the aggregate's merge, which is
    * exactly the tuple-sketch union (partial states computed per
    * day/shard fold without touching raw rows). */
  def mergeWeightedBottomKStates(states: Seq[DataFrame],
      k: Int): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    val wk = graft.functions.WeightedBottomKAgg.weightedBottomK(k)
    states.reduce(_.unionByName(_))
      .groupBy("grp").agg(wk(col("h"), col("w")).as("__hw"))
      .select(col("grp"), explode(col("__hw")).as("__e"))
      .select(col("grp"), col("__e._1").as("h"), col("__e._2").as("w"))
  }

  /** WEIGHTED theta overlap over two single-set [[weightedBottomKState]]
    * tables (columns (h, w)) — t58's sampling argument extended to
    * masses: below θ = min(θ_A, θ_B) both states hold their complete
    * distinct hash sets WITH exact total weights, so the θ-sample is a
    * uniform θ∕2³²-rate sample of the distinct domain and any Σweight
    * over it is a Horvitz–Thompson estimate of the full-domain mass at
    * scale 2³²∕θ. Output ONE row: sample counts and masses (exact
    * integers), the scaled mass estimates (one float division each),
    * and the mass-contamination rates mass_common∕mass_sample where θ
    * cancels exactly — "what fraction of A's token mass lands on values
    * B also has", the release-time question the unweighted t59 rate
    * cannot answer when weights are skewed. Shape: two 1-row aggs
    * (broadcast), one ≤k×≤k hash equi-join. */
  def thetaWeightedOverlap(stateA: DataFrame, stateB: DataFrame,
      k: Int): DataFrame = {
    val full = lit(4294967296L)
    val aAgg = stateA.agg(count(lit(1)).as("ka"), max(col("h")).as("__ma"))
    val bAgg = stateB.agg(count(lit(1)).as("kb"), max(col("h")).as("__mb"))
    val th = aAgg.crossJoin(bAgg).select(col("ka"), col("kb"),
      least(
        when(col("ka") === k, col("__ma")).otherwise(full),
        when(col("kb") === k, col("__mb")).otherwise(full)).as("theta"))
    val thB = broadcast(th)
    val sa = stateA.crossJoin(thB).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_a_sample"),
        sum(col("w")).as("mass_a_sample"))
    val sb = stateB.crossJoin(thB).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_b_sample"),
        sum(col("w")).as("mass_b_sample"))
    val cm = stateA.select(col("h"), col("w").as("__wa"))
      .join(stateB.select(col("h"), col("w").as("__wb")), "h")
      .crossJoin(thB).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("__wa")).as("mass_common_a"),
        sum(col("__wb")).as("mass_common_b"))
    def est(c: Column): Column =
      c.cast("double") * 4294967296.0 / col("theta").cast("double")
    thB.crossJoin(sa).crossJoin(sb).crossJoin(cm)
      .na.fill(0L, Seq("n_common", "mass_common_a", "mass_common_b"))
      .select(col("ka"), col("kb"), col("theta"),
        col("n_a_sample"), col("n_b_sample"), col("n_common"),
        col("mass_a_sample"), col("mass_b_sample"),
        col("mass_common_a"), col("mass_common_b"),
        est(col("mass_a_sample")).as("est_mass_a"),
        est(col("mass_b_sample")).as("est_mass_b"),
        est(col("mass_common_a")).as("est_overlap_mass_a"),
        est(col("mass_common_b")).as("est_overlap_mass_b"),
        when(col("mass_a_sample") > 0,
          col("mass_common_a").cast("double") /
            col("mass_a_sample").cast("double")).as("mass_rate_a"),
        when(col("mass_b_sample") > 0,
          col("mass_common_b").cast("double") /
            col("mass_b_sample").cast("double")).as("mass_rate_b"))
  }

  /** VALUE-CARRYING tuple sketch — the quantile leg of the sketch
    * family (HLL counts, theta/tuple intersects, CMS frequencies; this
    * answers DISTRIBUTION questions): the sampling key packs the
    * portable 32-bit hash into the HIGH 32 bits and the value itself
    * into the LOW 32 (values must fit [0, 2³¹) — the caller's
    * fixed-point encode), so the UNCHANGED [[graft.functions
    * .WeightedBottomKAgg]] machinery yields a uniform distinct-VALUE
    * sample whose members are directly readable back out of the key —
    * no reverse-hash join, no second corpus pass (the hash keeps its
    * LOW 31 bits so the packed key stays under 2⁶³). Two values
    * colliding on the 31-bit hash both survive (distinct packed keys)
    * — a harmless oversample. Returns (h, v, w): ≤k rows, w = exact row
    * multiplicity of value v, mergeable exactly like [[t62's
    * weightedBottomKState]] state (same UDAF, same fidelity
    * argument). */
  def valueTupleState(df: DataFrame, value: Column, k: Int): DataFrame = {
    val wk = graft.functions.WeightedBottomKAgg.weightedBottomK(k)
    // 31-bit sampling hash: h31·2³² + v stays under 2⁶³ (a full 32-bit
    // hash in the high half would overflow the packed long)
    val h64 = pmod(Hashing.portableHash32(value.cast("string")),
      lit(2147483648L)) * lit(4294967296L) + value.cast("long")
    df.select(lit(1L).as("grp"), h64.as("__h"), lit(1L).as("__w"))
      .groupBy("grp").agg(wk(col("__h"), col("__w")).as("__hw"))
      .select(explode(col("__hw")).as("__e"))
      .select(col("__e._1").as("h"),
        pmod(col("__e._1"), lit(4294967296L)).as("v"),
        col("__e._2").as("w"))
  }

  /** QUANTILE ESTIMATES from a [[valueTupleState]]: below
    * θ = (the max packed key, exclusive, when the sketch is full —
    * the t58 convention) the sample is uniform over the distinct value
    * domain WITH exact multiplicities, so the weighted empirical CDF
    * of the sample is a ratio estimator of the row-multiset CDF (the
    * 2⁶⁴∕θ scale cancels). est(p) = the smallest sampled value whose
    * cumulative weight reaches p — decided in PURE INTEGER
    * cross-multiplication (cum·100 ≥ p100·total), no float boundary.
    * `p100s`: integer percents. Output one row per requested
    * percentile: (p100, est_v, cum_w, total_w). Everything is a ≤k-row
    * sort + running sum — state-sized, and bit-replayable. */
  def sketchQuantiles(state: DataFrame, k: Int,
      p100s: Seq[Int]): DataFrame = {
    val agg = state.agg(count(lit(1)).as("__n"), max(col("h")).as("__mx"))
    val th = agg.select(
      when(col("__n") === k, col("__mx"))
        .otherwise(lit(Long.MaxValue)).as("__th"))
    val sample = state.crossJoin(broadcast(th))
      .filter(col("h") < col("__th"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v")) // ≤k rows — a bounded, state-sized sort
    val cum = sample
      .withColumn("__cum", sum(col("w")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .crossJoin(broadcast(
        sample.agg(sum(col("w")).as("__tot"))))
    val probe = sample.sparkSession.range(1)
      .select(explode(typedLit(p100s.toArray)).as("p100"))
    cum.crossJoin(broadcast(probe))
      .filter(col("__cum") * 100 >= col("p100") * col("__tot"))
      .groupBy(col("p100"))
      .agg(min(col("v")).as("est_v"), max(col("__tot")).as("total_w"))
      .join(cum.select(col("v").as("est_v"), col("__cum").as("cum_w")),
        Seq("est_v"))
      .select(col("p100"), col("est_v"), col("cum_w"), col("total_w"))
  }

  def thetaIntersect(stateA: DataFrame, stateB: DataFrame,
      k: Int): DataFrame = {
    val full = lit(4294967296L) // 2^32: hash-space bound, exact sketch
    val aAgg = stateA.agg(count(lit(1)).as("ka"), max(col("h")).as("__ma"))
    val bAgg = stateB.agg(count(lit(1)).as("kb"), max(col("h")).as("__mb"))
    val th = aAgg.crossJoin(bAgg).select(col("ka"), col("kb"),
      least(
        when(col("ka") === k, col("__ma")).otherwise(full),
        when(col("kb") === k, col("__mb")).otherwise(full)).as("theta"))
    val common = stateA.select(col("h"))
      .join(stateB.select(col("h")), "h")
      .crossJoin(broadcast(th))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common"))
    broadcast(th).crossJoin(common.na.fill(0L, Seq("n_common")))
      .select(col("ka"), col("kb"), col("theta"), col("n_common"),
        (col("n_common").cast("double") * 4294967296.0 /
          col("theta").cast("double")).as("est_intersection"))
  }
}
