package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy risk screening for training-data release — the governance
  * counterpart of the PII scrub (t5): before a corpus (or its metadata)
  * ships, measure how identifiable its rows are. k-anonymity (Sweeney
  * 2002): every quasi-identifier combination must be shared by >= k rows.
  * l-diversity (Machanavelli et al. 2007): within each such group the
  * sensitive attribute must take >= l distinct values, or the group leaks
  * the sensitive value even at size k.
  *
  * Shape: ONE hash aggregation over the quasi-identifier key computes
  * both group size and per-group sensitive diversity (a distinct-agg the
  * engine plans as the standard two-phase expand), then a result-sized
  * roll-up to the report row. Nothing downstream of the first shuffle
  * depends on data size — the 100 TB cost is one groupBy.
  */
object Privacy {

  /** One-row report: total groups, smallest group, groups/rows below the
    * k floor, and the minimum sensitive-value diversity over all groups.
    * Empty inputs report zeros (vacuously anonymous), not nulls. */
  def kAnonymityReport(df: DataFrame, qis: Seq[Column], sensitive: Column,
      k: Int): DataFrame = {
    require(qis.nonEmpty && k >= 1)
    val groups = df.groupBy(qis: _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(sensitive).as("__l"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      coalesce(min(col("__n")), lit(0L)).as("min_group"),
      coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
        .as("groups_at_risk"),
      coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
        lit(0L)).as("rows_at_risk"),
      coalesce(min(col("__l")), lit(0L)).as("min_l"))
      .select(lit(k).as("k"), col("n_groups"), col("min_group"),
        col("groups_at_risk"), col("rows_at_risk"), col("min_l"))
  }

  /** ε for one unit of [[dpNoisedRelease]] noise: the two-sided
    * geometric with α = 1∕2 is the discrete Laplace mechanism at
    * ε = ln 2 per count (sensitivity 1); disjoint histogram cells
    * compose in PARALLEL, so the whole release spends ln 2 total. */
  val DpEpsilonLn2: Double = 0.6931471805599453

  /** Trailing-zero count of a 32-bit hash lane, capped at 20 — a
    * GEOMETRIC(1∕2) sample in pure integer arithmetic (P(tz = j) =
    * 2^{−(j+1)}: each extra trailing zero bit halves the probability),
    * built as a first-set-bit when-chain so the SQL oracle replays it
    * with the identical CASE ladder. The cap truncates the
    * 2^{−21}-probability tail (and the h = 0 corner) — documented
    * truncation, noise stays inside [−20, 20]. */
  def tz20(h: Column): Column = {
    var e: Column = lit(20L)
    var j = 19
    while (j >= 0) {
      e = when(h.bitwiseAND(lit(1L << j)) =!= 0L, lit(j.toLong))
        .otherwise(e)
      j -= 1
    }
    e
  }

  /** DP-NOISED HISTOGRAM RELEASE — the other half of the privacy-release
    * story next to the k-anonymity SCREEN: after suppressing groups
    * below the k floor (the p7 contract — small quasi-identifier cells
    * never ship at all), each released count carries discrete-Laplace
    * noise   X = G₁ − G₂,  G ~ Geometric(1∕2)
    * (the difference of two iid geometrics IS the two-sided geometric
    * with α = 1∕2 — Ghosh–Roughgarden–Sundararajan's universally
    * optimal mechanism for counts, at ε = ln 2). The geometric lanes
    * come from two PORTABLE md5 hash lanes of (seed | group key), so
    * the noise is deterministic, seed-auditable, and bit-exactly
    * replayable by the SQL oracle — the property a RELEASE GATE needs
    * (the published artifact must be reproducible from the inputs; a
    * nondeterministic RNG could never be hash-verified). A determinate
    * seed means re-releasing with the same seed spends no extra ε;
    * changing the seed is a new release and composes sequentially —
    * the caller owns that ledger. Scale: one hash aggregation over the
    * QI key; everything after is released-histogram-sized.
    *
    * THE ε COLUMN IS NOMINAL, NOT A GUARANTEE (r15 advisor): the
    * noise is a deterministic public function of (seed | group key),
    * so the ln 2 DP bound holds ONLY when the seed is secret and
    * uniformly random — anyone who learns the seed (and deterministic
    * replay requires publishing it to the verifier) can recompute and
    * subtract the noise exactly. The ±20 tz-cap truncation further
    * weakens pure-ε to (ε, δ) with δ ≈ 2·2⁻²¹ per cell. The column is
    * therefore named `nominal_epsilon`: the mechanism's design-point ε
    * under the secret-seed assumption, not a property of this
    * seed-published artifact. */
  def dpNoisedRelease(df: DataFrame, qis: Seq[Column], k: Int,
      seed: String): DataFrame = {
    require(qis.nonEmpty && k >= 1)
    val groups = df.groupBy(qis: _*).agg(count(lit(1)).as("n"))
    val qiNames = groups.columns.dropRight(1)
    val key = concat_ws("|", lit(seed) +: qiNames.map(c =>
      col(c).cast("string")): _*)
    val g1 = tz20(graft.functions.Hashing.portableHash32(
      concat(key, lit(":a"))))
    val g2 = tz20(graft.functions.Hashing.portableHash32(
      concat(key, lit(":b"))))
    groups.filter(col("n") >= k)
      .select(qiNames.map(col) ++ Seq(
        col("n"),
        (g1 - g2).as("noise"),
        (col("n") + g1 - g2).as("noisy_n"),
        lit(k).as("k"),
        lit(DpEpsilonLn2).as("nominal_epsilon")): _*)
  }
}
