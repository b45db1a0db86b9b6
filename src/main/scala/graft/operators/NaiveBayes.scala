package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes text classification — the fastText-shaped
  * quality/domain filter of LLM data curation (CCNet, GPT-3's
  * WebText-vs-CommonCrawl screen, FineWeb-Edu's scorer are all linear
  * text classifiers applied at corpus scale), built so every score is an
  * exact integer BOTH engines reproduce bit-for-bit.
  *
  * The classic blocker for cross-engine exactness is log-probabilities:
  * IEEE `ln` differs between libm implementations, and a float sum over
  * a document's tokens has no portable fold order. Both problems vanish
  * by scoring in FIXED-POINT Q16 LOG2: `L(x) = round-down of 2¹⁶·log2 x`
  * computed by the classic square-and-extract-bits integer recurrence —
  * normalize the mantissa to [2³¹, 2³²), square it 16 times in 64-bit
  * space (DECIMAL(38) here, HUGEINT in the DuckDB replay), each step
  * emitting one fraction bit — so `L` is a pure integer function of x,
  * identical in any engine with 128-bit intermediates. Scores are then
  * integer SUMS of `L` values (associative, partitioning-independent):
  *   score(c, d) = L(d_c) − L(D) + Σ_t m_t·(L(n_tc + 1) − L(N_c + V))
  * — multinomial NB with Laplace smoothing, every term a Q16 integer.
  * log2 vs ln only rescales all scores by the same factor, so the
  * argmax (and any margin ORDERING) is unchanged.
  *
  * Scale shape: one tokenize pass → (class, token) count table
  * (vocab×classes); the 16-step log recurrence runs ONLY over the
  * DISTINCT count domain (≤ vocab×classes rows, usually far fewer —
  * counts repeat heavily) and joins back; scoring is eval-tokens ×
  * classes LEFT-joined to the model on (class, token) — a plain shuffle
  * hash equi-join with the class table broadcast. No per-row UDF, no
  * driver-side model, no corpus-sized window. Overflow: Q16 scores stay
  * under 2⁶³ for any document below ~2⁴⁰ tokens. Counts must stay below
  * 2³¹ (the mantissa normalization's exactness domain) — beyond that,
  * shard the corpus or widen L to Q32/DECIMAL, documented not silent. */
object NaiveBayes {

  private val D38 = DecimalType(38, 0)

  /** Trained model: `cond` = (cls, tok, lcond = L(n_tc + 1)) — vocab ×
    * classes; `cls` = (cls, lprior = L(d_c) − L(D), ldenom = L(N_c + V))
    * — class-domain sized, broadcastable. */
  final case class NbModel(cond: DataFrame, cls: DataFrame)

  private def materialize(df: DataFrame, tag: String): DataFrame =
    graft.Tables.stage(df, tag)

  /** (x, l) for every distinct positive x in `xs` (single column `x`,
    * 1 ≤ x < 2⁶³): l = p·2¹⁶ + frac where p = floor(log2 x) comes from
    * the binary-string length (no float anywhere) and frac's 16 bits
    * from the square-and-extract recurrence on the 32-bit mantissa —
    * the binary string right-padded to 32 bits for small x
    * (= x << (31−p)) and TRUNCATED to its top 32 bits for x ≥ 2³¹
    * (= x >> (p−31); the dropped bits contribute < 2⁻³¹ relative,
    * far below the 2⁻¹⁶ output quantum, and both engines truncate
    * identically). Each step is a NAMED projection column, so the
    * plan stays linear — never a 6¹⁶-node inlined expression tree. */
  def logTable(xs: DataFrame): DataFrame = {
    def fdiv(a: Column, b: Long): Column =
      ((a - pmod(a, lit(b).cast(D38))) / lit(b).cast(D38)).cast(D38)
    var d = xs.select(col("x").cast("long").as("x")).distinct()
      .withColumn("__p", (length(bin(col("x"))) - 1).cast("long"))
      .withColumn("__m",
        conv(substring(rpad(bin(col("x")), 32, "0"), 1, 32), 2, 10)
          .cast("long").cast(D38))
      .withColumn("__f", lit(0L))
    val two63 = lit(new java.math.BigDecimal("9223372036854775808"))
      .cast(D38)
    for (_ <- 0 until 16) {
      d = d.withColumn("__sq", (col("__m") * col("__m")).cast(D38))
        .withColumn("__b", col("__sq") >= two63)
        .withColumn("__f",
          col("__f") * 2 + when(col("__b"), 1L).otherwise(0L))
        .withColumn("__m", when(col("__b"), fdiv(col("__sq"), 1L << 32))
          .otherwise(fdiv(col("__sq"), 1L << 31)))
    }
    d.select(col("x"), (col("__p") * 65536L + col("__f")).as("l"))
  }

  /** Reference scalar form of the same recurrence (spec parity + the
    * quantization-error contract |L(x)/2¹⁶ − log2 x| < 2⁻¹⁶ + ulp). */
  def log2Q16Ref(x: Long): Long = {
    require(x >= 1, s"log2Q16 domain is [1, 2^63): $x")
    val p = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (p <= 31) x << (31 - p) else x >>> (p - 31) // [2^31, 2^32)
    var frac = 0L
    var i = 0
    while (i < 16) {
      val sq = m * m // unsigned 64-bit: m < 2^32
      if (sq < 0) { frac = frac * 2 + 1; m = sq >>> 32 }
      else { frac = frac * 2; m = sq >>> 31 }
      i += 1
    }
    p.toLong * 65536L + frac
  }

  /** Train on `docs`: one (labelCol, token) count pass, Laplace + prior
    * masses through [[logTable]] (one recurrence over the shared
    * distinct-count domain, joined back — never recomputed per row).
    * Tokenization is the engine's whitespace split ([[graft.functions
    * .Text.tokens]]). Empty-token docs contribute to priors only. */
  def train(docs: DataFrame, labelCol: String, textCol: String,
      tag: String = "graft-nb"): NbModel = {
    require(docs.limit(1).count() > 0,
      "NaiveBayes.train: empty training corpus (L(0) is undefined — " +
        "every prior and denominator mass needs at least one doc)")
    val cnt = materialize(
      docs.select(col(labelCol).as("cls"),
          explode(graft.functions.Text.tokens(col(textCol))).as("tok"))
        .groupBy(col("cls"), col("tok")).agg(count(lit(1)).as("n")),
      s"$tag-cnt")
    val v = cnt.select(col("tok")).distinct().count()
    val dTot = docs.count()
    val pri = docs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("dc"))
    val tot = cnt.groupBy(col("cls")).agg(sum(col("n")).as("nc"))
    // L(V) rides the domain for the all-empty-class denominator (nc=0);
    // the x>=1 screen only ever drops it in the degenerate v=0 corpus,
    // where no class has tokens and classify scores nothing anyway.
    val need = cnt.select((col("n") + 1).as("x"))
      .union(tot.select((col("nc") + lit(v)).as("x")))
      .union(pri.select(col("dc").as("x")))
      .union(cnt.sparkSession.range(1).select(lit(dTot).as("x")))
      .union(cnt.sparkSession.range(1).select(lit(v).as("x")))
      .filter(col("x") >= 1)
    val ltab = materialize(logTable(need), s"$tag-ltab")
    val cond = cnt
      .join(ltab, cnt("n") + 1 === ltab("x"))
      .select(col("cls"), col("tok"), col("l").as("lcond"))
    val lD = ltab.filter(col("x") === dTot)
      .select(col("l").as("__ld")) // 1 row
    // LEFT join pri→tot (r15 advisor): a class whose training docs all
    // tokenize to zero tokens has no cnt rows and so no tot row, but it
    // still owns a prior — coalesce nc to 0 so its denominator is
    // L(0+V) and it stays predictable, honouring the scaladoc's
    // "empty-token docs contribute to priors only".
    val cls = pri.join(tot, Seq("cls"), "left")
      .withColumn("__nc", coalesce(col("nc"), lit(0L)))
      .join(ltab.select(col("x").as("__xn"), col("l").as("__ln")),
        col("__nc") + lit(v) === col("__xn"))
      .join(ltab.select(col("x").as("__xp"), col("l").as("__lp")),
        pri("dc") === col("__xp"))
      .crossJoin(broadcast(lD))
      .select(col("cls"), (col("__lp") - col("__ld")).as("lprior"),
        col("__ln").as("ldenom"))
    NbModel(materialize(cond, s"$tag-cond"),
      materialize(cls, s"$tag-cls"))
  }

  /** Score + argmax for `docs` against a trained model: per doc the
    * winning class (ties to the LEXICOGRAPHICALLY SMALLEST class via
    * the min(struct(−score, cls)) partial agg — never a per-doc rank
    * window) and its exact Q16 score. Docs whose text yields zero
    * tokens are absent (nothing to score). Unseen tokens hit the
    * LEFT-join miss: L(0 + 1) = 0, so they contribute −m·L(N_c+V). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val evTok = docs.select(col(idCol).as("id"),
        explode(graft.functions.Text.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("m"))
    evTok.crossJoin(broadcast(model.cls))
      .join(model.cond, Seq("cls", "tok"), "left")
      .groupBy(col("id"), col("cls"))
      .agg(sum(col("m") * (coalesce(col("lcond"), lit(0L)) -
          col("ldenom"))).as("__s"),
        max(col("lprior")).as("__lp")) // constant within the group
      .select(col("id"), col("cls"),
        (col("__s") + col("__lp")).as("score"))
      .groupBy(col("id"))
      .agg(min(struct((-col("score")).as("ns"), col("cls").as("c")))
        .as("__b"))
      .select(col("id"), col("__b.c").as("pred"),
        (-col("__b.ns")).as("score"))
  }
}
