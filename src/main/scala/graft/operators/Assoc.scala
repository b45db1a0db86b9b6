package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association mining over (basket, item) rows — the market-basket
  * 2-itemset stage (Agrawal & Srikant, VLDB'94's frequent-pair core):
  * which items co-occur more than their popularity predicts. For a
  * training-data platform the baskets are documents and the items
  * tokens/tags/sources — the co-occurrence graph behind related-term
  * suggestion, tag correlation screens, and topic-leakage checks
  * (an eval tag lifting a train tag is a contamination smell).
  *
  * Measures are EXACT integer basis points — support, both
  * confidences, and lift (`c_ab·n / (c_a·c_b)`), so the oracle replays
  * every number with no float boundary. The exact-lift envelope is
  * `c_ab·n·10⁴ < 2⁶³` (~3·10⁷ baskets at worst-case c_ab = n); past
  * that a production run computes lift as a DOUBLE ranking signal —
  * the bp form is the oracle-verifiable contract at gate scale.
  *
  * Scale shape: item frequencies are one partial agg; the candidate
  * item set is TOP-V BY FREQUENCY (broadcast — the frequency-cap
  * discipline: per-basket fan-out is bounded by V, so the pair join
  * emits ≤ V² rows per basket instead of |basket|²); pairs come from
  * ONE self-equi-join on the basket key (shuffle hash, never
  * broadcast-corpus); the result is ≤ V² rows.
  */
object Assoc {

  /** 2-itemset measures. `baskets`: DISTINCT (basket: long, item:
    * string) rows. Top-`topV` items by (frequency desc, item) are the
    * candidate set. Returns one row per unordered pair (item_a <
    * item_b) that co-occurs at least once. */
  def pairMeasures(baskets: DataFrame, topV: Int): DataFrame = {
    require(topV >= 2, s"topV must be >= 2, got $topV")
    val ic = baskets.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val top = ic.orderBy(col("c").desc, col("item")).limit(topV)
    val k = baskets.join(broadcast(top), Seq("item"))
    val n = baskets.agg(countDistinct(col("basket")).as("n_baskets"))
    val pairs = k.as("a")
      .join(k.as("b"),
        col("a.basket") === col("b.basket") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(max(col("a.c")).as("c_a"), max(col("b.c")).as("c_b"),
        count(lit(1)).as("c_ab"))
    pairs.crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        col("c_a"), col("c_b"), col("c_ab"),
        expr("c_ab * 10000 div n_baskets").as("support_bp"),
        expr("c_ab * 10000 div c_a").as("conf_ab_bp"),
        expr("c_ab * 10000 div c_b").as("conf_ba_bp"),
        // Overflow guard (the p18 posture), BOTH sides of the division:
        // the numerator c_ab·n·10⁴ and the denominator c_a·c_b each wrap
        // BIGINT silently in Spark while DuckDB's HUGEINT products raise
        // — a divergent failure mode. Fail loudly past either envelope;
        // at that corpus size production ranks by DOUBLE lift instead.
        expr("CASE WHEN c_ab <= 922337203685477 div n_baskets " +
          "AND c_a <= 9223372036854775807 div c_b THEN " +
          "c_ab * n_baskets * 10000 div (c_a * c_b) " +
          "ELSE raise_error(concat('Assoc: c_ab*n_baskets = ', c_ab, '*', " +
          "n_baskets, ' or c_a*c_b = ', c_a, '*', c_b, ' exceeds the " +
          "exact-lift BIGINT envelope — compute lift as DOUBLE past " +
          "~3e7 baskets')) END")
          .as("lift_bp"))
  }
}
