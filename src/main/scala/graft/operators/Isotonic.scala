package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ISOTONIC REGRESSION (pool-adjacent-violators) — the calibration step
  * between a filter's raw score and a keep probability: the unique
  * monotone non-decreasing fit minimizing squared error to the per-bin
  * positive rates (Barlow et al. 1972; the classifier-calibration
  * workhorse of Zadrozny & Elkan KDD'02). A quality score only orders
  * documents; the isotonic fit is what turns "score 0.7" into "72% of
  * docs at this score pass the audit" without assuming any parametric
  * shape.
  *
  * Scale split, the centroid discipline: the corpus reduces MAP-SIDE to
  * per-bin (n, Σlabel) — one partial agg over the config-sized bin
  * domain — and PAV runs driver-side on those ≤bins rows with EXACT
  * Long fraction arithmetic (merge while s₁·c₂ ≥ s₂·c₁ — no float ever
  * decides a pooling). The emitted fit s∕c is one IEEE division per
  * pool; since IEEE division is correctly rounded, the same rational
  * yields the identical double in any engine, and two DISTINCT pool
  * rates differ by ≥ 1∕(c₁·c₂) — far above double ulp at any corpus
  * size below 2²⁶ rows per bin — so cross-engine comparisons of the
  * fit are provably exact.
  *
  * The oracle deliberately uses a DIFFERENT algorithm: the max-min
  * characterization fit_i = max_{j≤i} min_{k≥i} avg(j..k) (a triple
  * self-join over the bin domain — bin³ work, config-sized), so the
  * gate's hash equality is the PAV = max-min THEOREM checked on real
  * data, not one implementation replayed twice. */
object Isotonic {

  /** Exact PAV over pre-aggregated ordered bins: input (bin, n, pos)
    * ascending by bin, output (bin, n, pos, poolSum, poolN) where
    * poolSum∕poolN is the bin's isotonic fit (shared across its pool).
    * Pools merge while the left rate ≥ the right rate (Long
    * cross-multiplication — products bounded by rows² per pool pair,
    * fine through 2³¹ rows per pool). */
  def pavFit(bins: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    // stack of pools: (startIdx, sumPos, n)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    bins.zipWithIndex.foreach { case ((_, n, pos), i) =>
      var cur = (i, pos, n)
      while (st.nonEmpty &&
          Math.multiplyExact(st.last._2, cur._3) >=
            Math.multiplyExact(cur._2, st.last._3)) {
        val p = st.remove(st.length - 1)
        cur = (p._1, Math.addExact(p._2, cur._2),
          Math.addExact(p._3, cur._3))
      }
      st += cur
    }
    val fits = new Array[(Long, Long)](bins.length)
    val pools = st.toSeq
    pools.zipWithIndex.foreach { case ((start, s, c), pi) =>
      val end = if (pi + 1 < pools.length) pools(pi + 1)._1
        else bins.length
      (start until end).foreach(i => fits(i) = (s, c))
    }
    bins.zipWithIndex.map { case ((b, n, pos), i) =>
      (b, n, pos, fits(i)._1, fits(i)._2)
    }
  }

  /** Distributed front door: reduce `df` to (bin, n, n_pos) with one
    * partial agg, PAV driver-side (the bin domain must be config-sized
    * — the caller owns the binning), return one row per NONEMPTY bin:
    * (bin, n, n_pos, fit) with fit the pooled rate as a double. */
  def isotonicCalibration(df: DataFrame, bin: Column,
      label: Column): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val rows = df.groupBy(bin.cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("n_pos"))
      .orderBy("bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    pavFit(rows)
      .map { case (b, n, pos, s, c) =>
        (b, n, pos, s.toDouble / c.toDouble)
      }
      .toDF("bin", "n", "n_pos", "fit")
  }
}
