package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Distributed ordinary least squares via the normal equations — the
  * classical scale shape for linear model fitting (and the one Spark
  * MLlib's `LinearRegression(solver="normal")` uses): a SINGLE
  * partial-aggregating pass over the data computes the O(p²) moment sums
  * X'X and X'y, the driver solves the tiny p×p system, and the model is a
  * handful of doubles. Nothing downstream of the one scan depends on data
  * size — at 100 TB the entire reduce traffic is nine numbers.
  *
  * Exactness contract: inputs are integerized per row (the caller maps
  * its columns to exact integer features — cents, percent points, counts),
  * the moment sums accumulate as DECIMAL(38,0) (no silent long overflow,
  * no float summation-order noise), and the driver verifies every sum is
  * below 2^53 before converting to double, so the conversion is exact and
  * the closed-form Cramer solve is a fixed IEEE expression tree that any
  * engine replays bit-for-bit. Floating point only enters in the last,
  * deterministic step.
  */
object Linreg {

  /** Fit y = b0 + b1·x1 + b2·x2. The columns must already be exact
    * integer-valued; they are cast to long per row. Returns 3 rows
    * (term, coef) — `names` labels (intercept, x1, x2). Throws if the
    * design matrix is singular or a moment sum exceeds 2^53 (at which
    * point rescale the features — the contract is exactness, not luck). */
  def fitOLS2(df: DataFrame, y: Column, x1: Column, x2: Column,
      names: (String, String, String)): DataFrame = {
    val d38 = "decimal(38,0)"
    def s(c: Column) = sum(c.cast(d38))
    val r: Row = df
      .select(y.cast("long").as("y"), x1.cast("long").as("x1"),
        x2.cast("long").as("x2"))
      .agg(count(lit(1)).as("n"),
        s(col("x1")).as("s1"), s(col("x2")).as("s2"),
        s(col("x1") * col("x1")).as("s11"),
        s(col("x1") * col("x2")).as("s12"),
        s(col("x2") * col("x2")).as("s22"),
        s(col("y")).as("sy"),
        s(col("x1") * col("y")).as("s1y"),
        s(col("x2") * col("y")).as("s2y"))
      .collect()(0)
    val exactCap = BigDecimal(1L << 53)
    def g(i: Int): Double = {
      val v = BigDecimal(r.getDecimal(i))
      require(v.abs <= exactCap,
        s"moment sum $v exceeds 2^53 — rescale the features")
      v.toDouble
    }
    val n = r.getLong(0).toDouble
    val (s1, s2) = (g(1), g(2))
    val (s11, s12, s22) = (g(3), g(4), g(5))
    val (sy, s1y, s2y) = (g(6), g(7), g(8))
    // Cramer on A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], b = [sy,s1y,s2y]
    // — the exact expression trees the oracle replays
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    require(det != 0.0, "singular design matrix")
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(names._1, det0 / det),
        Row(names._2, det1 / det),
        Row(names._3, det2 / det)),
      StructType(Seq(StructField("term", StringType, nullable = false),
        StructField("coef", DoubleType, nullable = false))))
  }
}
