package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity / l-diversity report: hand-computed groups and the
  * empty-input zeros contract. */
class PrivacySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed groups: sizes, risk counts, min diversity") {
    import spark.implicits._
    // QI (zip): group A = 3 rows (2 sensitive values), B = 1 row (1 value)
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"))
      .toDF("zip", "disease")
    val r = Privacy.kAnonymityReport(df, Seq(col("zip")), col("disease"),
      k = 2).collect()(0)
    assert(r.getInt(0) == 2)      // k
    assert(r.getLong(1) == 2L)    // n_groups
    assert(r.getLong(2) == 1L)    // min_group (B)
    assert(r.getLong(3) == 1L)    // groups_at_risk (B)
    assert(r.getLong(4) == 1L)    // rows_at_risk (B's row)
    assert(r.getLong(5) == 1L)    // min_l (B has one sensitive value)
  }

  test("empty input reports zeros, not nulls") {
    import spark.implicits._
    val df = Seq.empty[(String, String)].toDF("zip", "disease")
    val r = Privacy.kAnonymityReport(df, Seq(col("zip")), col("disease"),
      k = 5).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((0L, 0L, 0L, 0L, 0L)))
  }
}
