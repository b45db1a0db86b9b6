package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Skyline]] — hand fixture with duplicates and vertical stacks,
  * grid-width edge cases, and a 300-point brute-force property sweep
  * across grid sizes (the 1-cell grid degenerates to the pure sorted
  * scan, so the prune path is tested AGAINST its own no-prune form). */
class SkylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(pts: Seq[(Long, Long, Long)], grid: Int) = {
    import spark.implicits._
    Skyline.skyline2d(pts.toDF("id", "x", "y"), col("id"), col("x"),
        col("y"), grid)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
  }

  private def brute(pts: Seq[(Long, Long, Long)]) = {
    val dom = (a: (Long, Long), b: (Long, Long)) => // a dominates b
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    pts.groupBy(p => (p._2, p._3)).toSeq
      .filter { case (g, _) =>
        !pts.exists(p => dom((p._2, p._3), g)) }
      .map { case ((x, y), rows) =>
        (x, y, rows.size.toLong, rows.map(_._1).min) }
      .sortBy(t => (t._1, t._2))
  }

  test("hand fixture: duplicates grouped, vertical stack collapses, " +
      "dominated rows gone — identical across grid sizes") {
    // min x, max y: skyline = (1,10)x2, (2,12), (3,15);
    // (2,9) loses to (2,12), (5,15) loses to (3,15)
    val pts = Seq((10L, 1L, 10L), (11L, 2L, 12L), (12L, 2L, 9L),
      (13L, 3L, 15L), (14L, 5L, 15L), (9L, 1L, 10L))
    val want = Seq((1L, 10L, 2L, 9L), (2L, 12L, 1L, 11L),
      (3L, 15L, 1L, 13L))
    for (g <- Seq(1, 2, 64)) assert(run(pts, g) === want, s"grid=$g")
    assert(brute(pts) === want) // the brute checker agrees on the plant
  }

  test("degenerate inputs: empty, single point, all-identical") {
    assert(run(Seq.empty, 8) === Seq.empty)
    assert(run(Seq((7L, 3L, 4L)), 8) === Seq((3L, 4L, 1L, 7L)))
    assert(run(Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 5L)), 8) ===
      Seq((5L, 5L, 3L, 1L)))
  }

  test("property: 300 deterministic pseudo-random points == brute " +
      "force, for grid 1 / 7 / 64, including negative coordinates") {
    val pts = (0 until 300).map { i =>
      val h = (i * 2654435761L) & 0xffffffffL
      (i.toLong, (h % 97L) - 40L, ((h >> 7) % 89L) - 44L)
    }
    val want = brute(pts)
    for (g <- Seq(1, 7, 64))
      assert(run(pts, g) === want, s"grid=$g diverges from brute force")
  }
}
