package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The two defining properties of the Hilbert curve, checked exhaustively
  * over the full 256x256 grid, plus the locality contrast with the Morton
  * curve that motivates offering both layout keys. */
class HilbertSpec extends AnyFunSuite {

  test("hilbert8 is a bijection grid -> [0, 65535] and consecutive " +
      "indices are ADJACENT cells (|dx|+|dy| == 1, exhaustively)") {
    val n = 256
    val byD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertExpr.hilbert8(x.toLong, y.toLong).toInt
      assert(d >= 0 && d < n * n, s"index $d out of range for ($x,$y)")
      assert(byD(d) == null, s"collision at d=$d: ${byD(d)} and ($x,$y)")
      byD(d) = (x, y)
    }
    // bijection established (65536 cells, no collision, full range);
    // now the unit-step property — the curve never jumps
    (1 until n * n).foreach { d =>
      val (x1, y1) = byD(d - 1)
      val (x2, y2) = byD(d)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("Morton contrast: zorder16 DOES jump (the property Hilbert " +
      "clustering buys) — max consecutive-index step is grid-sized") {
    val n = 256
    val byZ = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      byZ(ZOrderExpr.interleave16(x.toLong, y.toLong).toInt) = (x, y)
    val maxJump = (1 until n * n).map { z =>
      val (x1, y1) = byZ(z - 1)
      val (x2, y2) = byZ(z)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxJump > 1, "Morton unexpectedly unit-step")
    assert(maxJump >= n / 2, s"expected a grid-scale Morton jump, got $maxJump")
  }

  test("masking: only the low 8 bits of each key participate") {
    assert(HilbertExpr.hilbert8(0x1234567800L + 7, 0xFF00L + 9) ==
      HilbertExpr.hilbert8(7L, 9L))
  }
}
