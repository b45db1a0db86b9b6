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

  test("the pruning claim, measured: UNALIGNED 256-cell runs (real file " +
      "boundaries) get far smaller bounding boxes under Hilbert than " +
      "under Morton") {
    // model: each output file holds 256 consecutive curve indices; the
    // file's parquet footer bounds are the (x, y) bounding box of its
    // cells; smaller boxes = more scans pruned. PERFECTLY quadrant-
    // aligned runs are Morton's best case (both curves tile 16x16
    // boxes, total 65536) — but file boundaries don't align to quadrant
    // boundaries in practice, so measure runs offset by half a file:
    // Hilbert's unit-step curve stays compact, Morton's boundary jumps
    // blow the box up.
    val n = 256
    def boxes(index: (Long, Long) => Long): Seq[Long] = {
      val byD = new Array[(Int, Int)](n * n)
      for (x <- 0 until n; y <- 0 until n)
        byD(index(x.toLong, y.toLong).toInt) = (x, y)
      byD.drop(128).grouped(256).filter(_.length == 256).map { run =>
        val xs = run.map(_._1)
        val ys = run.map(_._2)
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1).toLong
      }.toSeq
    }
    val h = boxes(HilbertExpr.hilbert8)
    val m = boxes(ZOrderExpr.interleave16)
    assert(h.sum * 2 < m.sum, // not just smaller: at least 2x tighter
      s"Hilbert unaligned-run box total ${h.sum} vs Morton ${m.sum}")
    assert(h.max <= m.max, s"worst box: hilbert ${h.max} vs morton ${m.max}")
  }
}
