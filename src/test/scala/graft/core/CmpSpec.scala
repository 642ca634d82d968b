package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom._

/** Ports the reference's cmp package test corpus
  * (/root/reference/cmp/cmp_test.go): RotateToLeftMostPoint, FindMinIdx,
  * Float64 (ULP + epsilon-near-zero + infinities), and the normalizing
  * LineString / Polygon equality vectors — including the "first ring not
  * same" case that pins the polygon MAIN ring at index 0 (by_xy.go:25-31).
  */
class CmpSpec extends AnyFunSuite {

  private def P(ps: (Double, Double)*): IndexedSeq[Pt] = ps.toIndexedSeq

  // ---- TestRotateToLeftMostPoint (cmp_test.go:18-60) ----
  private val rotateCases = Seq(
    P((11, 10), (9, 8), (7, 6), (5, 4)),
    P((0, 10), (9, 8), (7, 6), (5, 4)),
    P((0, 10)),
    P((3, 100), (4, -5), (6, 90), (4, 15)),
    P((1, 5), (1, 2), (1, 3), (1, 4)),
    P((1, 2), (1, 3), (1, 4), (1, 5)))

  test("rotateToLeftMostPoint: min point first, cyclic order preserved") {
    for (tc <- rotateCases) {
      val minIdx = tc.indices.minBy(tc)(Cmp.byXY)
      val rotated = Cmp.rotateToLeftMostPoint(tc)
      assert(rotated.head == tc(minIdx))
      for (i <- tc.indices)
        assert(rotated(i) == tc((minIdx + i) % tc.length),
          s"cyclic order broken at $i for $tc")
    }
  }

  // ---- TestFindMinIdx (cmp_test.go:71-124) ----
  test("find-min-index under x-then-y ordering") {
    val cases = Seq(
      (P(), 0),
      (P((11, 10), (9, 8), (7, 6), (5, 4)), 3),
      (P((0, 10), (9, 8), (7, 6), (5, 4)), 0),
      (P((0, 10)), 0),
      (P((3, 100), (4, -5), (6, 90), (4, 15)), 0),
      (P((1, 5), (1, 2), (1, 3), (1, 4)), 1),
      (P((1, 2), (1, 3), (1, 4), (1, 5)), 0))
    for ((line, want) <- cases) {
      val got = if (line.isEmpty) 0 else line.indices.minBy(line)(Cmp.byXY)
      assert(got == want, s"minIdx($line)")
    }
  }

  // ---- TestFloat64 (cmp_test.go:917-1022) ----
  test("Float64: epsilon near zero, ULP elsewhere, infinities exact") {
    val bitTol2 = java.lang.Double.doubleToLongBits(1.1) -
      java.lang.Double.doubleToLongBits(1.0)
    val negZero = java.lang.Double.longBitsToDouble(1L << 63)
    val inf = Double.PositiveInfinity
    def f64(f1: Double, f2: Double, tol: Double, bit: Long): Boolean =
      Cmp(tol, bit).float(f1, f2)
    assert(f64(0.11, 0.111, 0.01, bitTol2))
    assert(!f64(0.11, 0.121, 0.01, bitTol2))
    assert(f64(0.0, 0.001, 0.01, bitTol2))
    assert(!f64(0.0, 0.02, 0.01, bitTol2))
    assert(f64(0.0, 0.0, 0.01, bitTol2))
    assert(f64(0.0, negZero, 0.01, bitTol2))
    assert(f64(inf, inf, 0, 0))
    assert(!f64(inf, -inf, 0, 0))
    assert(!f64(inf, 1.001, 0, 0))
    assert(!f64(-inf, inf, 0, 0))
    assert(f64(-inf, -inf, 0, 0))
    assert(!f64(-inf, 1.001, 0, 0))
    assert(!f64(1.001, inf, 0, 0))
    assert(!f64(1.001, -inf, 0, 0))
  }

  // ---- TestPoint (cmp_test.go:126-193) ----
  test("point equality and x-then-y less") {
    val c = Cmp.Default
    assert(c.pointEqual((1, 2), (1, 2)))
    assert(!c.pointEqual((1, 1), (1, 2)))
    assert(!c.pointEqual((1, 2), (2, 2)))
    assert(!c.pointEqual((1, 1), (2, 2)))
    assert(Cmp.pointLess((1, 1), (1, 2)) && !Cmp.pointLess((1, 2), (1, 1)))
    assert(Cmp.pointLess((1, 2), (2, 2)) && !Cmp.pointLess((2, 2), (1, 2)))
  }

  // ---- TestLineString (cmp_test.go:272-347) ----
  test("linestring equality is rotation-free but not order-free") {
    val c = Cmp.Default
    val base = P((1, 2), (1, 3), (1, 4), (1, 5))
    assert(c.lineStringEqual(base, base))
    assert(c.lineStringEqual(P((1, 5), (1, 2), (1, 3), (1, 4)), base))
    assert(c.lineStringEqual(P((1, 4), (1, 5), (1, 2), (1, 3)), base))
    assert(c.lineStringEqual(P(), P()))
    assert(!c.lineStringEqual(base, P((1, 2), (1, 3), (1, 4))))
    assert(!c.lineStringEqual(base, P((1, 5), (1, 2), (1, 4), (1, 4))))
  }

  // ---- TestPolygon (cmp_test.go:454-568) ----
  test("polygon equality: holes sort, the main ring is pinned") {
    val c = Cmp.Default
    def ply(rs: IndexedSeq[Pt]*): IndexedSeq[IndexedSeq[Pt]] = rs.toIndexedSeq
    val r1 = P((1, 2), (1, 3), (1, 4), (1, 5))
    assert(c.polygonEqual(ply(r1), ply(r1)))
    assert(c.polygonEqual(ply(P((1, 5), (1, 2), (1, 3), (1, 4))), ply(r1)))
    assert(c.polygonEqual(ply(), ply()))
    assert(!c.polygonEqual(ply(P((1, 5), (1, 2), (1, 3), (1, 4))),
      ply(P((1, 2), (1, 3), (1, 4)))))
    assert(!c.polygonEqual(ply(P((1, 5), (1, 2), (1, 3), (1, 4))),
      ply(P((1, 2), (1, 3), (1, 4), (1, 6)))))
    // "first ring not same": swapping main ring and hole is NOT equal
    val a = ply(P((1, 5), (1, 2), (1, 3), (1, 4)), P((2, 5), (2, 2), (2, 3), (2, 4)))
    val b = ply(P((2, 5), (2, 2), (2, 3), (2, 4)), P((1, 5), (1, 2), (1, 3), (1, 4)))
    assert(!c.polygonEqual(a, b))
    // ...but two HOLES may appear in either order
    val h1 = P((2, 5), (2, 2), (2, 3), (2, 4))
    val h2 = P((3, 5), (3, 2), (3, 3), (3, 4))
    assert(c.polygonEqual(ply(r1, h1, h2), ply(r1, h2, h1)))
  }

  // ---- TestMultiPoint (cmp_test.go:194-270) — order-free ----
  test("multipoint equality is order-free") {
    val c = Cmp.Default
    assert(c.multiPointEqual(P((3, 3), (1, 1), (2, 2)), P((1, 1), (2, 2), (3, 3))))
    assert(!c.multiPointEqual(P((3, 3), (1, 1)), P((1, 1), (2, 2))))
    assert(!c.multiPointEqual(P((3, 3), (1, 1), (2, 2)), P((1, 1), (2, 2))))
  }
}
