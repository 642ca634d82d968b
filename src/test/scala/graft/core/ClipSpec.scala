package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom._

/** Port of /root/reference/planar/clip/linestring_test.go TestClipLineString
  * (all 20 cases) and point clipping.
  */
class ClipSpec extends AnyFunSuite {

  private def P(ps: (Double, Double)*): IndexedSeq[Pt] = ps.toVector
  private def E(minx: Double, miny: Double, maxx: Double, maxy: Double) =
    Some(Extent(minx, miny, maxx, maxy))

  private val ext = IndexedSeq(
    E(0, 0, 10, 10), E(2, 2, 9, 9), E(0, 0, 11, 11), E(-2, -2, 12, 12),
    E(-3, -3, 13, 13), E(-4, -4, 14, 14), E(5, 1, 7, 3), E(0, 5, 2, 7),
    E(0, 5, 2, 7), E(5, 2, 11, 9), E(-1, -1, 11, 11), E(0, 0, 4096, 4096))

  private val zigzag = P((-3, 1), (-3, 9), (11, 9), (11, 2), (5, 2), (5, 8),
    (-1, 8), (-1, 4), (3, 4), (3, 1))

  private def check(i: Int, box: Option[Extent], in: IndexedSeq[Pt],
                    want: IndexedSeq[IndexedSeq[Pt]]): Unit = {
    val got = Clip.lineString(in, box)
    assert(got.length == want.length, s"case $i: line count got=$got want=$want")
    for (j <- want.indices)
      assert(Cmp.Default.lineStringEqual(want(j), got(j)),
        s"case $i line $j: got=${got(j)} want=${want(j)}")
  }

  test("clip linestring reference cases 000-014") {
    check(0, ext(0),
      P((-2, 1), (2, 1), (2, 2), (-1, 2), (-1, 11), (2, 11), (2, 4), (4, 4), (4, 13), (-2, 13)),
      Vector(P((0, 1), (2, 1), (2, 2), (0, 2)), P((2, 10), (2, 4), (4, 4), (4, 10))))
    check(1, ext(0),
      P((-2, 1), (12, 1), (12, 2), (-1, 2), (-1, 11), (2, 11), (2, 4), (4, 4), (4, 13), (-2, 13)),
      Vector(P((0, 1), (10, 1)), P((10, 2), (0, 2)), P((2, 10), (2, 4), (4, 4), (4, 10))))
    check(2, ext(0),
      P((-3, 1), (-3, 9), (11, 9), (11, 2), (5, 2), (5, 8), (-1, 8), (-1, 4), (3, 4), (3, 1)),
      Vector(P((0, 9), (10, 9)), P((10, 2), (5, 2), (5, 8), (0, 8)), P((0, 4), (3, 4), (3, 1))))
    check(3, ext(1), zigzag,
      Vector(P((2, 9), (9, 9)), P((9, 2), (5, 2), (5, 8), (2, 8)), P((2, 4), (3, 4), (3, 2))))
    check(4, ext(2), zigzag,
      Vector(P((0, 9), (11, 9), (11, 2), (5, 2), (5, 8), (0, 8)), P((0, 4), (3, 4), (3, 1))))
    check(5, ext(3), zigzag, Vector(P((-2, 9), (11, 9), (11, 2), (5, 2), (5, 8), (-1, 8), (-1, 4), (3, 4), (3, 1))))
    check(6, ext(4), zigzag, Vector(zigzag))
    check(7, ext(5), zigzag, Vector(zigzag))
    check(8, ext(6), zigzag, Vector(P((7, 2), (5, 2), (5, 3))))
    check(9, ext(7), zigzag, Vector.empty)
    check(10, ext(8), zigzag, Vector.empty)
    check(11, ext(9), zigzag, Vector(P((5, 9), (11, 9), (11, 2), (5, 2), (5, 8))))
    check(12, ext(9),
      P((-3, 1), (-3, 10), (12, 10), (12, 1), (4, 1), (4, 8), (-1, 8), (-1, 4), (3, 4), (3, 1)),
      Vector.empty)
    check(13, ext(0),
      P((-3, -3), (-3, 10), (12, 10), (12, 1), (4, 1), (4, 8), (-1, 8), (-1, 4), (3, 4), (3, 3)),
      Vector(P((0, 10), (10, 10)), P((10, 1), (4, 1), (4, 8), (0, 8)), P((0, 4), (3, 4), (3, 3))))
    check(14, ext(10),
      P((-1, -1), (12, -1), (12, 12), (-1, 12)),
      Vector(P((-1, -1), (11, -1))))
  }

  test("clip linestring case 015: long out-of-box path crossing a corner") {
    val in = P((7848, 19609), (7340, 18835), (6524, 17314), (6433, 17163), (5178, 15057),
      (5147, 15006), (4680, 14226), (3861, 12766), (2471, 10524), (2277, 10029),
      (1741, 8281), (1655, 8017), (1629, 7930), (1437, 7368), (973, 5481), (325, 4339),
      (-497, 3233), (-1060, 2745), (-1646, 2326), (-1883, 2156), (-2002, 2102),
      (-2719, 1774), (-3638, 1382), (-3795, 1320), (-5225, 938), (-6972, 295),
      (-7672, -88), (-8243, -564), (-8715, -1112), (-9019, -1573), (-9235, -2067),
      (-9293, -2193), (-9408, -2570), (-9823, -4630), (-10118, -5927), (-10478, -7353),
      (-10909, -8587), (-11555, -9743), (-11837, -10005), (-12277, -10360),
      (-13748, -11189), (-14853, -12102), (-15806, -12853), (-16711, -13414))
    check(15, ext(11), in, Vector(P((144.397830, 4096), (0, 3901.712895))))
  }

  test("clip linestring degenerate cases 016-019") {
    check(16, ext(11), P(), Vector.empty)
    check(17, ext(11), P((-1, 1), (1, -1)), Vector.empty)
    check(18, None, P((-1, 1), (1, -1)), Vector(P((-1, 1), (1, -1))))
    // single point is invalid — reference errors, we drop
    check(19, ext(11), P((-1, 1)), Vector.empty)
  }

  test("clip multipoint filters by closed box (clip/point.go)") {
    val pts = P((0, 0), (5, 5), (10, 10), (11, 11), (-1, 5))
    assert(Clip.multiPoint(pts, ext(0)) == P((0, 0), (5, 5), (10, 10)))
    assert(Clip.multiPoint(pts, None) == pts)
  }
}
