package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom._

/** Golden tests for the incremental Delaunay builder — ports the
  * reference's TestNewForPoints (subdivision/subdivision_test.go:40-236):
  * the FULL edge multiset of the built subdivision (frame included) must
  * equal the golden .lines/.wkt corpus, unordered, per-edge undirected.
  * These goldens pin every in-circle tie-break (cocircular quads) to the
  * reference's exact FP trace.
  */
class NewForPointsSpec extends AnyFunSuite {

  private val cmp = Cmp.HiCmp

  private def res(path: String): String = {
    val src = scala.io.Source.fromInputStream(getClass.getResourceAsStream(path))
    try src.mkString finally src.close()
  }

  private def readPoints(path: String): IndexedSeq[Pt] =
    Wkt.decode(res(path)) match {
      case GMultiPoint(ps) => ps
      case GPoint(p)       => Vector(p)
      case other           => fail(s"expected MULTIPOINT in $path, got ${other.getClass}")
    }

  private def readLines(text: String): IndexedSeq[Seg] =
    Wkt.decode(text) match {
      case GMultiLineString(ls) => ls.map(l => Seg(l(0), l(1)))
      case other                => fail(s"expected MULTILINESTRING, got ${other.getClass}")
    }

  private def check(points: IndexedSeq[Pt], expected: IndexedSeq[Seg]): Unit = {
    val sd = Subdivision.forPoints(points).getOrElse(fail("NewForPoints failed"))
    val all = Vector.newBuilder[Seg]
    sd.walkAllEdges { e => all += e.asSeg; true }
    val allLines = all.result()
    assert(allLines.length == expected.length,
      s"edge count: expected ${expected.length}, got ${allLines.length}")
    // unordered multiset compare with tolerance point equality (test flow
    // subdivision_test.go:75-104)
    val seen = Array.fill(allLines.length)(false)
    val missing = expected.filterNot { ln =>
      val j = allLines.indices.find { j =>
        !seen(j) && {
          val aln = allLines(j)
          (cmp.pointEqual(ln.p1, aln.p1) && cmp.pointEqual(ln.p2, aln.p2)) ||
          (cmp.pointEqual(ln.p1, aln.p2) && cmp.pointEqual(ln.p2, aln.p1))
        }
      }
      j.foreach(seen(_) = true)
      j.isDefined
    }
    assert(missing.isEmpty, s"${missing.length} golden edges not found, e.g. ${missing.take(5)}")
  }

  test("one point") {
    check(Vector((0.0, 0.0)), readLines(
      "MULTILINESTRING ((-10 -10,0 0),(0 0,0 10),(0 10,-10 -10),(0 10,10 -10),(10 -10,-10 -10),(10 -10,0 0))"))
  }

  test("two points") {
    check(Vector((0.0, 0.0), (0.0, -6.0)), readLines(
      "MULTILINESTRING ((-10 -76,0 -6),(0 -6,0 0),(0 0,-10 -76),(0 0,0 130),(0 130,-10 -76),(0 130,10 -76),(10 -76,-10 -76),(10 -76,0 -6),(10 -76,0 0))"))
  }

  test("three points") {
    check(Vector((0.0, 0.0), (0.0, -6.0), (-6.0, 6.0)), readLines(
      "MULTILINESTRING ((-46 -136,-6 6),(-6 6,-3 256),(-3 256,-46 -136),(-3 256,40 -136),(40 -136,-46 -136),(40 -136,0 -6),(0 -6,-46 -136),(0 -6,-6 6),(0 -6,0 0),(0 0,-6 6),(0 0,-3 256),(0 0,40 -136))"))
  }

  test("four points") {
    check(Vector((0.0, 0.0), (0.0, -6.0), (-6.0, 6.0), (6.0, 6.0)), readLines(
      "MULTILINESTRING ((76 -136,6 6),(6 6,0 -6),(0 -6,76 -136),(0 -6,-76 -136),(-76 -136,76 -136),(-76 -136,0 256),(0 256,76 -136),(0 256,6 6),(0 256,-6 6),(-6 6,6 6),(-6 6,0 0),(0 0,6 6),(0 0,0 -6),(-6 6,0 -6),(-6 6,-76 -136))"))
  }

  test("colinear folinear") {
    check(Vector((30.0, 4.0), (20.0, 4.0), (20.0, 2.0), (20.0, 6.0), (10.0, 6.0),
      (15.0, 4.0), (17.0, 4.0), (19.0, 3.0)),
      readLines(res("/newforpoints/colinear_folinear.lines")))
  }

  test("trunc something wrong with Florida") {
    check(readPoints("/newforpoints/florida_trucated.points"),
      readLines(res("/newforpoints/florida_trucated_inline_expected.lines")))
  }

  test("intersecting_lines_circle_inclusion_rounding_issue") {
    check(readPoints("/newforpoints/florida_trucated_2.points"), readLines(
      "MULTILINESTRING ((-26 -2939,-1 30),(-1 30,0.500 5420),(0.500 5420,-26 -2939),(0.500 5420,27 -2939),(27 -2939,-26 -2939),(27 -2939,-1 -239),(-1 -239,-26 -2939),(-1 -239,-1 30),(-1 -239,0 -2),(0 -2,-1 30),(0 -2,0 0),(0 0,-1 30),(0 0,0 2),(0 2,-1 30),(0 2,2 -7),(2 -7,-1 30),(2 -7,0.500 5420),(2 -7,27 -2939),(2 -7,-1 -239),(2 -7,0 -2),(2 -7,0 0))"))
  }

  test("bad_external_point") {
    check(readPoints("/newforpoints/nfp/multipoint_bad-external-point_input.wkt"),
      readLines(res("/newforpoints/nfp/multiline_bad-external-point_expected.wkt")))
  }

  test("bad_external_point_full") {
    check(readPoints("/newforpoints/nfp/multipoint_bad-external-point-full_input.wkt"),
      readLines(res("/newforpoints/nfp/multiline_bad-external-point-full_expected.wkt")))
  }

  test("intersecting lines are generated 1") {
    check(readPoints("/newforpoints/nfp/multipoint_intersecting-lines-1_input.wkt"),
      readLines(res("/newforpoints/nfp/multiline_intersecting-lines-1_expected.wkt")))
  }

  test("error failed to insert point 8") {
    check(Vector[Pt]((-1.3625395451e7, 4.551405984e6), (-1.3625385953e7, 4.551392498e6),
      (-1.3625144745e7, 4.551583426e6), (-1.3625317363e7, 4.55141451e6),
      (-1.3625204228e7, 4.551495519e6), (-1.3625225288e7, 4.551499794e6),
      (-1.3625218504e7, 4.55149004e6), (-1.3625167969e7, 4.551553549e6),
      (-1.3625206458e7, 4.551498625e6), (-1.3625137934e7, 4.551573731e6)),
      readLines(res("/newforpoints/failed_to_insert_point_8_lines.wkt")))
  }

  test("issue 96 1") {
    check(readPoints("/newforpoints/issue96/points_1.wkt"),
      readLines(res("/newforpoints/issue96/lines_1.wkt")))
  }

  test("issue 96 simplified") {
    check(readPoints("/newforpoints/issue96/points_simplified.wkt"),
      readLines(res("/newforpoints/issue96/lines_simplified.wkt")))
  }

  test("issue 96 2") {
    check(readPoints("/newforpoints/issue96/points_2.wkt"),
      readLines(res("/newforpoints/issue96/lines_2.wkt")))
  }

  test("counter clockwise error east of china") {
    check(readPoints("/newforpoints/east_of_china.points"),
      readLines(res("/newforpoints/east_of_china_lines.wkt")))
  }

  test("something wrong with Florida") {
    check(readPoints("/newforpoints/florida.points"),
      readLines(res("/newforpoints/florida_expected.lines")))
  }

  test("something wrong with north Africa") {
    check(readPoints("/newforpoints/north_africa.points"),
      readLines(res("/newforpoints/north_africa_lines.wkt")))
  }
}
