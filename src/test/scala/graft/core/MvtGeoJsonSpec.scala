package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom._

/** MVT prepare/encode + GeoJSON codec semantics
  * (reference encoding/mvt/{prepare,feature}.go, encoding/geojson).
  */
class MvtGeoJsonSpec extends AnyFunSuite {

  private def P(ps: (Double, Double)*): IndexedSeq[Pt] = ps.toVector

  test("preparePt: y-flip + truncation toward zero (prepare.go:73-78)") {
    val tile = Extent(0, 0, 100, 100)
    assert(Mvt.preparePt((50, 50), tile, 4096) == (2048.0, 2048.0))
    assert(Mvt.preparePt((0, 100), tile, 4096) == (0.0, 0.0))     // top-left
    assert(Mvt.preparePt((100, 0), tile, 4096) == (4096.0, 4096.0)) // bottom-right
  }

  test("prepareLineString dedupes collapsed points and drops degenerates") {
    val tile = Extent(0, 0, 4096, 4096)
    // two input points collapse to the same pixel (both trunc to (0, 4095))
    val ls = Mvt.prepareLineString(P((0.2, 0.2), (0.7, 0.7), (100, 100)), tile, 4096)
    assert(ls == P((0, 4095), (100, 3996)))
    // all collapse ⇒ dropped
    assert(Mvt.prepareLineString(P((0.2, 0.2), (0.7, 0.7)), tile, 4096).isEmpty)
  }

  test("preparePolygon strips closing pixel and rectifies winding") {
    val tile = Extent(0, 0, 4096, 4096)
    val rings = Vector(P((0, 0), (1000, 0), (1000, 1000), (0, 1000)))
    val prep = Mvt.preparePolygon(rings, tile, 4096)
    assert(prep.length == 1)
    // exterior must be clockwise in the y-up order (prepare.go:130-134)
    assert(Winding.ofPoints(prep.head) == Winding.Clockwise)
  }

  test("zigzag + command encoding (feature.go:94-119)") {
    assert(Mvt.zigzag(0) == 0)
    assert(Mvt.zigzag(-1) == 1)
    assert(Mvt.zigzag(1) == 2)
    assert(Mvt.zigzag(-2) == 3)
    assert(Mvt.command(Mvt.CmdMoveTo, 1) == 9)   // (1 & 7) | (1 << 3)
    assert(Mvt.command(Mvt.CmdLineTo, 3) == 26)  // 2 | 24
    assert(Mvt.command(Mvt.CmdClosePath, 1) == 15)
  }

  test("encode point / linestring command streams (MVT spec examples)") {
    // MVT spec: POINT(25,17) → [9, 50, 34]
    val (pc, pt) = Mvt.encodeGeometry(GPoint((25, 17)))
    assert(pt == 1 && pc == Vector(9L, 50L, 34L))
    // MVT spec: LINESTRING (2 2, 2 10, 10 10) → [9,4,4,18,0,16,16,0]
    val (lc, lt) = Mvt.encodeGeometry(GLineString(P((2, 2), (2, 10), (10, 10))))
    assert(lt == 2 && lc == Vector(9L, 4L, 4L, 18L, 0L, 16L, 16L, 0L))
  }

  test("encode polygon enforces y-down winding after int64 truncation") {
    // MVT spec example: POLYGON (3 6, 8 12, 20 34) CW in screen coords
    val (cmds, tpe) = Mvt.encodeGeometry(GPolygon(Vector(P((3, 6), (8, 12), (20, 34)))))
    assert(tpe == 3)
    assert(cmds == Vector(9L, 6L, 12L, 18L, 10L, 12L, 24L, 44L, 15L))
  }

  test("geojson round trip all types (geojson.go ring closure rules)") {
    val geoms: Seq[Geometry] = Seq(
      GPoint((1.5, -2.5)),
      GMultiPoint(P((1, 2), (3, 4))),
      GLineString(P((0, 0), (1, 1))),
      GMultiLineString(Vector(P((0, 0), (1, 1)), P((2, 2), (3, 3)))),
      GPolygon(Vector(P((0, 0), (10, 0), (10, 10), (0, 10)), P((2, 2), (3, 2), (3, 3)))),
      GMultiPolygon(Vector(Vector(P((0, 0), (5, 0), (5, 5))))),
      GCollection(Vector(GPoint((7, 8))))
    )
    for (g <- geoms) assert(GeoJson.decode(GeoJson.encode(g)) == g, s"roundtrip $g")
  }

  test("geojson polygons closed on encode, stripped on decode") {
    val json = GeoJson.encode(GPolygon(Vector(P((0, 0), (10, 0), (10, 10)))))
    assert(json.contains("[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,0.0]"))
    val g = GeoJson.decode("""{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,0]]]}""")
    assert(g == GPolygon(Vector(P((0, 0), (10, 0), (10, 10)))))
  }

  test("geojson decode errors on garbage") {
    intercept[Exception](GeoJson.decode("""{"type":"Nope","coordinates":[]}"""))
    intercept[Exception](GeoJson.decode("""not json"""))
  }
}
