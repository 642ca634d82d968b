package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom._

/** WKT/WKB codec semantics (reference encoding/wkt, encoding/wkb). */
class CodecSpec extends AnyFunSuite {

  private def P(ps: (Double, Double)*): IndexedSeq[Pt] = ps.toVector

  test("wkt encode basics (wkt_encode.go)") {
    assert(Wkt.encode(GPoint((10, 10))) == "POINT (10 10)")
    assert(Wkt.encode(GPoint(EmptyPt)) == "POINT EMPTY")
    assert(Wkt.encode(GLineString(P((1, 2), (3, 4)))) == "LINESTRING (1 2,3 4)")
    assert(Wkt.encode(GPolygon(Vector(P((0, 0), (10, 0), (10, 10), (0, 10))))) ==
      "POLYGON ((0 0,10 0,10 10,0 10,0 0))") // ring closed on output
    assert(Wkt.encode(GMultiPoint(P((1, 1), (2, 2)))) == "MULTIPOINT (1 1,2 2)")
    assert(Wkt.encode(GPoint((1.5, -2.25))) == "POINT (1.5 -2.25)")
  }

  test("wkt decode: rings closed in text, closing point stripped (wkt_decode.go:560-566)") {
    val g = Wkt.decode("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(g == GPolygon(Vector(P((0, 0), (10, 0), (10, 10), (0, 10)))))
    // unclosed ring is an error
    intercept[Wkt.ParseException] {
      Wkt.decode("POLYGON ((0 0, 10 0, 10 10, 0 10))")
    }
  }

  test("wkt decode: EWKT SRID prefix (wkt_decode.go:381-446)") {
    val (srid, g) = Wkt.decodeWithSrid("SRID=4326;POINT (1 2)")
    assert(srid == 4326 && g == GPoint((1, 2)))
  }

  test("wkt decode: multipoint both forms + collections") {
    assert(Wkt.decode("MULTIPOINT (1 2, 3 4)") == GMultiPoint(P((1, 2), (3, 4))))
    assert(Wkt.decode("MULTIPOINT ((1 2), (3 4))") == GMultiPoint(P((1, 2), (3, 4))))
    val c = Wkt.decode("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    assert(c == GCollection(Vector(GPoint((1, 2)), GLineString(P((0, 0), (1, 1))))))
    assert(Wkt.decode("GEOMETRYCOLLECTION EMPTY") == GCollection(Vector.empty))
  }

  test("wkt round trip on random-ish coordinates") {
    val geoms: Seq[Geometry] = Seq(
      GPoint((-77.035915, 38.889814)),
      GLineString(P((1.25e-7, -3.5), (1e21, 2.0))),
      GMultiPolygon(Vector(
        Vector(P((0, 0), (10, 0), (10, 10)), P((1, 1), (2, 1), (2, 2))),
        Vector(P((20, 20), (30, 20), (30, 30)))))
    )
    for (g <- geoms)
      assert(Wkt.decode(Wkt.encode(g)) == g, s"roundtrip $g")
  }

  test("wkb round trip all types") {
    val geoms: Seq[Geometry] = Seq(
      GPoint((1.5, -2.5)),
      GMultiPoint(P((1, 2), (3, 4))),
      GLineString(P((0, 0), (1, 1), (2, 0))),
      GMultiLineString(Vector(P((0, 0), (1, 1)), P((5, 5), (6, 6), (7, 5)))),
      GPolygon(Vector(P((0, 0), (10, 0), (10, 10), (0, 10)), P((2, 2), (3, 2), (3, 3)))),
      GMultiPolygon(Vector(
        Vector(P((0, 0), (10, 0), (10, 10))),
        Vector(P((20, 20), (30, 20), (30, 30)), P((22, 22), (24, 22), (24, 24))))),
      GCollection(Vector(GPoint((9, 9)), GLineString(P((0, 0), (1, 0)))))
    )
    for (g <- geoms)
      assert(Wkb.decode(Wkb.encode(g)) == g, s"roundtrip $g")
  }

  test("wkb decode: big-endian and EWKB SRID flag (wkb.go, decode.go)") {
    // hand-build big-endian point
    val bb = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(0.toByte); bb.putInt(1); bb.putDouble(1.5); bb.putDouble(2.5)
    assert(Wkb.decode(bb.array()) == GPoint((1.5, 2.5)))
    // little-endian EWKB with SRID
    val eb = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    eb.put(1.toByte); eb.putInt(1 | Wkb.SridFlag); eb.putInt(4326)
    eb.putDouble(3.0); eb.putDouble(4.0)
    val (srid, g) = Wkb.decodeWithSrid(eb.array())
    assert(srid == 4326 && g == GPoint((3.0, 4.0)))
  }

  test("wkb decode: known byte stream (point tcase format)") {
    // 01 01000000 000000000000F03F 0000000000000040 = POINT(1 2) LE
    val hex = "0101000000000000000000F03F0000000000000040"
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(Wkb.decode(bytes) == GPoint((1.0, 2.0)))
  }

  test("wkt decode: Z/M/ZM rejected like the reference public decoder (wkt_decode.go:155-173,380-452)") {
    // The reference's PUBLIC wkt.Decode path is strictly 2-D: readPoint reads
    // exactly two floats, and a dimension tag after the geometry keyword hits
    // the '(' expectation. (The M/ZM tolerance in internal/token/token.go:153-204
    // is reachable only from the unexported fuzz cmd, not the public API.)
    intercept[Wkt.ParseException] { Wkt.decode("POINT Z (1 2 3)") }
    intercept[Wkt.ParseException] { Wkt.decode("POINT M (1 2 3)") }
    intercept[Wkt.ParseException] { Wkt.decode("POINT ZM (1 2 3 4)") }
    intercept[Wkt.ParseException] { Wkt.decode("POINT (1 2 3)") }
    intercept[Wkt.ParseException] { Wkt.decode("LINESTRING (1 2 3, 4 5 6)") }
    intercept[Wkt.ParseException] { Wkt.decode("POLYGON Z ((0 0 0, 1 0 0, 1 1 0, 0 0 0))") }
    // keyword glued to '(' stays legal in both decoders
    assert(Wkt.decode("POINT(1 2)") == GPoint((1, 2)))
  }

  test("wkb decode: Z/M/ZM type codes rejected (wkb.go:149 ErrUnknownGeometryType)") {
    // Both decoders mask ONLY the EWKB SRID flag off the raw type word; ISO
    // Z/M codes (base+1000/2000/3000) and the 0x80000000 Z-flag form fall
    // through to the unknown-type error.
    def le(tpe: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + 32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).putInt(tpe).putDouble(1.0).putDouble(2.0).putDouble(3.0)
      bb.array()
    }
    for (tpe <- Seq(1001, 2001, 3001, 0x80000001))
      intercept[Wkb.WkbException] { Wkb.decode(le(tpe)) }
  }

  test("geometry equality via cmp (compare.go normalization)") {
    val c = Cmp.Default
    // polygons equal regardless of ring rotation
    val a = GPolygon(Vector(P((0, 0), (10, 0), (10, 10), (0, 10))))
    val b = GPolygon(Vector(P((10, 10), (0, 10), (0, 0), (10, 0))))
    assert(c.geometryEqual(a, b))
    // multipoints equal regardless of order
    assert(c.geometryEqual(GMultiPoint(P((3, 3), (1, 1))), GMultiPoint(P((1, 1), (3, 3)))))
    assert(!c.geometryEqual(GPoint((1, 1)), GPoint((1, 1.001))))
    assert(c.geometryEqual(GPoint(EmptyPt), GPoint(EmptyPt)))
  }
}
