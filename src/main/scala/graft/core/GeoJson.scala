package graft.core

import graft.core.Geom._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** RFC 7946 GeoJSON geometry encode/decode
  * (reference encoding/geojson/geojson.go:52-446).
  *
  * Ring-closure convention: the internal model stores UNCLOSED rings
  * (reference polygon.go:16-20); polygons are CLOSED on encode
  * (closePolygon, geojson.go:316-327) and the closing point is stripped
  * on decode. Uses the Jackson shipped with Spark (no extra deps).
  */
object GeoJson {

  private val mapper = new ObjectMapper()

  // ---------- encode (StringBuilder — the hot path in span extraction) ----

  private def coords(b: StringBuilder, p: Pt): Unit = {
    b.append('[').append(p._1).append(',').append(p._2).append(']')
  }

  private def coordSeq(b: StringBuilder, pts: IndexedSeq[Pt]): Unit = {
    b.append('[')
    var i = 0
    while (i < pts.length) {
      if (i > 0) b.append(',')
      coords(b, pts(i))
      i += 1
    }
    b.append(']')
  }

  private def closedRing(b: StringBuilder, ring: IndexedSeq[Pt]): Unit = {
    b.append('[')
    var i = 0
    while (i < ring.length) {
      if (i > 0) b.append(',')
      coords(b, ring(i))
      i += 1
    }
    if (ring.nonEmpty && ring.head != ring.last) { b.append(','); coords(b, ring.head) }
    b.append(']')
  }

  private def ringSeq(b: StringBuilder, rings: IndexedSeq[IndexedSeq[Pt]]): Unit = {
    b.append('[')
    var i = 0
    while (i < rings.length) {
      if (i > 0) b.append(',')
      closedRing(b, rings(i))
      i += 1
    }
    b.append(']')
  }

  private def encodeInto(b: StringBuilder, g: Geometry): Unit = g match {
    case GPoint(p) =>
      b.append("""{"type":"Point","coordinates":""")
      coords(b, p); b.append('}')
    case GMultiPoint(ps) =>
      b.append("""{"type":"MultiPoint","coordinates":""")
      coordSeq(b, ps); b.append('}')
    case GLineString(ps) =>
      b.append("""{"type":"LineString","coordinates":""")
      coordSeq(b, ps); b.append('}')
    case GMultiLineString(ls) =>
      b.append("""{"type":"MultiLineString","coordinates":[""")
      for (i <- ls.indices) { if (i > 0) b.append(','); coordSeq(b, ls(i)) }
      b.append("]}")
    case GPolygon(rs) =>
      b.append("""{"type":"Polygon","coordinates":""")
      ringSeq(b, rs); b.append('}')
    case GMultiPolygon(mp) =>
      b.append("""{"type":"MultiPolygon","coordinates":[""")
      for (i <- mp.indices) { if (i > 0) b.append(','); ringSeq(b, mp(i)) }
      b.append("]}")
    case GCollection(gs) =>
      b.append("""{"type":"GeometryCollection","geometries":[""")
      for (i <- gs.indices) { if (i > 0) b.append(','); encodeInto(b, gs(i)) }
      b.append("]}")
  }

  def encode(g: Geometry): String = {
    val b = new StringBuilder(64)
    encodeInto(b, g)
    b.toString
  }

  // ---------- decode ----------

  final class GeoJsonException(msg: String) extends RuntimeException(msg)

  private def pt(n: JsonNode): Pt = {
    if (!n.isArray || n.size < 2) throw new GeoJsonException(s"bad coordinate $n")
    (n.get(0).asDouble, n.get(1).asDouble)
  }

  private def ptSeq(n: JsonNode): IndexedSeq[Pt] =
    (0 until n.size).map(i => pt(n.get(i)))

  /** closing point stripped when present. */
  private def ring(n: JsonNode): IndexedSeq[Pt] = {
    val pts = ptSeq(n)
    if (pts.length >= 2 && pts.head == pts.last) pts.dropRight(1) else pts
  }

  def decodeNode(n: JsonNode): Geometry = {
    val tpe = Option(n.get("type")).map(_.asText).getOrElse(
      throw new GeoJsonException("missing type"))
    def c: JsonNode = Option(n.get("coordinates")).getOrElse(
      throw new GeoJsonException("missing coordinates"))
    tpe match {
      case "Point"           => GPoint(pt(c))
      case "MultiPoint"      => GMultiPoint(ptSeq(c))
      case "LineString"      => GLineString(ptSeq(c))
      case "MultiLineString" => GMultiLineString((0 until c.size).map(i => ptSeq(c.get(i))))
      case "Polygon"         => GPolygon((0 until c.size).map(i => ring(c.get(i))))
      case "MultiPolygon" =>
        GMultiPolygon((0 until c.size).map { i =>
          val poly = c.get(i)
          (0 until poly.size).map(j => ring(poly.get(j)))
        })
      case "GeometryCollection" =>
        val gs = Option(n.get("geometries")).getOrElse(
          throw new GeoJsonException("missing geometries"))
        GCollection((0 until gs.size).map(i => decodeNode(gs.get(i))))
      case other => throw new GeoJsonException(s"unknown type $other")
    }
  }

  def decode(s: String): Geometry = decodeNode(mapper.readTree(s))
}
