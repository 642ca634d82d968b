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

  // ---------- encode ----------

  private def coords(node: ArrayNode, p: Pt): Unit = {
    val a = node.addArray()
    a.add(p._1); a.add(p._2)
  }

  private def coordSeq(node: ArrayNode, pts: IndexedSeq[Pt]): Unit =
    pts.foreach(coords(node, _))

  private def closedRing(node: ArrayNode, ring: IndexedSeq[Pt]): Unit = {
    coordSeq(node, ring)
    if (ring.nonEmpty && ring.head != ring.last) coords(node, ring.head)
  }

  def encodeNode(g: Geometry): ObjectNode = {
    val o = mapper.createObjectNode()
    g match {
      case GPoint(p) =>
        o.put("type", "Point")
        val c = o.putArray("coordinates"); c.add(p._1); c.add(p._2)
      case GMultiPoint(ps) =>
        o.put("type", "MultiPoint")
        coordSeq(o.putArray("coordinates"), ps)
      case GLineString(ps) =>
        o.put("type", "LineString")
        coordSeq(o.putArray("coordinates"), ps)
      case GMultiLineString(ls) =>
        o.put("type", "MultiLineString")
        val c = o.putArray("coordinates")
        ls.foreach(l => coordSeq(c.addArray(), l))
      case GPolygon(rs) =>
        o.put("type", "Polygon")
        val c = o.putArray("coordinates")
        rs.foreach(r => closedRing(c.addArray(), r))
      case GMultiPolygon(mp) =>
        o.put("type", "MultiPolygon")
        val c = o.putArray("coordinates")
        mp.foreach { poly =>
          val pn = c.addArray()
          poly.foreach(r => closedRing(pn.addArray(), r))
        }
      case GCollection(gs) =>
        o.put("type", "GeometryCollection")
        val arr = o.putArray("geometries")
        gs.foreach(gg => arr.add(encodeNode(gg)))
    }
    o
  }

  def encode(g: Geometry): String = mapper.writeValueAsString(encodeNode(g))

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
