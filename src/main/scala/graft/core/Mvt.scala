package graft.core

import graft.core.Geom._
import scala.collection.mutable.ArrayBuffer

/** MVT tile-geometry preparation + command-stream encoding.
  *
  * Semantics from /root/reference/encoding/mvt/{prepare,feature}.go:
  *   - PrepareGeo projects into tile pixel space:
  *       px = int64((x − minx)/xspan · ext), py = int64((maxy − y)/yspan · ext)
  *     (y-flip, truncation toward zero, prepare.go:73-78); consecutive
  *     points that collapse under the 1e-9 comparator are deduped; rings
  *     lose their closing point; degenerate lines/rings dropped; polygons
  *     rectified with the y-UP order (prepare.go:130-134).
  *   - geometry encode: MoveTo/LineTo/ClosePath commands, zigzag
  *     `(i<<1)^(i>>31)` (feature.go:119 — 31, not 63, replicated), cursor
  *     deltas in int64; ring winding enforced AFTER int64 truncation with
  *     the Y-DOWN order: exterior ring Clockwise, holes CounterClockwise;
  *     colinear rings dropped (feature.go:172-216).
  */
object Mvt {

  val TileExtent = 4096.0

  // ---- prepare ----

  def preparePt(p: Pt, tile: Extent, pixelExtent: Double): Pt = {
    val px = ((p._1 - tile.minx) / tile.xSpan * pixelExtent).toLong
    val py = ((tile.maxy - p._2) / tile.ySpan * pixelExtent).toLong
    (px.toDouble, py.toDouble)
  }

  def prepareLineString(pts: IndexedSeq[Pt], tile: Extent,
                        pixelExtent: Double): IndexedSeq[Pt] = {
    if (pts.length < 2) return Vector.empty
    val out = new ArrayBuffer[Pt](pts.length)
    var i = 0
    while (i < pts.length) {
      val npt = preparePt(pts(i), tile, pixelExtent)
      if (i == 0 || !Cmp.HiCmp.pointEqual(out.last, npt)) out += npt
      i += 1
    }
    if (out.length < 2) Vector.empty else out.toIndexedSeq
  }

  def preparePolygon(rings: IndexedSeq[IndexedSeq[Pt]], tile: Extent,
                     pixelExtent: Double): IndexedSeq[IndexedSeq[Pt]] = {
    val p = rings.flatMap { ring =>
      if (ring.length < 2) None
      else {
        var ln = prepareLineString(ring, tile, pixelExtent)
        if (ln.length >= 2 && Cmp.HiCmp.pointEqual(ln.head, ln.last))
          ln = ln.dropRight(1)
        if (ln.length < 2) None else Some(ln)
      }
    }
    Winding.rectifyPolygon(yPositiveDown = false, p).getOrElse(Vector.empty)
  }

  /** reference prepare.go:13-70 PrepareGeo dispatch. */
  def prepareGeo(g: Geometry, tile: Extent, pixelExtent: Double = TileExtent): Geometry =
    g match {
      case GPoint(p)       => GPoint(preparePt(p, tile, pixelExtent))
      case GMultiPoint(ps) => GMultiPoint(ps.map(preparePt(_, tile, pixelExtent)))
      case GLineString(ps) => GLineString(prepareLineString(ps, tile, pixelExtent))
      case GMultiLineString(ls) =>
        GMultiLineString(ls.map(prepareLineString(_, tile, pixelExtent)).filter(_.nonEmpty))
      case GPolygon(rs) => GPolygon(preparePolygon(rs, tile, pixelExtent))
      case GMultiPolygon(mp) =>
        GMultiPolygon(mp.map(preparePolygon(_, tile, pixelExtent)).filter(_.nonEmpty))
      case GCollection(gs) => GCollection(gs.map(prepareGeo(_, tile, pixelExtent)))
    }

  // ---- command-stream encode ----

  final val CmdMoveTo = 1
  final val CmdLineTo = 2
  final val CmdClosePath = 7

  @inline def command(cmd: Int, count: Int): Long =
    ((cmd & 0x7) | (count << 3)).toLong & 0xFFFFFFFFL

  /** reference feature.go:119 — note the 31-bit arithmetic shift. */
  @inline def zigzag(i: Long): Long = ((i << 1) ^ (i >> 31)) & 0xFFFFFFFFL

  private final class Cursor {
    var x = 0L
    var y = 0L
    def delta(px: Long, py: Long): (Long, Long) = {
      val d = (px - x, py - y)
      x = px; y = py
      d
    }
  }

  /** geometry → (commands, geomType) where type 1=POINT 2=LINESTRING
    * 3=POLYGON (vector_tile.proto enum).
    */
  def encodeGeometry(g: Geometry): (IndexedSeq[Long], Int) = {
    val cur = new Cursor
    val out = new ArrayBuffer[Long]()

    def moveTo(pts: IndexedSeq[Pt]): Unit = {
      if (pts.isEmpty) return
      out += command(CmdMoveTo, pts.length)
      pts.foreach { p =>
        val (dx, dy) = cur.delta(p._1.toLong, p._2.toLong)
        out += zigzag(dx); out += zigzag(dy)
      }
    }
    def lineTo(pts: IndexedSeq[Pt]): Unit = {
      if (pts.isEmpty) return
      out += command(CmdLineTo, pts.length)
      pts.foreach { p =>
        val (dx, dy) = cur.delta(p._1.toLong, p._2.toLong)
        out += zigzag(dx); out += zigzag(dy)
      }
    }

    /** reference feature.go:172-216 encodeLinearRing. */
    def ring(wo: Int, pts0: IndexedSeq[Pt]): Unit = {
      var ipts = pts0.map(p => (p._1.toLong, p._2.toLong))
      val ringWinding = Winding.ofLongPoints(yPositiveDown = true, ipts)
      if (ringWinding == Winding.Colinear) return
      if (ringWinding != wo) ipts = ipts.reverse
      val deltas = ipts.map { case (px, py) => cur.delta(px, py) }
      out += command(CmdMoveTo, 1)
      out += zigzag(deltas.head._1); out += zigzag(deltas.head._2)
      out += command(CmdLineTo, deltas.length - 1)
      deltas.drop(1).foreach { d => out += zigzag(d._1); out += zigzag(d._2) }
      out += command(CmdClosePath, 1)
    }

    def polygon(rings: IndexedSeq[IndexedSeq[Pt]]): Boolean = {
      var i = 0
      while (i < rings.length) {
        if (rings(i).length < 2) {
          if (i == 0) return false // reference bails out of the polygon
        } else {
          val wo = if (i == 0) Winding.Clockwise else Winding.CounterClockwise
          ring(wo, rings(i))
        }
        i += 1
      }
      true
    }

    val tpe = g match {
      case GPoint(p)            => moveTo(Vector(p)); 1
      case GMultiPoint(ps)      => moveTo(ps); 1
      case GLineString(ps)      => moveTo(ps.take(1)); lineTo(ps.drop(1)); 2
      case GMultiLineString(ls) =>
        ls.foreach { l => moveTo(l.take(1)); lineTo(l.drop(1)) }; 2
      case GPolygon(rs)      => polygon(rs); 3
      case GMultiPolygon(mp) => mp.foreach(polygon); 3
      case GCollection(_)    => return (Vector.empty, 0)
    }
    (out.toIndexedSeq, tpe)
  }
}
