package graft.core

import graft.core.Geom._
import scala.collection.mutable.ArrayBuffer

/** Douglas-Peucker simplification.
  *
  * Semantics from /root/reference/planar/simplify/douglaspeucker.go:10-111
  * and /root/reference/planar/simplify.go:9-88:
  *   - tolerance ≤ 0 or ≤2 points ⇒ identity
  *   - endpoints kept; the recursion joins halves dropping the shared
  *     midpoint (ret[:firstLen-1])
  *   - when dmax > tolerance but the linestring has exactly 3 points the
  *     whole linestring is kept
  *   - geometry dispatch simplifies polygon rings with isClosed=true and
  *     DROPS rings that simplify to ≤2 points (keeps them for open lines)
  */
object Simplify {

  def douglasPeucker(linestring: IndexedSeq[Pt], tolerance: Double): IndexedSeq[Pt] = {
    val ret = new ArrayBuffer[Pt](linestring.length)
    simplifyInto(linestring, tolerance, ret)
    ret.toIndexedSeq
  }

  private def simplifyInto(ls: IndexedSeq[Pt], tolerance: Double, ret: ArrayBuffer[Pt]): Unit = {
    if (tolerance <= 0 || ls.length <= 2) {
      ret ++= ls
      return
    }
    var dmax = 0.0
    var idx = 0
    val line = Seg(ls.head, ls.last)
    var i = 1
    while (i <= ls.length - 2) {
      val d = Planar.perpendicularDistance(line, ls(i)._1, ls(i)._2)
      if (d > dmax) { dmax = d; idx = i }
      i += 1
    }
    if (dmax > tolerance) {
      if (ls.length <= 3) {
        ret ++= ls
        return
      }
      simplifyInto(ls.slice(0, idx + 1), tolerance, ret)
      // drop the shared midpoint (reference douglaspeucker.go:91-103)
      ret.remove(ret.length - 1)
      simplifyInto(ls.slice(idx, ls.length), tolerance, ret)
    } else {
      ret += line.p1
      ret += line.p2
    }
  }

  /** reference planar/simplify.go:9-27 simplifyPolygon — note: a ring that
    * simplifies to ≤2 points becomes an EMPTY ring slot in the reference
    * (ret[i] left nil); we keep that as an empty ring for parity of
    * ring-count behavior downstream callers rely on.
    */
  def simplifyRings(rings: IndexedSeq[IndexedSeq[Pt]], tolerance: Double,
                    isClosed: Boolean): IndexedSeq[IndexedSeq[Pt]] =
    rings.map { r =>
      val ls = douglasPeucker(r, tolerance)
      if (ls.length > 2 || !isClosed) ls else Vector.empty
    }

  /** reference planar/simplify.go:24-88 Simplify dispatch. */
  def geometry(g: Geometry, tolerance: Double): Geometry = g match {
    case GCollection(gs)      => GCollection(gs.map(geometry(_, tolerance)))
    case GMultiPolygon(ps)    => GMultiPolygon(ps.map(simplifyRings(_, tolerance, isClosed = true)))
    case GPolygon(rs)         => GPolygon(simplifyRings(rs, tolerance, isClosed = true))
    case GMultiLineString(ls) => GMultiLineString(simplifyRings(ls, tolerance, isClosed = false))
    case GLineString(ps)      => GLineString(douglasPeucker(ps, tolerance))
    case other                => other // points & multipoints unchanged
  }
}
