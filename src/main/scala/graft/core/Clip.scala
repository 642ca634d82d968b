package graft.core

import graft.core.Geom._
import scala.collection.mutable.ArrayBuffer

/** Clipping of points / multipoints / linestrings to a box.
  *
  * Semantics from /root/reference/planar/clip/{clip,point,linestring}.go:
  * an in/out scan over vertices using SegmentIntersect against the 4 box
  * edges — NOT Cohen–Sutherland. Polygon clipping is intentionally
  * unsupported here (the reference routes polygons through makevalid,
  * clip/clip.go:40-42).
  *
  * A `None` clipbox is the universe (identity).
  */
object Clip {

  /** reference planar/clip/linestring.go:12-38 — collect up to 2 distinct
    * intersection points of `ln` with the box edges, in edge order
    * (bottom, right, top, left per Extent.Edges CW vertex order); stop
    * early on a duplicate.
    */
  def uniqueSegmentIntersectPoints(clipbox: Extent, ln: Seg): IndexedSeq[Pt] = {
    val pts = new ArrayBuffer[Pt](2)
    val edges = clipbox.edges
    var i = 0
    while (i < edges.length) {
      val (pt, ok) = Planar.segmentIntersect(edges(i), ln)
      if (ok) {
        var j = 0
        while (j < pts.length) {
          if (Cmp.Default.pointEqual(pts(j), pt)) return pts.toIndexedSeq
          j += 1
        }
        pts += pt
        if (pts.length >= 2) return pts.toIndexedSeq
      }
      i += 1
    }
    pts.toIndexedSeq
  }

  /** reference planar/clip/point.go:10-28 */
  def multiPoint(pts: IndexedSeq[Pt], clipbox: Option[Extent]): IndexedSeq[Pt] =
    clipbox match {
      case None     => pts
      case Some(cb) => pts.filter(p => cb.containsPoint(p))
    }

  /** reference planar/clip/linestring.go:45-170 — the 4-case scan.
    * Returns the clipped multilinestring. Empty input → empty output;
    * single-point input is invalid (reference returns an error; we drop it).
    */
  def lineString(ls: IndexedSeq[Pt], clipbox: Option[Extent]): IndexedSeq[IndexedSeq[Pt]] = {
    if (ls.isEmpty) return Vector.empty
    if (ls.length == 1) return Vector.empty // ErrInvalidLineString in the reference
    val cb = clipbox match {
      case None => return Vector(ls)
      case Some(c) => c
    }
    if (ls.forall(p => cb.containsPoint(p))) return Vector(ls)

    val mls = new ArrayBuffer[IndexedSeq[Pt]]()
    var cls = new ArrayBuffer[Pt]()

    var lptIsIn = cb.containsPoint(ls(0))
    if (lptIsIn) cls += ls(0)

    var i = 1
    while (i < ls.length) {
      val ln = Seg(ls(i - 1), ls(i))
      val cptIsIn = cb.containsPoint(ls(i))

      if (!lptIsIn && !cptIsIn) {
        // out → out, but the segment may still cross the box
        val ipts = uniqueSegmentIntersectPoints(cb, ln)
        if (ipts.length > 1) {
          val isLess = Cmp.pointLess(ls(i - 1), ls(i))
          val isCLess = Cmp.pointLess(ipts(0), ipts(1))
          val (f, s) = if (isLess != isCLess) (1, 0) else (0, 1)
          mls += Vector(ipts(f), ipts(s))
        }
      } else if (lptIsIn && cptIsIn) {
        cls += ls(i)
      } else if (!lptIsIn && cptIsIn) {
        // entering: add the entry intersect ordered toward the inside point
        val ipts = uniqueSegmentIntersectPoints(cb, ln)
        if (ipts.nonEmpty) {
          if (ipts.length == 1) cls += ipts(0)
          else {
            val isLess = Cmp.pointLess(ls(i - 1), ls(i))
            val isCLess = Cmp.pointLess(ipts(0), ipts(1))
            cls += (if (isLess == isCLess) ipts(0) else ipts(1))
          }
        }
        cls += ls(i)
      } else {
        // in → out: add exit intersects (skipping dups of the last kept
        // point), emit the running linestring
        val ipts = uniqueSegmentIntersectPoints(cb, ln)
        if (ipts.nonEmpty) {
          val lptidx = cls.length - 1
          var j = 0
          while (j < ipts.length) {
            if (!Cmp.Default.pointEqual(ipts(j), cls(lptidx))) cls += ipts(j)
            j += 1
          }
        }
        mls += cls.toIndexedSeq
        cls = new ArrayBuffer[Pt]()
      }
      lptIsIn = cptIsIn
      i += 1
    }

    if (cls.length > 1) mls += cls.toIndexedSeq
    mls.toIndexedSeq
  }

  /** reference planar/clip/linestring.go:172-190 */
  def multiLineString(mls: IndexedSeq[IndexedSeq[Pt]],
                      clipbox: Option[Extent]): IndexedSeq[IndexedSeq[Pt]] =
    clipbox match {
      case None    => mls
      case Some(_) => mls.flatMap(ls => lineString(ls, clipbox))
    }

  /** reference planar/clip/clip.go:18-43 — geometry dispatch.
    * Polygons are unsupported (reference ErrUnsupportedGeometry); callers
    * must route them through makevalid.
    */
  def geometry(g: Geometry, clipbox: Option[Extent]): Option[Geometry] =
    clipbox match {
      case None => Some(g)
      case Some(cb) =>
        g match {
          case GPoint(p) => if (cb.containsPoint(p)) Some(g) else None
          case GMultiPoint(ps) =>
            val kept = multiPoint(ps, clipbox)
            if (kept.isEmpty) None else Some(GMultiPoint(kept))
          case GLineString(ps) =>
            Some(GMultiLineString(lineString(ps, clipbox)))
          case GMultiLineString(ls) =>
            Some(GMultiLineString(multiLineString(ls, clipbox)))
          case other => Some(other) // unsupported: returned unchanged with error in ref
        }
    }
}
