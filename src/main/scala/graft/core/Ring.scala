package graft.core

import graft.core.Geom._

/** Ray-cast point-in-ring kernel + polygon hitmap labeling.
  *
  * Semantics from /root/reference/planar/intersect/ring.go:21-154 and
  * /root/reference/planar/makevalid/hitmap/{ring,polygon_hitmap,hitmap}.go:
  *   - ray from (bbox.minx − 1, pt.y) to pt, counting segment crossings
  *   - colinear segments: the point on the segment ⇒ border
  *   - intersection exactly at the query point ⇒ border
  *   - endpoint crossings counted only when the OTHER vertex of the segment
  *     is not above the ray (ring.go:131-145)
  *   - hitmap: exterior rings are labeled Inside (border-inclusive), holes
  *     Outside (border-exclusive); first containing ring wins after sorting
  *     rings Outside-first then by ascending bbox area; query points are
  *     pre-rounded to a 20-bit mantissa; outside the clip bbox ⇒ Outside.
  */
final class Ring(val segs: IndexedSeq[Seg], val includeBorder: Boolean, val cmp: Cmp) {

  val bbox: Extent = {
    var e = Extent(segs.head.x1, segs.head.y1, segs.head.x1, segs.head.y1)
    segs.foreach { s =>
      e = e.addPoint(s.x1, s.y1).addPoint(s.x2, s.y2)
    }
    e
  }

  /** reference planar/intersect/ring.go:73-154 */
  def containsPoint(pt: Pt): Boolean = {
    if (!bbox.containsPoint(pt)) return false
    val ray = Seg(bbox.minx - 1, pt._2, pt._1, pt._2)
    var count = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (Planar.areLinesColinear(ray, seg)) {
        if (seg.bboxContains(pt)) return includeBorder
        // colinear but not containing: skip
      } else {
        val (ipt, ok) = Planar.segmentIntersect(ray, seg)
        if (ok) {
          if (cmp.pointEqual(ipt, pt)) return includeBorder
          var skip = false
          if (cmp.pointEqual(seg.p1, ipt)) {
            if (seg.y2 > pt._2) skip = true
          } else if (cmp.pointEqual(seg.p2, ipt)) {
            if (seg.y1 > pt._2) skip = true
          }
          if (!skip) count += 1
        }
      }
      i += 1
    }
    count % 2 != 0
  }
}

object Ring {

  /** reference planar/intersect/ring.go:49-60 NewRingFromPoints — segments
    * with the closing edge {pts(last), pts(0)} first.
    */
  def fromPoints(pts: IndexedSeq[Pt], includeBorder: Boolean = false,
                 cmp: Cmp = Cmp.Default): Ring =
    new Ring(ringSegments(pts), includeBorder, cmp)

  /** Round a double to a 20-bit mantissa, to-nearest-even — emulates the
    * reference's big.NewFloat(x).SetPrec(20).Float64()
    * (hitmap/polygon_hitmap.go:93-95).
    */
  def roundPrec20(v: Double): Double = {
    if (v == 0.0 || v.isNaN || v.isInfinite) return v
    val e = java.lang.Math.getExponent(v)
    val scaled = java.lang.Math.scalb(v, 19 - e)
    java.lang.Math.scalb(java.lang.Math.rint(scaled), e - 19)
  }
}

/** planar.HitMapper (reference planar/planar.go + hitmap/hitmap.go):
  * Inside/Outside labeling with an extent + area used for ordering
  * heterogeneous hitmap collections.
  */
sealed trait Hitmap {
  def labelInside(pt: Pt): Boolean
  def extent: Extent
  def area: Double
}

/** Polygon hitmap: labels points Inside/Outside a (multi)polygon.
  * reference planar/makevalid/hitmap/polygon_hitmap.go:33-127.
  */
final class PolygonHitmap private (rings: IndexedSeq[(Ring, Boolean)], clipBox: Extent)
    extends Hitmap {

  /** reference polygon_hitmap.go:130-133 — extent/area of the clip box
    * (which carries the origin-unioned quirk).
    */
  def extent: Extent = clipBox
  def area: Double = clipBox.area

  /** True = Inside. reference LabelFor (polygon_hitmap.go:90-127). */
  def labelInside(pt0: Pt): Boolean = {
    val pt = (Ring.roundPrec20(pt0._1), Ring.roundPrec20(pt0._2))
    if (!clipBox.containsPoint(pt)) return false
    var i = 0
    while (i < rings.length) {
      if (rings(i)._1.containsPoint(pt)) return rings(i)._2
      i += 1
    }
    false
  }
}

object PolygonHitmap {

  /** Build from (multi)polygon rings. Ring 0 of each polygon is Inside
    * (border-inclusive); subsequent rings are holes, Outside
    * (border-exclusive). Rings sorted Outside-first, then ascending bbox
    * area (reference bySmallestBBArea, hitmap/ring.go:73-84).
    * The clip bbox replicates the reference quirk of unioning ring extents
    * into a zero-initialized extent (so it always includes the origin).
    */
  def apply(polys: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]): PolygonHitmap = {
    val rings = Vector.newBuilder[(Ring, Boolean)]
    polys.foreach { ply =>
      if (ply.nonEmpty && ply.head.nonEmpty) {
        rings += ((Ring.fromPoints(ply.head, includeBorder = true), true))
        ply.drop(1).foreach { hole =>
          if (hole.nonEmpty)
            rings += ((Ring.fromPoints(hole, includeBorder = false), false))
        }
      }
    }
    val rs = rings.result()
    var clip = Extent(0, 0, 0, 0) // reference: new(geom.Extent) zero value
    rs.foreach { case (r, _) => clip = clip.add(r.bbox) }
    val sorted = rs.sortWith { case ((ra, la), (rb, lb)) =>
      if (la != lb) !la // Outside (false) rings first
      else ra.bbox.area < rb.bbox.area
    }
    new PolygonHitmap(sorted, clip)
  }

  def ofPolygon(rings: IndexedSeq[IndexedSeq[Pt]]): PolygonHitmap = apply(Vector(rings))
}

/** reference hitmap/hitmap.go:22-29 Always — fixed label everywhere. */
final case class AlwaysHitmap(inside: Boolean) extends Hitmap {
  def labelInside(pt: Pt): Boolean = inside
  def extent: Extent = Extent(Double.NegativeInfinity, Double.NegativeInfinity,
    Double.PositiveInfinity, Double.PositiveInfinity)
  def area: Double = Double.PositiveInfinity
}

/** reference hitmap/hitmap.go:42-77 OrderedHM — first Inside wins; extent
  * accumulates across members; area is the area of the combined extent.
  */
final case class OrderedHitmap(hms: IndexedSeq[Hitmap]) extends Hitmap {
  def labelInside(pt: Pt): Boolean = hms.exists(_.labelInside(pt))
  def extent: Extent = {
    // reference: accumulate into a zero-value extent (origin-unioned quirk)
    var e = Extent(0, 0, 0, 0)
    hms.foreach(h => e = e.add(h.extent))
    e
  }
  def area: Double = extent.area
}

object Hitmap {

  /** reference hitmap/hitmap.go:89-136 New — heterogeneous dispatch:
    * (multi)polygons get a PolygonHitmap; collections recurse, skip the
    * nil members, sort ascending by area (ByAreaDec's Less is `<` despite
    * the name) then reverse into the OrderedHM so the LARGEST area is
    * tried first; points/lines yield no hitmap.
    */
  def forGeometry(geo: Geometry): Option[Hitmap] = geo match {
    case GPolygon(rings)   => Some(PolygonHitmap.ofPolygon(rings))
    case GMultiPolygon(mp) => Some(PolygonHitmap(mp))
    case GCollection(gs) =>
      val hms = gs.flatMap(forGeometry)
      Some(OrderedHitmap(hms.sortBy(_.area).reverse))
    case GPoint(_) | GMultiPoint(_) | GLineString(_) | GMultiLineString(_) =>
      None
  }
}
