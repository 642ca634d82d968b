package graft.core

import graft.core.Geom._

/** Tolerance-based float + geometry comparison.
  *
  * Reimplements the reference's `cmp` package semantics
  * (/root/reference/cmp/compare.go, cmp.go, default_compare.go):
  * ULP/bit-pattern comparison away from zero, absolute epsilon near zero,
  * and *normalizing* geometry equality (multipoints sorted, rings rotated
  * to their left-most point, polygon rings sorted by size-then-min-point).
  */
final case class Cmp(tolerance: Double, bitTolerance: Long) {

  /** reference cmp/compare.go:39-60 */
  def float(f1: Double, f2: Double): Boolean = {
    if (f1.isInfinite || f2.isInfinite)
      return (f1.isNegInfinity == f2.isNegInfinity) && (f1.isPosInfinity == f2.isPosInfinity)
    if (f1 == 0 || f2 == 0) return math.abs(f2 - f1) < tolerance
    val i1 = java.lang.Double.doubleToLongBits(f1)
    val i2 = java.lang.Double.doubleToLongBits(f2)
    val d = i2 - i1
    if (d < 0) d > -bitTolerance else d < bitTolerance
  }

  def pointEqual(p1: Pt, p2: Pt): Boolean = float(p1._1, p2._1) && float(p1._2, p2._2)

  def extentEqual(e1: Extent, e2: Extent): Boolean =
    float(e1.minx, e2.minx) && float(e1.miny, e2.miny) &&
      float(e1.maxx, e2.maxx) && float(e1.maxy, e2.maxy)

  /** reference cmp/compare.go:114-132 — order-free multipoint equality */
  def multiPointEqual(a: IndexedSeq[Pt], b: IndexedSeq[Pt]): Boolean = {
    if (a.length != b.length) return false
    val sa = a.sorted(Cmp.byXY)
    val sb = b.sorted(Cmp.byXY)
    sa.indices.forall(i => pointEqual(sa(i), sb(i)))
  }

  /** reference cmp/compare.go:136-152 — rotation-normalized ring equality */
  def lineStringEqual(a: IndexedSeq[Pt], b: IndexedSeq[Pt]): Boolean = {
    if (a.length != b.length) return false
    val ra = Cmp.rotateToLeftMostPoint(a)
    val rb = Cmp.rotateToLeftMostPoint(b)
    ra.indices.forall(i => pointEqual(ra(i), rb(i)))
  }

  /** reference cmp/compare.go — order-free multiline equality */
  def multiLineEqual(a: IndexedSeq[IndexedSeq[Pt]], b: IndexedSeq[IndexedSeq[Pt]]): Boolean = {
    if (a.length != b.length) return false
    a.forall(la => b.exists(lb => lineStringEqual(la, lb)))
  }

  /** reference cmp/compare.go:172-198 + by_xy.go:23-42 */
  def polygonEqual(a: IndexedSeq[IndexedSeq[Pt]], b: IndexedSeq[IndexedSeq[Pt]]): Boolean = {
    if (a.length != b.length) return false
    (Extent.ofPoints(a.flatten), Extent.ofPoints(b.flatten)) match {
      case (Some(ea), Some(eb)) if !extentEqual(ea, eb) => return false
      case (None, Some(_)) | (Some(_), None)            => return false
      case _                                            =>
    }
    // the MAIN ring is pinned at index 0 — only holes sort
    // (by_xy.go:25-31: Less(i,0)=false, Less(0,j)=true). The reference's
    // "first ring not same" test vector depends on this: two polygons with
    // swapped main/hole rings are NOT equal.
    if (a.isEmpty) return true
    val sa = a.head +: a.tail.sortWith(Cmp.subRingLess)
    val sb = b.head +: b.tail.sortWith(Cmp.subRingLess)
    sa.indices.forall(i => lineStringEqual(sa(i), sb(i)))
  }

  /** reference cmp/compare.go:258-275 */
  def multiPolygonEqual(a: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]],
                        b: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]): Boolean = {
    if (a.length != b.length) return false
    val sa = a.sortWith(Cmp.polyMainLess)
    val sb = b.sortWith(Cmp.polyMainLess)
    sa.indices.forall(i => polygonEqual(sa(i), sb(i)))
  }

  def geometryEqual(g1: Geometry, g2: Geometry): Boolean = (g1, g2) match {
    case (GPoint(a), GPoint(b)) =>
      (isEmptyPt(a) && isEmptyPt(b)) || pointEqual(a, b)
    case (GMultiPoint(a), GMultiPoint(b))           => multiPointEqual(a, b)
    case (GLineString(a), GLineString(b))           => lineStringEqual(a, b)
    case (GMultiLineString(a), GMultiLineString(b)) => multiLineEqual(a, b)
    case (GPolygon(a), GPolygon(b))                 => polygonEqual(a, b)
    case (GMultiPolygon(a), GMultiPolygon(b))       => multiPolygonEqual(a, b)
    case (GCollection(a), GCollection(b)) =>
      a.length == b.length && a.indices.forall(i => geometryEqual(a(i), b(i)))
    case _ => false
  }
}

object Cmp {

  /** reference cmp/cmp.go:20-22 — BitToleranceFor */
  def bitToleranceFor(tolerance: Double): Long =
    java.lang.Double.doubleToLongBits(1.0 + tolerance) -
      java.lang.Double.doubleToLongBits(1.0)

  def forTolerance(tolerance: Double): Cmp = Cmp(tolerance, bitToleranceFor(tolerance))

  /** reference cmp/cmp.go NewForNumPrecision */
  def forNumPrecision(prec: Int): Cmp = forTolerance(1.0 / math.pow(10, prec))

  /** reference cmp/default_compare.go:16-31 — 6-digit default */
  val Default: Cmp = forNumPrecision(6)

  /** reference cmp/default_compare.go:10-13 */
  val HiCmp: Cmp = forTolerance(1e-9)

  /** reference cmp/compare.go:105-111 — x-then-y strict ordering */
  def pointLess(p1: Pt, p2: Pt): Boolean =
    if (p1._1 != p2._1) p1._1 < p2._1 else p1._2 < p2._2

  val byXY: Ordering[Pt] = (a: Pt, b: Pt) =>
    if (pointLess(a, b)) -1 else if (pointLess(b, a)) 1 else 0

  /** reference cmp/helper.go — rotate ring so the XY-least point is first */
  def rotateToLeftMostPoint(pts: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    if (pts.length <= 1) return pts
    var li = 0
    var i = 1
    while (i < pts.length) {
      if (pointLess(pts(i), pts(li))) li = i
      i += 1
    }
    if (li == 0) pts else pts.drop(li) ++ pts.take(li)
  }

  /** reference cmp/by_xy.go:23-42 — sub-rings by length then min-point */
  def subRingLess(a: IndexedSeq[Pt], b: IndexedSeq[Pt]): Boolean = {
    if (a.length != b.length) return a.length < b.length
    val ra = rotateToLeftMostPoint(a)
    val rb = rotateToLeftMostPoint(b)
    if (ra.isEmpty) return false
    pointLess(ra.head, rb.head)
  }

  /** reference cmp/by_xy.go byPolygonMainSizeXY — by main-ring */
  def polyMainLess(a: IndexedSeq[IndexedSeq[Pt]], b: IndexedSeq[IndexedSeq[Pt]]): Boolean = {
    if (a.isEmpty || b.isEmpty) return a.length < b.length
    subRingLess(a.head, b.head)
  }
}
