package graft.core

import graft.core.Geom._
import scala.collection.mutable

/** makevalid — constrained-Delaunay polygon repair
  * (reference planar/makevalid/makevalid.go:87-235 + triangulate.go).
  *
  * Pipeline for (Multi)Polygons:
  *  1. Destructure — polygon→segments; if the clipbox doesn't contain the
  *     geometry bbox its 4 edges are prepended; all pairwise intersections
  *     found with the event-queue sweep; segments split at intersection
  *     points (XY-sorted); sub-segments outside the clipbox dropped;
  *     sorted + deduped.
  *  2. Triangulate — plain Delaunay over the deduped vertices (the
  *     reference's default build: constraint insertion is env-gated OFF,
  *     constrained.go:24-31), vertices rounded to 1e-3.
  *  3. Label — keep triangles whose centroid the hitmap of the ORIGINAL
  *     polygons labels Inside.
  *  4. Walk — merge triangles into rings/polygons, cut slivers, remove
  *     bridges, rectify winding.
  *
  * Points/lines are delegated to the clipper (makevalid.go:195-205).
  * Comparator: HiCMP (makevalid/cmp.go) except the sweep's endpoint
  * matching (default 1e-6, xsweep.go NewEventQueue).
  */
object MakeValid {

  private val cmp = Cmp.HiCmp

  /** The reference's experimental constrained-insertion mode
    * (constrained.go:24-31: TEGOLA_MAKEVALID=CONSTRAINED, default OFF).
    * Mirrored as GRAFT_MAKEVALID=CONSTRAINED; `enableConstraints` is a var
    * so tests can toggle without the environment.
    */
  var enableConstraints: Boolean =
    sys.env.get("GRAFT_MAKEVALID").exists(_.toUpperCase.contains("CONSTRAINED"))

  /** reference makevalid.go:87-150 Destructure. */
  def destructure(clipbox: Option[Extent],
                  polys: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]): IndexedSeq[Seg] = {
    val polySegs = polys.flatMap(_.flatMap(ringSegments))
    if (polySegs.isEmpty) return Vector.empty
    val gext = Extent.ofPoints(polys.flatten.flatten).get

    val hasClipbox = clipbox.exists(cb => !cb.contains(gext))
    val segments: IndexedSeq[Seg] =
      if (hasClipbox) clipbox.get.edges ++ polySegs else polySegs

    val ipts = mutable.HashMap[Int, mutable.ArrayBuffer[Pt]]()
    Sweep.findIntersects(segments, connected = true) { (src, dest, pt) =>
      ipts.getOrElseUpdate(src, mutable.ArrayBuffer.empty) += pt
      ipts.getOrElseUpdate(dest, mutable.ArrayBuffer.empty) += pt
      true
    }

    val nsegs = mutable.ArrayBuffer[Seg]()
    var i = 0
    while (i < segments.length) {
      val s = segments(i)
      val pts = (mutable.ArrayBuffer[Pt](s.p1, s.p2) ++=
        ipts.getOrElse(i, mutable.ArrayBuffer.empty))
        .sortWith(Cmp.pointLess)
      var j = 1
      while (j < pts.length) {
        if (!cmp.pointEqual(pts(j - 1), pts(j))) {
          val nl = Seg(pts(j - 1), pts(j))
          if (!hasClipbox || clipbox.get.containsSeg(nl)) nsegs += nl
        }
        j += 1
      }
      i += 1
    }

    // sort + dedupe (reference `unique`, cleanly — the point set downstream
    // is deduped again anyway)
    val sorted = nsegs.sortWith { (a, b) =>
      Cmp.pointLess(a.p1, b.p1) || (cmp.pointEqual(a.p1, b.p1) && Cmp.pointLess(a.p2, b.p2))
    }
    val out = Vector.newBuilder[Seg]
    var k = 0
    while (k < sorted.length) {
      if (k == 0 || !(cmp.pointEqual(sorted(k).p1, sorted(k - 1).p1) &&
          cmp.pointEqual(sorted(k).p2, sorted(k - 1).p2)))
        out += sorted(k)
      k += 1
    }
    out.result()
  }

  /** reference constrained.go:33-113 Triangles: dedupe points exactly,
    * drop zero-length constraints, plain Delaunay; when the constrained
    * mode is on (constrained.go:84-96), force each constraint edge into
    * the subdivision, logging-and-skipping individual failures exactly as
    * the reference does.
    */
  def delaunayTriangles(segs: IndexedSeq[Seg]): IndexedSeq[(Pt, Pt, Pt)] = {
    val seen = mutable.HashSet[Pt]()
    val pts = mutable.ArrayBuffer[Pt]()
    val constraints = mutable.ArrayBuffer[Seg]()
    segs.foreach { s =>
      val lnt = math.sqrt(s.lengthSquared)
      if (!Cmp.Default.float(lnt, 0.0)) {
        if (!seen.contains(s.p1)) { seen += s.p1; pts += s.p1 }
        if (!seen.contains(s.p2)) { seen += s.p2; pts += s.p2 }
        constraints += s
      }
    }
    if (pts.isEmpty) return Vector.empty
    Subdivision.forPoints(pts.toIndexedSeq) match {
      case Some(sd) =>
        if (enableConstraints) {
          val vx = SubdivisionConstrained.vertexIndex(sd)
          constraints.foreach { ct =>
            // failures are skipped, not fatal (constrained.go:91-94)
            SubdivisionConstrained.insertConstraint(sd, vx, ct.p1, ct.p2)
          }
        }
        sd.triangles(includeFrame = false)
      case None => Vector.empty
    }
  }

  /** reference triangulate.go:15-52 InsideTrianglesForSegments. */
  def insideTriangles(segs: IndexedSeq[Seg], hm: PolygonHitmap): IndexedSeq[(Pt, Pt, Pt)] =
    delaunayTriangles(segs).filter { t =>
      hm.labelInside(Planar.triangleCenter(t._1, t._2, t._3))
    }

  /** reference makevalid.go:167-235 — full repair of a multipolygon.
    * Returns None when nothing remains inside the clipbox.
    */
  def makeValid(polys: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]],
                clipbox: Option[Extent]): Option[IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]] = {
    val hm = PolygonHitmap(polys)
    val segs = destructure(clipbox, polys)
    if (segs.isEmpty) return None
    val tris = insideTriangles(segs, hm)
    if (tris.isEmpty) return None
    val mp = Walker.multiPolygon(tris)
    if (mp.isEmpty) None else Some(mp)
  }

  /** geometry-level dispatch (reference makevalid.go:190-235): polygons
    * repaired, points/lines clipped, everything else passed through.
    */
  def geometry(g: Geometry, clipbox: Option[Extent]): Option[Geometry] = g match {
    case GPolygon(rs) =>
      makeValid(Vector(rs), clipbox).map(GMultiPolygon.apply)
    case GMultiPolygon(mp) =>
      makeValid(mp, clipbox).map(GMultiPolygon.apply)
    case other => Clip.geometry(other, clipbox)
  }
}
