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
    // same point stream as polys.flatten.flatten without materializing it
    val gext = Extent.ofPoints(polys.iterator.flatMap(_.iterator).flatMap(_.iterator)).get

    val hasClipbox = clipbox.exists(cb => !cb.contains(gext))
    val segments: IndexedSeq[Seg] =
      if (hasClipbox) clipbox.get.edges ++ polySegs else polySegs

    // split points per segment, indexed by position (no boxed-Int map);
    // most segments intersect nothing, so the bucket array stays sparse
    val ipts = new Array[mutable.ArrayBuffer[Pt]](segments.length)
    Sweep.findIntersects(segments, connected = true) { (src, dest, pt) =>
      if (ipts(src) == null) ipts(src) = mutable.ArrayBuffer.empty
      ipts(src) += pt
      if (ipts(dest) == null) ipts(dest) = mutable.ArrayBuffer.empty
      ipts(dest) += pt
      true
    }

    val nsegs = mutable.ArrayBuffer[Seg]()
    var i = 0
    while (i < segments.length) {
      val s = segments(i)
      if (ipts(i) == null) {
        // common case: endpoints only — a 2-element stable sort is one swap
        val a = if (Cmp.pointLess(s.p1, s.p2)) s.p1 else s.p2
        val b = if (Cmp.pointLess(s.p1, s.p2)) s.p2 else s.p1
        if (!cmp.pointEqual(a, b)) {
          val nl = Seg(a, b)
          if (!hasClipbox || clipbox.get.containsSeg(nl)) nsegs += nl
        }
      } else {
        val pts = (mutable.ArrayBuffer[Pt](s.p1, s.p2) ++= ipts(i))
          .sortWith(Cmp.pointLess)
        var j = 1
        while (j < pts.length) {
          if (!cmp.pointEqual(pts(j - 1), pts(j))) {
            val nl = Seg(pts(j - 1), pts(j))
            if (!hasClipbox || clipbox.get.containsSeg(nl)) nsegs += nl
          }
          j += 1
        }
      }
      i += 1
    }

    // sort + dedupe (reference `unique`, cleanly — the point set downstream
    // is deduped again anyway). Comparator decisions identical to the
    // former pointLess/pointEqual-on-tuples form, scalarized.
    val sorted = nsegs.sortWith { (a, b) =>
      (if (a.x1 != b.x1) a.x1 < b.x1 else a.y1 < b.y1) ||
        (cmp.float(a.x1, b.x1) && cmp.float(a.y1, b.y1) &&
          (if (a.x2 != b.x2) a.x2 < b.x2 else a.y2 < b.y2))
    }
    val out = Vector.newBuilder[Seg]
    var k = 0
    while (k < sorted.length) {
      if (k == 0 || {
        val s = sorted(k); val p = sorted(k - 1)
        !(cmp.float(s.x1, p.x1) && cmp.float(s.y1, p.y1) &&
          cmp.float(s.x2, p.x2) && cmp.float(s.y2, p.y2))
      })
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
  private val delaunaySeen = new ThreadLocal[Scratch.PtSet] {
    override def initialValue(): Scratch.PtSet = new Scratch.PtSet(256)
  }

  def delaunayTriangles(segs: IndexedSeq[Seg]): IndexedSeq[(Pt, Pt, Pt)] = {
    val seen = delaunaySeen.get()
    seen.clear()
    val pts = mutable.ArrayBuffer[Pt]()
    val constraints = mutable.ArrayBuffer[Seg]()
    segs.foreach { s =>
      val lnt = math.sqrt(s.lengthSquared)
      if (!Cmp.Default.float(lnt, 0.0)) {
        val p1 = s.p1; val p2 = s.p2
        if (seen.add(p1)) pts += p1
        if (seen.add(p2)) pts += p2
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
      QuadEdge.resetPool() // row boundary: prior rows' subdivisions are dead
      makeValid(Vector(rs), clipbox).map(GMultiPolygon.apply)
    case GMultiPolygon(mp) =>
      QuadEdge.resetPool()
      makeValid(mp, clipbox).map(GMultiPolygon.apply)
    case other => Clip.geometry(other, clipbox)
  }
}
