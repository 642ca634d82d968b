package graft.core

import graft.core.Geom._
import graft.core.QuadEdge.Edge
import scala.collection.mutable

/** Constrained edge insertion for the Delaunay subdivision — the
  * TEGOLA_MAKEVALID=CONSTRAINED path of the reference
  * (/root/reference/planar/triangulate/delaunay/subdivision/
  * subdivision_constrained.go:27-413 + subdivision.go:544-885 VertexIndex/
  * FindIntersectingEdges, quadedge/qtype.go Classify). Default-OFF, exactly
  * like the reference (constrained.go:24-31): the plain path stays
  * bit-identical when the flag is off.
  */
object SubdivisionConstrained {

  private val cmp = Cmp.HiCmp

  // ---- qtype.go Classify ----
  final val LEFT = 0
  final val RIGHT = 1
  final val BEYOND = 2
  final val BEHIND = 3
  final val BETWEEN = 4
  final val ORIGIN = 5
  final val DESTINATION = 6

  /** where b..c places a (qtype.go:51-73). */
  def classify(a: Pt, b: Pt, c: Pt): Int = {
    val aa = (c._1 - b._1, c._2 - b._2)
    val bb = (a._1 - b._1, a._2 - b._2)
    val sa = (aa._1 * bb._2) - (aa._2 * bb._1)
    if (sa > 0.0) return LEFT
    if (sa < 0.0) return RIGHT
    val ab = (aa._1 * bb._1, aa._2 * bb._2)
    if (ab._1 < 0.0 || ab._2 < 0.0) return BEHIND
    def mag(p: (Double, Double)) = math.sqrt((p._1 * p._1) + (p._2 * p._2))
    if (mag(aa) < mag(bb)) return BEYOND
    if (cmp.pointEqual(a, b)) return ORIGIN
    if (cmp.pointEqual(a, c)) return DESTINATION
    BETWEEN
  }

  // ---- subdivision.go:544-610 VertexIndex ----

  /** point → an edge whose origin is that point (rounded keys, Go map
    * exact-equality semantics; −0 already normalized by roundPoint).
    */
  final class VertexIndex {
    val m = mutable.HashMap[Pt, Edge]()

    def add(e: Edge): Unit = {
      val orig = Subdivision.roundPoint(e.orig)
      val dest = Subdivision.roundPoint(e.dest)
      if (!m.contains(orig)) m(orig) = e
      if (!m.contains(dest)) m(dest) = e.sym
    }

    def get(pt: Pt): Option[Edge] = m.get(Subdivision.roundPoint(pt))

    def remove(e: Edge): Unit = {
      val toRemove = Set(e, e.sym, e.rot, e.rot.sym)
      for (v0 <- Seq(e.orig, e.dest)) {
        val v = Subdivision.roundPoint(v0)
        m.get(v) match {
          case Some(ve) if toRemove.exists(_ eq ve) =>
            m.remove(v)
            if (ve.oNext ne ve) m(v) = ve.oNext
          case _ =>
        }
      }
    }
  }

  def vertexIndex(sd: Subdivision): VertexIndex = {
    val vx = new VertexIndex
    sd.walkAllEdges { e => vx.add(e); true }
    vx
  }

  /** subdivision.go:667-672 IsHardFrameEdge: both endpoints on the frame. */
  def isHardFrameEdge(frame: (Pt, Pt, Pt), e: Edge): Boolean = {
    val o = e.orig; val d = e.dest
    def onFrame(p: Pt) = cmp.pointEqual(p, frame._1) || cmp.pointEqual(p, frame._2) ||
      cmp.pointEqual(p, frame._3)
    onFrame(o) && onFrame(d)
  }

  /** subdivision_constrained.go:27-66: locate + orient the start/end edges;
    * Right(None) = constraint already present (nothing to do),
    * Right(Some((se, ee))) = resolved pair, Left(err) otherwise.
    */
  def resolveStartingEndingEdges(vx: VertexIndex, start0: Pt, end0: Pt)
      : Either[String, Option[(Edge, Edge)]] = {
    val start = Subdivision.roundPoint(start0)
    val end = Subdivision.roundPoint(end0)

    val startingEdge0 = vx.get(start) match {
      case Some(e) => e
      case None    => return Left("invalid starting vertex")
    }
    if (startingEdge0.findONextDest(end) != null) return Right(None) // already present

    val endingEdge0 = vx.get(end) match {
      case Some(e) => e
      case None    => return Left("invalid end vertex")
    }

    val (se, serr) = QuadEdge.resolveEdge(yPositiveDown = false, startingEdge0, end) match {
      case Right(e)       => (e, null: String)
      case Left((e, err)) => (e, err)
    }
    val (ee, eerr) = QuadEdge.resolveEdge(yPositiveDown = false, endingEdge0, start) match {
      case Right(e)       => (e, null: String)
      case Left((e, err)) => (e, err)
    }
    if (serr == "colinear" && eerr == "colinear") return Right(None) // overlaps existing edges
    Right(Some((se, ee)))
  }

  /** subdivision.go:765-885 FindIntersectingEdges. */
  def findIntersectingEdges(startingEdge0: Edge, endingEdge0: Edge)
      : Either[String, IndexedSeq[Edge]] = {
    if (startingEdge0 == null || endingEdge0 == null) return Right(Vector.empty)
    val start = startingEdge0.orig
    val end = endingEdge0.orig
    val line = Seg(start, end)
    if (line.lengthSquared == 0) return Right(Vector.empty)

    val startingEdge = QuadEdge.resolveEdge(yPositiveDown = false, startingEdge0, end) match {
      case Right(e) => e; case Left((e, _)) => e
    }
    val endingEdge = QuadEdge.resolveEdge(yPositiveDown = false, endingEdge0, start) match {
      case Right(e) => e; case Left((e, _)) => e
    }
    if (startingEdge == null || endingEdge == null) return Right(Vector.empty)
    if (cmp.pointEqual(startingEdge.dest, end) || cmp.pointEqual(endingEdge.dest, start))
      return Right(Vector.empty) // the edge already exists

    val sharedEE = endingEdge.oNext.sym.oNext
    var workingEdge = startingEdge.oNext.sym.oNext
    val edges = Vector.newBuilder[Edge]
    var count = 0
    while (true) {
      count += 1
      if (count > 21) return Left("infinite loop")
      val wln = workingEdge.asSeg
      val nwln = workingEdge.oNext.asSeg
      if (Planar.segmentIntersect(line, wln)._2) edges += workingEdge
      // Go IsEqual matches the whole quad-edge group (sym included)
      if (sharedEE.isEqual(workingEdge)) return Right(edges.result())
      if (Planar.segmentIntersect(line, nwln)._2) {
        workingEdge = workingEdge.oNext
      } else {
        workingEdge = workingEdge.oNext.sym.oNext
      }
    }
    Right(edges.result()) // unreachable
  }

  /** subdivision_constrained.go:220-297 insertEdge. */
  def insertEdge(sd: Subdivision, vx: VertexIndex, start0: Pt, end0: Pt): Either[String, Unit] = {
    val start = Subdivision.roundPoint(start0)
    val end = Subdivision.roundPoint(end0)

    val tempEdge0 = vx.get(start) match {
      case Some(e) => e
      case None    => return Left("invalid starting vertex")
    }
    if (tempEdge0.findONextDest(end) != null) return Right(()) // already exists

    val from = QuadEdge.resolveEdge(yPositiveDown = false, tempEdge0, end) match {
      case Right(e)              => e
      case Left((_, "colinear")) => return Right(()) // edge exists
      case Left((_, err))        => return Left(err)
    }
    if (from == null) return Left("invalid starting vertex")

    val tempEdge1 = vx.get(end) match {
      case Some(e) => e
      case None    => return Left("invalid end vertex")
    }
    val to = QuadEdge.resolveEdge(yPositiveDown = false, tempEdge1, start) match {
      case Right(e)              => e
      case Left((_, "colinear")) => return Right(())
      case Left((_, err))        => return Left(err)
    }
    if (to == null) return Left("invalid end vertex")

    val newEdge = QuadEdge.connect(from.oNext.sym, to, yPositiveDown = false)
    vx.add(newEdge)
    Right(())
  }

  /** subdivision_constrained.go:299-401 PseudoPolygonPointCollector. */
  private final class Pppc(val start: Pt, val end: Pt) {
    val upper = mutable.ArrayBuffer[Pt]()
    val lower = mutable.ArrayBuffer[Pt]()
    val seen = mutable.HashSet[Pt]()

    def addPoint(pt: Pt): Unit = {
      if (upper.isEmpty) { upper += start; seen += start }
      if (lower.isEmpty) { lower += start; seen += start }
      // NOTE: the reference does NOT mark pt as seen here — shared vertices
      // of consecutive removed edges appear twice and are handled by the
      // pseudo-polygon's sub-ring dedup (triangulateSubRings)
      if (seen.contains(pt)) return
      classify(pt, start, end) match {
        case LEFT  => lower += pt
        case RIGHT => upper += pt
        case _     => // colinear with the constraint: dropped
      }
    }

    def addEdge(e: Edge): Unit = { addPoint(e.orig); addPoint(e.dest) }

    def edges(isUpper: Boolean, yPositiveDown: Boolean): Either[String, IndexedSeq[Seg]] = {
      val pts = mutable.ArrayBuffer[Pt]() ++= (if (isUpper) upper else lower)
      if (!seen.contains(end)) pts += end
      if (pts.length == 2) return Right(Vector(Seg(start, end)))
      PseudoPolygon.triangulate(pts.toIndexedSeq, yPositiveDown)
    }
  }

  /** subdivision_constrained.go:68-218 InsertConstraint. */
  def insertConstraint(sd: Subdivision, vx: VertexIndex, start: Pt, end: Pt)
      : Either[String, Unit] = {
    val (startingEdge, endingEdge) = resolveStartingEndingEdges(vx, start, end) match {
      case Left(err)        => return Left(err)
      case Right(None)      => return Right(()) // already present
      case Right(Some(res)) => res
    }

    val removalList = findIntersectingEdges(startingEdge, endingEdge) match {
      case Left(err) => return Left(err)
      case Right(es) => es
    }
    if (removalList.isEmpty) return Right(())

    val pppc = new Pppc(start, end)
    for (e <- removalList) {
      if (!isHardFrameEdge(sd.frame, e)) {
        pppc.addEdge(e)
        vx.remove(e)
        QuadEdge.delete(e)
      }
    }

    // lower (ccw) first, then upper — subdivision_constrained.go:175
    for (isUpper <- Seq(false, true)) {
      val edges = pppc.edges(isUpper, yPositiveDown = false) match {
        case Left(err) => return Left(err)
        case Right(es) => es
      }
      // (the reference's ErrDidNotFindToFrom requeue branch is dead code —
      // insertEdge never returns that error — so any failure aborts)
      for (edge <- edges) {
        insertEdge(sd, vx, edge.p1, edge.p2) match {
          case Left(err) => return Left(err)
          case Right(()) =>
        }
      }
    }
    Right(())
  }
}
