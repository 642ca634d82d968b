package graft.core

import graft.core.Geom._

/** Guibas–Stolfi quad-edge structure + topology operators.
  *
  * Semantics from /root/reference/planar/triangulate/delaunay/quadedge/
  * {quadedge,edge,topo,resolve_edge}.go. All point comparisons in this
  * package use the high-precision comparator (tolerance 1e-9 — quadedge
  * cmp.go:7 `cmp = pkg.HiCMP`).
  */
object QuadEdge {

  val cmp: Cmp = Cmp.HiCmp

  final class Edge private[QuadEdge] (val num: Int) {
    var next: Edge = _
    private[QuadEdge] var qe: Array[Edge] = _
    var v: Pt = null.asInstanceOf[Pt] // orig vertex; null = unset

    var hasV: Boolean = false

    def orig: Pt = v
    def dest: Pt = sym.v
    def origDefined: Boolean = hasV
    def destDefined: Boolean = sym.hasV

    def setEndPoints(o: Pt, d: Pt): Unit = {
      v = o; hasV = true
      sym.v = d; sym.hasV = true
    }

    def rot: Edge = if (num == 3) qe(0) else qe(num + 1)
    def invRot: Edge = if (num == 0) qe(3) else qe(num - 1)
    def sym: Edge = if (num < 2) qe(num + 2) else qe(num - 2)
    def oNext: Edge = next
    def oPrev: Edge = rot.oNext.rot
    def dNext: Edge = sym.oNext.sym
    def dPrev: Edge = invRot.oNext.invRot
    def lNext: Edge = invRot.oNext.rot
    def lPrev: Edge = oNext.sym
    def rNext: Edge = rot.oNext.invRot
    def rPrev: Edge = sym.oNext

    def asSeg: Seg = Seg(orig, dest)

    /** reference edge.go:222-232 IsEqual: `e == &e1.qe.e[e.num]` — true
      * whenever the other edge belongs to the SAME quad-edge group (so the
      * sym matches too); FindIntersectingEdges' termination relies on this.
      */
    def isEqual(o: Edge): Boolean = o != null && (qe eq o.qe)

    /** reference edge.go FindONextDest (HiCMP equality). */
    def findONextDest(d: Pt): Edge = {
      if (cmp.pointEqual(d, dest)) return this
      var ne = oNext
      while (ne ne this) {
        if (cmp.pointEqual(d, ne.dest)) return ne
        ne = ne.oNext
      }
      null
    }

    def walkAllONext(fn: Edge => Boolean): Unit = {
      val seen = new java.util.IdentityHashMap[Array[Edge], Boolean]()
      var e = this
      while (e != null && !seen.containsKey(e.qe)) {
        if (!fn(e)) return
        seen.put(e.qe, true)
        e = e.oNext
      }
    }
  }

  /** 4-edge group (reference quadedge.go Init). */
  def newEdge(): Edge = {
    val es = Array(new Edge(0), new Edge(1), new Edge(2), new Edge(3))
    es.foreach(_.qe = es)
    es(0).next = es(0)
    es(1).next = es(3)
    es(2).next = es(2)
    es(3).next = es(1)
    es(0)
  }

  def newWithEndPoints(o: Pt, d: Pt): Edge = {
    val e = newEdge()
    e.setEndPoints(o, d)
    e
  }

  /** reference topo.go:13-28 Splice. */
  def splice(a: Edge, b: Edge): Unit = {
    if (a == null || b == null) return
    val alpha = a.oNext.rot
    val beta = b.oNext.rot
    val t1 = b.oNext
    val t2 = a.oNext
    val t3 = beta.oNext
    val t4 = alpha.oNext
    a.next = t1
    b.next = t2
    alpha.next = t3
    beta.next = t4
  }

  /** reference topo.go Connect: resolve b around a.Dest then hook up. */
  def connect(a: Edge, b: Edge, yPositiveDown: Boolean): Edge = {
    if (a == null || b == null) return null
    val bb = resolveEdge(yPositiveDown, b, a.dest) match {
      case Right(e)     => e
      case Left((e, _)) => e // reference ignores the error here
    }
    val e = newEdge()
    if (bb != null) e.setEndPoints(a.dest, bb.orig)
    else { e.v = a.dest; e.hasV = true } // degenerate resolve: orig only
    splice(e, a.lNext)
    if (bb != null) splice(e.sym, bb)
    e
  }

  /** reference topo.go Swap. */
  def swap(e: Edge): Unit = {
    val a = e.oPrev
    val b = e.sym.oPrev
    splice(e, a)
    splice(e.sym, b)
    splice(e, a.lNext)
    splice(e.sym, b.lNext)
    e.setEndPoints(a.dest, b.dest)
  }

  /** reference topo.go Delete. */
  def delete(e: Edge): Unit = {
    if (e == null) return
    val sym = e.sym
    splice(e, e.oPrev)
    splice(sym, sym.oPrev)
  }

  /** reference topo.go OnEdge: point-on-segment with HiCMP. */
  def onEdge(pt: Pt, e: Edge): Boolean = {
    if (!e.origDefined || !e.destDefined) return false
    Planar.isPointOnLineSegment(cmp, pt, e.asSeg)
  }

  /** reference topo.go RightOf: x is clockwise of (orig, dest). */
  def rightOf(yPositiveDown: Boolean, x: Pt, e: Edge): Boolean = {
    if (!e.origDefined || !e.destDefined) return false
    Winding.orientation(yPositiveDown, Vector(e.orig, e.dest, x)) == Winding.Clockwise
  }

  // ---- ResolveEdge (reference resolve_edge.go:71-277) ----

  private final class REdge(val orig: Pt, val destAbs: Pt) {
    var e: Edge = _
    var ab, da, db: Int = 0
    var candidate: Edge = _
    var err: String = _
    def ccwAB = ab == Winding.CounterClockwise
    def cwAB = ab == Winding.Clockwise
    def zAB = ab == Winding.Colinear
    def ccwDA = da == Winding.CounterClockwise
    def cwDA = da == Winding.Clockwise
    def zDA = da == Winding.Colinear
    def ccwDB = db == Winding.CounterClockwise
    def cwDB = db == Winding.Clockwise
    def zDB = db == Winding.Colinear
    def doNext(): Unit = { candidate = null; err = null }
    def a(): Unit = { candidate = e }
    def errA(): Unit = { candidate = e; err = "colinear" }
    def errB(): Unit = { candidate = e.oNext; err = "colinear" }
    def errEdge(): Unit = { candidate = e; err = "coincident" }
    def containsDest: Boolean = e.asSeg.bboxContains(destAbs)
  }

  /** Returns Right(edge) on clean resolve, Left((edge, reason)) when the
    * reference would return (candidate, error).
    */
  def resolveEdge(yPositiveDown: Boolean, gse: Edge, odest: Pt): Either[(Edge, String), Edge] = {
    val orig = gse.orig
    if (cmp.pointEqual(orig, odest)) return Left((null, "invalid end vertex"))
    val dest = (odest._1 - orig._1, odest._2 - orig._2)
    val re = new REdge(orig, odest)

    gse.walkAllONext { e =>
      val apt = e.dest
      val bpt = e.oNext.dest
      re.err = null
      re.candidate = null
      val ao = (apt._1 - orig._1, apt._2 - orig._2)
      val bo = (bpt._1 - orig._1, bpt._2 - orig._2)
      val oo = (0.0, 0.0)
      re.ab = Winding.orientation(yPositiveDown, Vector(ao, bo, oo))
      re.da = Winding.orientation(yPositiveDown, Vector(dest, ao, oo))
      re.db = Winding.orientation(yPositiveDown, Vector(dest, bo, oo))
      re.e = e
      if (yPositiveDown) tableYDown(re) else tableYUp(re)
      re.candidate == null && re.err == null
    }
    if (re.err != null) Left((re.candidate, re.err))
    else if (re.candidate != null) Right(re.candidate)
    else Right(gse) // walked all with Next() everywhere: fall back
  }

  /** reference resolveEdgeYUp (resolve_edge.go:108-157). */
  private def tableYUp(re: REdge): Unit = {
    if (re.ccwAB) {
      if (re.ccwDA) re.doNext()
      else if (re.cwDA && re.ccwDB) re.a()
      else if (re.cwDA && re.cwDB) re.doNext()
      else if (re.cwDA && re.zDB) re.errB()
      else if (re.zDA && re.ccwDB) re.errA()
      else if (re.zDA && re.cwDB) re.doNext()
    } else if (re.cwAB) {
      if (re.cwDA) re.a()
      else if (re.ccwDA && re.ccwDB) re.a()
      else if (re.ccwDA && re.cwDB) re.doNext()
      else if (re.ccwDA && re.zDB) re.errB()
      else if (re.zDA && re.ccwDB) re.a()
      else if (re.zDA && re.cwDB) re.errA()
    } else if (re.zAB) {
      if (re.ccwDA && re.cwDB) re.doNext()
      else if (re.cwDA && re.ccwDB) re.a()
      else if ((re.cwDA && re.cwDB) || (re.ccwDA && re.ccwDB)) re.a()
      else if (re.zDA && re.zDB) { if (re.containsDest) re.errA() else re.errB() }
    } else re.errEdge()
  }

  /** reference resolveEdgeYDown (resolve_edge.go:159-210). */
  private def tableYDown(re: REdge): Unit = {
    if (re.ccwAB && re.ccwDA) re.doNext()
    else if (re.ccwAB && re.cwDA && re.cwDB) re.doNext()
    else if (re.ccwAB && re.cwDA && re.ccwDB) re.a()
    else if (re.ccwAB && re.cwDA && re.zDB) re.errB()
    else if (re.ccwAB && re.zDA && re.ccwDB) re.errA()
    else if (re.ccwAB && re.zDA && re.cwDB) re.doNext()
    else if (re.cwAB && re.ccwDA && re.ccwDB) re.a()
    else if (re.cwAB && re.ccwDA && re.cwDB) re.doNext()
    else if (re.cwAB && re.ccwDA && re.zDB) re.errB()
    else if (re.cwAB && re.cwDA) re.a()
    else if (re.cwAB && re.zDA && re.ccwDB) re.a()
    else if (re.cwAB && re.zDA && re.cwDB) re.errA()
    else if (re.zAB && re.ccwDA && re.cwDB) re.doNext()
    else if (re.zAB && re.cwDA && re.ccwDB) re.a()
    else if (re.zAB && re.zDA && re.zDB) { if (re.containsDest) re.errA() else re.errB() }
    else if (re.zAB && re.ccwDA && re.ccwDB) re.a()
    else if (re.zAB && re.cwDA && re.cwDB) re.a()
    else re.errEdge()
  }
}
