package graft.core

import graft.core.Geom._
import scala.collection.mutable

/** Triangle → polygon walker (reference planar/makevalid/walker/
  * {walker,cut}.go): shared-edge map keyed by exact sorted vertex pairs,
  * DFS ring walk per unseen triangle, bridge removal / sliver cutting,
  * winding rectification (exterior CW, holes CCW). Comparator: HiCMP.
  *
  * Round-3 allocation rework: the shared-edge map is a pooled open-
  * addressing table keyed on the four coordinate bit patterns (canonical
  * zero — the same key equality the former HashMap[(Pt, Pt)] gave via
  * numeric ==) with FIFO triangle lists in parallel int arrays (insertion
  * order preserved — which triangle is picked when an edge is shared
  * depends on it); `seen` is a Boolean array; the per-walk index stack is
  * a primitive int buffer. Ring/cut/polygon logic is unchanged.
  */
object Walker {

  private val cmp = Cmp.HiCmp
  type Tri = (Pt, Pt, Pt)

  private val ringPtIndex = new ThreadLocal[Scratch.PtIntMap] {
    override def initialValue(): Scratch.PtIntMap = new Scratch.PtIntMap(256)
  }

  @inline private def bits(d: Double): Long =
    if (d == 0.0) 0L else java.lang.Double.doubleToLongBits(d)

  /** pooled shared-edge map: sorted (p1, p2) → FIFO list of triangle
    * indices.
    */
  private final class EdgeTriMap {
    private var cap = 256
    private var kx1 = new Array[Long](cap); private var ky1 = new Array[Long](cap)
    private var kx2 = new Array[Long](cap); private var ky2 = new Array[Long](cap)
    private var head = new Array[Int](cap); private var tail = new Array[Int](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    private var nodeTri = new Array[Int](256)
    private var nodeNext = new Array[Int](256)
    private var nNodes = 0

    def clear(): Unit = {
      if (n > 0) java.util.Arrays.fill(used, false)
      n = 0; nNodes = 0
    }

    @inline private def hash(a: Long, b: Long, c: Long, d: Long): Int = {
      var h = a * 0x9E3779B97F4A7C15L + b
      h = h * 0xBF58476D1CE4E5B9L + c
      h = h * 0x94D049BB133111EBL + d
      h ^= (h >>> 32)
      h.toInt
    }

    private def slotOf(a: Long, b: Long, c: Long, d: Long): Int = {
      var i = hash(a, b, c, d) & (cap - 1)
      while (used(i)) {
        if (kx1(i) == a && ky1(i) == b && kx2(i) == c && ky2(i) == d) return i
        i = (i + 1) & (cap - 1)
      }
      i // first free slot
    }

    private def grow(): Unit = {
      val ok1 = kx1; val ok2 = ky1; val ok3 = kx2; val ok4 = ky2
      val oh = head; val ot = tail; val ou = used
      cap <<= 1
      kx1 = new Array[Long](cap); ky1 = new Array[Long](cap)
      kx2 = new Array[Long](cap); ky2 = new Array[Long](cap)
      head = new Array[Int](cap); tail = new Array[Int](cap)
      used = new Array[Boolean](cap)
      var i = 0
      while (i < ou.length) {
        if (ou(i)) {
          val s = slotOf(ok1(i), ok2(i), ok3(i), ok4(i))
          used(s) = true
          kx1(s) = ok1(i); ky1(s) = ok2(i); kx2(s) = ok3(i); ky2(s) = ok4(i)
          head(s) = oh(i); tail(s) = ot(i)
        }
        i += 1
      }
    }

    /** append triangle `tri` to the FIFO list of the canonical edge
      * (p1x,p1y)-(p2x,p2y) (callers pass the sorted order).
      */
    def add(p1x: Double, p1y: Double, p2x: Double, p2y: Double, tri: Int): Unit = {
      if (nNodes == nodeTri.length) {
        nodeTri = java.util.Arrays.copyOf(nodeTri, nNodes * 2)
        nodeNext = java.util.Arrays.copyOf(nodeNext, nNodes * 2)
      }
      val node = nNodes
      nodeTri(node) = tri; nodeNext(node) = -1
      nNodes += 1
      val a = bits(p1x); val b = bits(p1y); val c = bits(p2x); val d = bits(p2y)
      val s = slotOf(a, b, c, d)
      if (!used(s)) {
        used(s) = true
        kx1(s) = a; ky1(s) = b; kx2(s) = c; ky2(s) = d
        head(s) = node; tail(s) = node
        n += 1
        if (n * 2 > cap) grow()
      } else {
        nodeNext(tail(s)) = node
        tail(s) = node
      }
    }

    /** first triangle on the edge list (insertion order) that is neither
      * seen nor `defaultIdx`; −1 when none.
      */
    def firstUnseen(p1x: Double, p1y: Double, p2x: Double, p2y: Double,
                    defaultIdx: Int, seen: Array[Boolean]): Int = {
      val a = bits(p1x); val b = bits(p1y); val c = bits(p2x); val d = bits(p2y)
      val s = slotOf(a, b, c, d)
      if (!used(s)) return -1
      var node = head(s)
      while (node >= 0) {
        val t = nodeTri(node)
        if (!seen(t) && t != defaultIdx) return t
        node = nodeNext(node)
      }
      -1
    }
  }

  private val edgeMapScratch = new ThreadLocal[EdgeTriMap] {
    override def initialValue(): EdgeTriMap = new EdgeTriMap
  }

  /** growable primitive int stack (ArrayBuffer[Int] boxes). */
  private final class IntBuf {
    var a = new Array[Int](64)
    var n = 0
    def clear(): Unit = n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def last: Int = a(n - 1)
    def setLast(v: Int): Unit = a(n - 1) = v
    def removeLast(): Unit = n -= 1
    def isEmpty: Boolean = n == 0
    def indexOf(v: Int): Int = {
      var i = 0
      while (i < n) { if (a(i) == v) return i; i += 1 }
      -1
    }
    def truncate(len: Int): Unit = n = len
  }

  private val cidxsScratch = new ThreadLocal[IntBuf] {
    override def initialValue(): IntBuf = new IntBuf
  }

  // pooled ring buffers: the walk ring (ringForTriangle) and the working
  // ring (polygonForRing via rotatedBuf) never escape — every emitted ring
  // is copied into a fresh array by rotatedSeq — so both recycle per call
  private val walkRngScratch = new ThreadLocal[mutable.ArrayBuffer[Pt]] {
    override def initialValue(): mutable.ArrayBuffer[Pt] = new mutable.ArrayBuffer[Pt](64)
  }
  private val workRngScratch = new ThreadLocal[mutable.ArrayBuffer[Pt]] {
    override def initialValue(): mutable.ArrayBuffer[Pt] = new mutable.ArrayBuffer[Pt](64)
  }

  /** reference triangle.go:46-57 ThirdPoint (HiCMP equality). */
  private def thirdPoint(t: Tri, p1: Pt, p2: Pt): Pt = {
    def eq(a: Pt, b: Pt) = cmp.pointEqual(a, b)
    if ((eq(t._1, p1) && eq(t._2, p2)) || (eq(t._2, p1) && eq(t._1, p2))) t._3
    else if ((eq(t._1, p1) && eq(t._3, p2)) || (eq(t._3, p1) && eq(t._1, p2))) t._2
    else t._1
  }

  /** register triangle `i`'s three edges in canonical (pointLess) order. */
  private def addEdges(m: EdgeTriMap, t: Tri, i: Int): Unit = {
    @inline def put(p: Pt, q: Pt): Unit =
      if (Cmp.pointLess(p, q)) m.add(p._1, p._2, q._1, q._2, i)
      else m.add(q._1, q._2, p._1, p._2, i)
    put(t._1, t._2); put(t._1, t._3); put(t._2, t._3)
  }

  def multiPolygon(triangles: IndexedSeq[Tri]): IndexedSeq[IndexedSeq[IndexedSeq[Pt]]] = {
    val edgeMap = edgeMapScratch.get()
    edgeMap.clear()
    var i = 0
    while (i < triangles.length) {
      addEdges(edgeMap, triangles(i), i)
      i += 1
    }
    val seen = new Array[Boolean](triangles.length)
    val out = Vector.newBuilder[IndexedSeq[IndexedSeq[Pt]]]
    i = 0
    while (i < triangles.length) {
      if (!seen(i)) {
        seen(i) = true
        val rng = ringForTriangle(triangles, edgeMap, i, seen)
        val plyg4r = polygonForRing(rng)
        Winding.rectifyPolygon(plyg4r.map(_.toIndexedSeq)) match {
          case Some(p) if p.nonEmpty => out += p
          case _                     =>
        }
      }
      i += 1
    }
    out.result()
  }

  /** canonical-order lookup (mirrors the former sortedEdge key build). */
  private def firstUnseenEdge(edgeMap: EdgeTriMap, p1: Pt, p2: Pt,
                              defaultIdx: Int, seen: Array[Boolean]): Int =
    if (Cmp.pointLess(p1, p2))
      edgeMap.firstUnseen(p1._1, p1._2, p2._1, p2._2, defaultIdx, seen)
    else
      edgeMap.firstUnseen(p2._1, p2._2, p1._1, p1._2, defaultIdx, seen)

  /** reference walker.go:117-200 RingForTriangle. */
  private def ringForTriangle(triangles: IndexedSeq[Tri], edgeMap: EdgeTriMap,
                              idx: Int, seen: Array[Boolean]): mutable.ArrayBuffer[Pt] = {
    seen(idx) = true
    var headIdx = 0
    val rng = walkRngScratch.get()
    rng.clear()
    rng += triangles(idx)._1 += triangles(idx)._2 += triangles(idx)._3
    val cidxs = cidxsScratch.get()
    cidxs.clear()
    cidxs.add(idx); cidxs.add(idx); cidxs.add(idx)

    while (true) {
      if (headIdx >= rng.length || cidxs.isEmpty) return rng

      val cidx = firstUnseenEdge(edgeMap, rng.head, rng.last, cidxs.last, seen)
      if (cidx < 0) {
        // rotate: move last point to front
        headIdx += 1
        val lpt = rng.remove(rng.length - 1)
        rng.insert(0, lpt)
        cidxs.removeLast()
      } else if (cidx == idx) {
        return rng
      } else {
        // if we've encountered cidx before, rotate the ring back to it
        val prevI = cidxs.indexOf(cidx)
        if (prevI >= 0) {
          val tlen = rng.length - (prevI + 1)
          // rng = rng[i+1:] ++ rng[:i+1] rotated so that the segment after
          // the previous encounter comes first (reference walker.go:168-180)
          val tpts = rng.slice(prevI + 1, rng.length)
          val head = rng.slice(0, prevI + 1)
          rng.clear()
          rng ++= tpts ++= head
          headIdx += tlen
          cidxs.truncate(prevI + 1)
        } else {
          rng += thirdPoint(triangles(cidx), rng.head, rng.last)
          cidxs.setLast(cidx)
          cidxs.add(cidx)
          seen(cidx) = true
        }
      }
    }
    rng
  }

  /** reference walker/cut.go:23-56 cut. */
  def cut(rng: mutable.ArrayBuffer[Pt], start: Int, end: Int): mutable.ArrayBuffer[Pt] = {
    if (end < start) {
      val sliver = mutable.ArrayBuffer[Pt]()
      sliver ++= rng.slice(start, rng.length)
      sliver ++= rng.slice(0, end)
      val kept = rng.slice(end, start)
      rng.clear()
      rng ++= kept
      sliver
    } else if (end == start) {
      val sliver = mutable.ArrayBuffer[Pt](rng(end))
      rng.remove(end)
      sliver
    } else {
      val sliver = rng.slice(start, end)
      rng.remove(start, end - start)
      sliver
    }
  }

  /** reference walker/cut.go:5-21 removeBridge — exact (==) comparisons. */
  def removeBridge(rng: mutable.ArrayBuffer[Pt]): mutable.ArrayBuffer[Pt] = {
    val nrng = mutable.ArrayBuffer[Pt]()
    var addLst = true
    var li = rng.length - 1
    var i = 0
    while (i < rng.length - 1) {
      if (rng(li) == rng(i + 1)) {
        li = i + 1
        i = i + 2
        addLst = i != rng.length
      } else {
        nrng += rng(i)
        li = i
        i += 1
      }
    }
    if (addLst) nrng += rng(rng.length - 1)
    nrng
  }

  /** rotateToLeftMostPoint(buf.toIndexedSeq) without the intermediate
    * immutable copy — one output allocation (same least-point choice:
    * first strict-least index wins).
    */
  private def rotatedSeq(buf: mutable.ArrayBuffer[Pt]): IndexedSeq[Pt] = {
    val n = buf.length
    if (n == 0) return Vector.empty
    var li = 0
    var i = 1
    while (i < n) { if (Cmp.pointLess(buf(i), buf(li))) li = i; i += 1 }
    val arr = new Array[Pt](n)
    var k = 0
    while (k < n) { arr(k) = buf(if (li + k < n) li + k else li + k - n); k += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
  }

  private def rotatedBuf(buf: mutable.ArrayBuffer[Pt]): mutable.ArrayBuffer[Pt] = {
    val n = buf.length
    val out = workRngScratch.get()
    out.clear()
    if (n == 0) return out
    var li = 0
    var i = 1
    while (i < n) { if (Cmp.pointLess(buf(i), buf(li))) li = i; i += 1 }
    var k = 0
    while (k < n) { out += buf(if (li + k < n) li + k else li + k - n); k += 1 }
    out
  }

  /** reference walker.go:204-320 PolygonForRing: bubble/sliver cutting. */
  def polygonForRing(rng0: mutable.ArrayBuffer[Pt]): IndexedSeq[IndexedSeq[Pt]] = {
    if (rng0.length <= 2) return Vector.empty
    val rng = rotatedBuf(rng0)

    def pIdx(i: Int): Int = if (i == 0) rng.length - 1 else i - 1
    def nIdx(i: Int): Int = if (i == rng.length - 1) 0 else i + 1

    val plyg = mutable.ArrayBuffer[IndexedSeq[Pt]](Vector.empty)
    val ptIndex = ringPtIndex.get()
    ptIndex.clear()

    // mirrors the reference's `for i := 0; i < len(rng); i++` — the index
    // reassignments inside the branches are followed by the loop increment
    var i = 0
    var break = false
    while (i < rng.length && !break) {
      ptIndex.getOrElse(rng(i), -1) match {
        case -1 =>
          ptIndex.put(rng(i), i)
        case idx =>
          val pidx = pIdx(idx)
          val nidx = nIdx(i)
          var j = idx
          while (j <= i) { ptIndex.remove(rng(j)); j += 1 }

          if (nidx != pidx && cmp.pointEqual(rng(pidx), rng(nidx))) {
            // bubble type ab…ba
            ptIndex.remove(rng(pidx))
            var sliver = cut(rng, pidx, nidx)
            sliver = sliver.drop(2)
            if (sliver.length >= 3) {
              plyg += rotatedSeq(sliver)
            }
            i = if (idx - 1 < 0) 0 else idx - 1
          } else {
            val removeB = Planar.isPointOnLine(cmp, rng(i), rng(pidx), rng(nidx))
            val sliver = removeBridge(cut(rng, idx, i))
            if (sliver.length >= 3) {
              plyg += rotatedSeq(sliver)
            }
            i = idx
            if (removeB) {
              cut(rng, idx, idx + 1)
              if (idx == 0) break = true
              else i = idx - 1
            }
          }
      }
      if (!break) i += 1
    }

    if (rng.length <= 2) return Vector.empty
    plyg(0) = rotatedSeq(rng)
    plyg.toIndexedSeq
  }
}
