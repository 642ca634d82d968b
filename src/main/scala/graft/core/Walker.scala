package graft.core

import graft.core.Geom._
import scala.collection.mutable

/** Triangle → polygon walker (reference planar/makevalid/walker/
  * {walker,cut}.go): shared-edge map keyed by exact sorted vertex pairs,
  * DFS ring walk per unseen triangle, bridge removal / sliver cutting,
  * winding rectification (exterior CW, holes CCW). Comparator: HiCMP.
  */
object Walker {

  private val cmp = Cmp.HiCmp
  type Tri = (Pt, Pt, Pt)

  private val ringPtIndex = new ThreadLocal[Scratch.PtIntMap] {
    override def initialValue(): Scratch.PtIntMap = new Scratch.PtIntMap(256)
  }

  private def sortedEdge(p1: Pt, p2: Pt): (Pt, Pt) =
    if (Cmp.pointLess(p1, p2)) (p1, p2) else (p2, p1)

  private def sortedEdges(t: Tri): Seq[(Pt, Pt)] =
    Seq(sortedEdge(t._1, t._2), sortedEdge(t._1, t._3), sortedEdge(t._2, t._3))

  /** reference triangle.go:46-57 ThirdPoint (exact equality as in Go's
    * pointEqual on [2]float64 — wait, Go uses cmp.GeomPointEqual? It uses
    * package geom's pointEqual = exact? geom.Triangle.ThirdPoint uses
    * pointEqual helper in geom pkg (tolerance 1e-9).
    */
  private def thirdPoint(t: Tri, p1: Pt, p2: Pt): Pt = {
    def eq(a: Pt, b: Pt) = cmp.pointEqual(a, b)
    if ((eq(t._1, p1) && eq(t._2, p2)) || (eq(t._2, p1) && eq(t._1, p2))) t._3
    else if ((eq(t._1, p1) && eq(t._3, p2)) || (eq(t._3, p1) && eq(t._1, p2))) t._2
    else t._1
  }

  def multiPolygon(triangles: IndexedSeq[Tri]): IndexedSeq[IndexedSeq[IndexedSeq[Pt]]] = {
    val edgeMap = mutable.HashMap[(Pt, Pt), mutable.ArrayBuffer[Int]]()
    triangles.zipWithIndex.foreach { case (t, i) =>
      sortedEdges(t).foreach { e =>
        edgeMap.getOrElseUpdate(e, mutable.ArrayBuffer.empty) += i
      }
    }
    val seen = mutable.HashSet[Int]()
    val out = Vector.newBuilder[IndexedSeq[IndexedSeq[Pt]]]
    var i = 0
    while (i < triangles.length) {
      if (!seen.contains(i)) {
        seen += i
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

  private def indexForEdge(edgeMap: mutable.HashMap[(Pt, Pt), mutable.ArrayBuffer[Int]],
                           p1: Pt, p2: Pt, defaultIdx: Int,
                           seen: mutable.HashSet[Int]): (Int, Boolean) = {
    edgeMap.get(sortedEdge(p1, p2)) match {
      case Some(idxs) =>
        val it = idxs.iterator
        while (it.hasNext) {
          val idx = it.next()
          if (!seen.contains(idx) && idx != defaultIdx) return (idx, true)
        }
        (defaultIdx, false)
      case None => (defaultIdx, false)
    }
  }

  /** reference walker.go:117-200 RingForTriangle. */
  def ringForTriangle(triangles: IndexedSeq[Tri],
                      edgeMap: mutable.HashMap[(Pt, Pt), mutable.ArrayBuffer[Int]],
                      idx: Int, seen: mutable.HashSet[Int]): mutable.ArrayBuffer[Pt] = {
    seen += idx
    var headIdx = 0
    val rng = mutable.ArrayBuffer[Pt](triangles(idx)._1, triangles(idx)._2, triangles(idx)._3)
    var cidxs = mutable.ArrayBuffer[Int](idx, idx, idx)

    while (true) {
      if (headIdx >= rng.length || cidxs.isEmpty) return rng

      val (cidx, ok) = indexForEdge(edgeMap, rng.head, rng.last, cidxs.last, seen)
      if (!ok) {
        // rotate: move last point to front
        headIdx += 1
        val lpt = rng.remove(rng.length - 1)
        rng.insert(0, lpt)
        cidxs.remove(cidxs.length - 1)
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
          cidxs = cidxs.take(prevI + 1)
        } else {
          rng += thirdPoint(triangles(cidx), rng.head, rng.last)
          cidxs(cidxs.length - 1) = cidx
          cidxs += cidx
          seen += cidx
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

  /** reference walker.go:204-320 PolygonForRing: bubble/sliver cutting. */
  def polygonForRing(rng0: mutable.ArrayBuffer[Pt]): IndexedSeq[IndexedSeq[Pt]] = {
    if (rng0.length <= 2) return Vector.empty
    val rng = mutable.ArrayBuffer[Pt]() ++= Cmp.rotateToLeftMostPoint(rng0.toIndexedSeq)

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
              plyg += Cmp.rotateToLeftMostPoint(sliver.toIndexedSeq)
            }
            i = if (idx - 1 < 0) 0 else idx - 1
          } else {
            val removeB = Planar.isPointOnLine(cmp, rng(i), rng(pidx), rng(nidx))
            val sliver = removeBridge(cut(rng, idx, i))
            if (sliver.length >= 3) {
              plyg += Cmp.rotateToLeftMostPoint(sliver.toIndexedSeq)
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
    plyg(0) = Cmp.rotateToLeftMostPoint(rng.toIndexedSeq)
    plyg.toIndexedSeq
  }
}
