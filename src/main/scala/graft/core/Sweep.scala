package graft.core

import graft.core.Geom._
import scala.collection.mutable

/** Segment-intersection event queue
  * (reference planar/intersect/xsweep.go:66-179): two events per segment
  * (LEFT/RIGHT by x-then-y), sorted by (x, type, y); active set keyed by
  * segment index; on each RIGHT event the closing segment is tested against
  * every active segment (in ascending index order); `connected=true` skips
  * pairs sharing an endpoint (default-tolerance equality).
  */
object Sweep {

  private final case class Event(edge: Int, isLeft: Boolean, x: Double, y: Double)

  def findIntersects(segments: IndexedSeq[Seg], connected: Boolean)
                    (fn: (Int, Int, Pt) => Boolean): Unit = {
    val events = new mutable.ArrayBuffer[Event](segments.length * 2)
    var i = 0
    while (i < segments.length) {
      val s = segments(i)
      val leftFirst = s.x1 < s.x2 || (s.x1 == s.x2 && s.y1 < s.y2)
      events += Event(i, leftFirst, s.x1, s.y1)
      events += Event(i, !leftFirst, s.x2, s.y2)
      i += 1
    }
    val sorted = events.sortWith { (a, b) =>
      if (a.x != b.x) a.x < b.x
      else if (a.isLeft != b.isLeft) a.isLeft // LEFT(0) < RIGHT(1)
      else a.y < b.y
    }

    val cmp = Cmp.Default
    val active = mutable.TreeSet[Int]()
    val ei = sorted.iterator
    while (ei.hasNext) {
      val ev = ei.next()
      if (ev.isLeft) active += ev.edge
      else {
        active -= ev.edge
        if (active.nonEmpty) {
          val seg = segments(ev.edge)
          val it = active.iterator
          while (it.hasNext) {
            val other = it.next()
            val seg1 = segments(other)
            val skip = connected && {
              val matchStart = cmp.pointEqual(seg.p1, seg1.p1) || cmp.pointEqual(seg.p1, seg1.p2)
              val matchEnd = cmp.pointEqual(seg.p2, seg1.p1) || cmp.pointEqual(seg.p2, seg1.p2)
              matchStart || matchEnd
            }
            if (!skip) {
              val (ipt, ok) = Planar.segmentIntersect(seg, seg1)
              if (ok && !fn(ev.edge, other, ipt)) return
            }
          }
        }
      }
    }
  }
}
