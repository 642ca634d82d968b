package graft.core

import graft.core.Geom._

/** Scratch analyzer for the issue#70 divergence: diff our final output
  * rings against the expected golden, list flipped diagonals, and evaluate
  * the reference's swap predicates on each flipped quad. Run with
  *   sbt 'Test/runMain graft.core.Issue70Debug'
  */
object Issue70Debug {

  private def load(name: String): Geometry = {
    val src = scala.io.Source.fromInputStream(getClass.getResourceAsStream(name))
    try Wkt.decode(src.mkString.trim)
    finally src.close()
  }

  private def mp(g: Geometry): IndexedSeq[IndexedSeq[IndexedSeq[Pt]]] = g match {
    case GMultiPolygon(m) => m
    case GPolygon(rs)     => Vector(rs)
    case other            => sys.error(s"expected multipolygon, got $other")
  }

  private def r2(p: Pt): Pt =
    (math.rint(p._1 * 100) / 100, math.rint(p._2 * 100) / 100)

  private def edgeSet(m: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]): Set[(Pt, Pt)] =
    m.flatten.flatMap { ring =>
      Geom.ringSegments(ring).map { s =>
        val a = r2(s.p1); val b = r2(s.p2)
        if (Cmp.pointLess(a, b)) (a, b) else (b, a)
      }
    }.toSet

  def main(args: Array[String]): Unit = {
    val input = mp(load("/makevalid/issue70/multipolygon_input.wkt"))
    val expected = mp(load("/makevalid/issue70/multipolygon_expected.wkt"))
    val got = MakeValid.makeValid(input, None).get

    val ee = edgeSet(expected)
    val ge = edgeSet(got)
    val onlyGot = ge -- ee
    val onlyExp = ee -- ge
    println(s"edges: got=${ge.size} expected=${ee.size} onlyGot=${onlyGot.size} onlyExp=${onlyExp.size}")
    println("--- only in our output ---")
    onlyGot.toSeq.sortBy(_._1).foreach { case (a, b) => println(s"  ($a)-($b)") }
    println("--- only in expected ---")
    onlyExp.toSeq.sortBy(_._1).foreach { case (a, b) => println(s"  ($a)-($b)") }

    // Also diff the raw triangulations: our delaunay triangles vs nothing to
    // compare against, but print triangles touching the flipped edges.
    val segs = MakeValid.destructure(None, input)
    val tris = MakeValid.delaunayTriangles(segs)
    val flipped = (onlyGot ++ onlyExp).flatMap(e => Seq(e._1, e._2)).toSet
    println("--- our delaunay triangles touching flipped vertices ---")
    tris.foreach { t =>
      val pts = Seq(t._1, t._2, t._3).map(r2)
      if (pts.count(flipped.contains) >= 2) println(s"  $t")
    }

    // For each candidate quad (diagonal in ours, anti-diagonal in expected),
    // evaluate the tolerant in-circle both ways.
    println("--- predicate check on flipped diagonals ---")
    for ((a, b) <- onlyGot) {
      // find the two triangles sharing edge (a,b) in OUR triangulation
      val sharing = tris.filter { t =>
        val pts = Set(r2(t._1), r2(t._2), r2(t._3))
        pts.contains(a) && pts.contains(b)
      }
      if (sharing.size == 2) {
        val c = Seq(sharing(0)._1, sharing(0)._2, sharing(0)._3).find(p => r2(p) != a && r2(p) != b).get
        val d = Seq(sharing(1)._1, sharing(1)._2, sharing(1)._3).find(p => r2(p) != a && r2(p) != b).get
        println(s"quad: a=$a b=$b c=$c d=$d")
        def incircle(p1: Pt, p2: Pt, p3: Pt, x: Pt): String =
          Subdivision.circleFromPoints(p1, p2, p3) match {
            case Some(crl) =>
              val v1 = crl._1 - x._1; val v2 = crl._2 - x._2
              val dd = math.sqrt(v1 * v1 + v2 * v2)
              s"r=${crl._3} d=$dd contains=${Subdivision.circleContainsPoint(crl, x)} margin=${crl._3 - dd}"
            case None => "colinear"
          }
        println(s"  incircle(abc) contains d: ${incircle(a, b, c, d)}")
        println(s"  incircle(abd) contains c: ${incircle(a, b, d, c)}")
        println(s"  incircle(acd) contains b: ${incircle(a, c, d, b)}")
        println(s"  incircle(bcd) contains a: ${incircle(b, c, d, a)}")
        println(s"  colinear3(abc)=${Winding.threePointsAreColinear(a, b, c)} (abd)=${Winding.threePointsAreColinear(a, b, d)} (acd)=${Winding.threePointsAreColinear(a, c, d)} (bcd)=${Winding.threePointsAreColinear(b, c, d)}")
      } else println(s"edge ($a)-($b): ${sharing.size} triangles share it")
    }
  }
}
