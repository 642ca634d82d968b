package graft.core
import graft.core.Geom._
object DebugC2 {
  def main(args: Array[String]): Unit = {
    val text = scala.io.Source.fromFile("src/test/resources/constrained/find_intersects_test_02.lines").mkString
    val GMultiLineString(ls) = Wkt.decode(text): @unchecked
    val lines = ls.map(l => Seg(l(0), l(1)))
    val pts = lines.flatMap(l => Seq(l.p1, l.p2))
    val sd = Subdivision.forPoints(pts).get
    // NO constraints inserted: pure Delaunay (constraint 0 'already present' etc.)
    val start = (4081.0, 310.0); val end = (4083.0, 312.0)
    // find edges as the test does
    var startingEdge: QuadEdge.Edge = null; var endingEdge: QuadEdge.Edge = null
    sd.walkAllEdges { ee =>
      if (startingEdge == null) {
        if (Cmp.HiCmp.pointEqual(start, ee.orig)) startingEdge = ee
        else if (Cmp.HiCmp.pointEqual(start, ee.dest)) startingEdge = ee.sym
      }
      if (endingEdge == null) {
        if (Cmp.HiCmp.pointEqual(end, ee.orig)) endingEdge = ee
        else if (Cmp.HiCmp.pointEqual(end, ee.dest)) endingEdge = ee.sym
      }
      true
    }
    println("startingEdge=" + startingEdge.asSeg + " endingEdge=" + endingEdge.asSeg)
    val line = Seg(startingEdge.orig, endingEdge.orig)
    val se2 = QuadEdge.resolveEdge(false, startingEdge, endingEdge.orig).fold(_._1, identity)
    val ee2 = QuadEdge.resolveEdge(false, endingEdge, startingEdge.orig).fold(_._1, identity)
    println("se2=" + se2.asSeg + " ee2=" + ee2.asSeg)
    println("se2.dest==end? " + Cmp.HiCmp.pointEqual(se2.dest, end))
    val sharedSE = se2.oNext.sym.oNext
    val sharedEE = ee2.oNext.sym.oNext
    println("sharedSE=" + sharedSE.asSeg + " sharedEE=" + sharedEE.asSeg)
    var w = sharedSE
    var cont = true
    for (i <- 1 to 21 if cont) {
      val hit = Planar.segmentIntersect(line, w.asSeg)._2
      val nhit = Planar.segmentIntersect(line, w.oNext.asSeg)._2
      println(s"step $i: w=${w.asSeg} hit=$hit onext=${w.oNext.asSeg} onextHit=$nhit atEE=${w eq sharedEE}")
      if (w eq sharedEE) cont = false
      else if (nhit) w = w.oNext
      else w = w.oNext.sym.oNext
    }
  }
}
