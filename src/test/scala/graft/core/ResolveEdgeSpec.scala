package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom._
import graft.core.QuadEdge.Edge

/** Ports /root/reference/planar/triangulate/delaunay/quadedge/
  * resolve_edge_test.go (y-up cases; the constrained path runs y-up).
  * Expected edge identity is exact (Go compares pointers).
  */
class ResolveEdgeSpec extends AnyFunSuite {

  /** test_helpers.go:8-23 BuildEdgeGraphAroundPoint. */
  private def buildAround(o: Pt, dests: Pt*): Edge = {
    val edges = dests.map(d => QuadEdge.newWithEndPoints(o, d)).toIndexedSeq
    if (edges.length > 1)
      (1 until edges.length).foreach(i => QuadEdge.splice(edges(i - 1), edges(i)))
    edges(0)
  }

  private def resolve(e: Edge, dest: Pt): (Edge, Option[String]) =
    QuadEdge.resolveEdge(yPositiveDown = false, e, dest) match {
      case Right(r)         => (r, None)
      case Left((r, err))   => (r, Some(err))
    }

  test("y-up resolve ccw cases (POINTS(0 0, 5 0, 0 -5))") {
    val edge = buildAround((0.0, 0.0), (5.0, 0.0), (0.0, -5.0))
    val edge05 = edge.findONextDest((0.0, -5.0))
    val edge50 = edge.findONextDest((5.0, 0.0))
    val e = edge05
    // (dest, expected edge, expect colinear err)
    val cases = Seq[(Pt, Edge, Boolean)](
      ((-3.0, -3.0), edge50, false), // 1
      ((-3.0, 3.0), edge50, false),  // 2
      ((-3.0, 0.0), edge50, false),  // 3
      ((3.0, -3.0), edge05, false),  // 4
      ((3.0, 3.0), edge50, false),   // 5
      ((3.0, 0.0), edge50, true),    // 6
      ((0.0, -3.0), edge05, true),   // 7
      ((0.0, 3.0), edge50, false))   // 8
    cases.zipWithIndex.foreach { case ((dest, exp, expErr), i) =>
      val (got, err) = resolve(e, dest)
      assert(got eq exp, s"case ${i + 1}: dest $dest expected ${exp.asSeg}, got ${got.asSeg}")
      assert(err.contains("colinear") == expErr, s"case ${i + 1}: err $err")
    }
    // case 0: dest == origin → invalid end vertex error
    assert(resolve(e, (0.0, 0.0))._2.isDefined)
  }

  test("y-up resolve cw cases") {
    val edge = buildAround((0.0, 0.0), (5.0, 0.0), (0.0, -5.0))
    val edge05 = edge.findONextDest((0.0, -5.0))
    val edge50 = edge.findONextDest((5.0, 0.0))
    val e = edge50
    val cases = Seq[(Pt, Edge, Boolean)](
      ((3.0, -3.0), edge05, false),
      ((0.0, -3.0), edge05, true),
      ((3.0, 0.0), edge50, true))
    cases.zipWithIndex.foreach { case ((dest, exp, expErr), i) =>
      val (got, err) = resolve(e, dest)
      assert(got eq exp, s"cw case $i: dest $dest expected ${exp.asSeg}, got ${got.asSeg}")
      assert(err.contains("colinear") == expErr, s"cw case $i: err $err")
    }
  }

  test("y-up resolve zab 1 (colinear ring POINTS(0 0, 5 0, -5 0))") {
    val edge = buildAround((0.0, 0.0), (5.0, 0.0), (-5.0, 0.0))
    val edge_50 = edge.findONextDest((-5.0, 0.0))
    val edge50 = edge.findONextDest((5.0, 0.0))
    val e = edge50
    val cases = Seq[(Pt, Edge, Boolean)](
      ((0.0, -3.0), edge_50, false),
      ((0.0, 3.0), edge50, false),
      ((3.0, 0.0), edge50, true),
      ((-3.0, 0.0), edge_50, true))
    cases.zipWithIndex.foreach { case ((dest, exp, expErr), i) =>
      val (got, err) = resolve(e, dest)
      assert(got eq exp, s"zab1 case $i: dest $dest expected ${exp.asSeg}, got ${got.asSeg}")
      assert(err.contains("colinear") == expErr, s"zab1 case $i: err $err")
    }
  }

  test("y-up resolve zab 2 (single edge)") {
    val edge = buildAround((0.0, 0.0), (5.0, 0.0))
    val edge50 = edge.findONextDest((5.0, 0.0))
    val e = edge50
    val cases = Seq[(Pt, Edge, Boolean)](
      ((0.0, -3.0), edge50, false),
      ((0.0, 3.0), edge50, false),
      ((3.0, 0.0), edge50, true),
      ((-3.0, 0.0), edge50, true))
    cases.zipWithIndex.foreach { case ((dest, exp, expErr), i) =>
      val (got, err) = resolve(e, dest)
      assert(got eq exp, s"zab2 case $i: dest $dest expected ${exp.asSeg}, got ${got.asSeg}")
      assert(err.contains("colinear") == expErr, s"zab2 case $i: err $err")
    }
  }
}
