package graft.core
import graft.core.Geom._
object Dbg {
  def main(args: Array[String]): Unit = {
    for (pid <- 0L to 3L) {
      val z = 9
      val tx = (pid * 7 % 512).toInt
      val ty = (pid % 312 + 100).toInt
      val ext = Slippy.tileExtent3857(z, tx, ty)
      val xs = ext.maxx - ext.minx; val ys = ext.maxy - ext.miny
      val webs = xs / 4096.0
      val gl = ext.minx + ((pid % 8).toDouble * 0.05 + 0.1) * xs
      val gt = ext.miny + ((pid % 9).toDouble * 0.05 + 0.1) * ys
      val ga = gl + ((pid % 4).toDouble * 0.05 + 0.25) * xs
      val gb = gt + ((pid % 6).toDouble * 0.04 + 0.25) * ys
      val g =
        if (pid % 2 == 0) GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gt), (ga, gb), (gl, gb))))
        else GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gb), (ga, gt), (gl, gb))))
      val simp = Simplify.geometry(g, webs)
      println(s"pid=$pid ext=$ext simp=${Wkt.encode(simp).take(80)}")
      val clip = Extent(ext.minx - webs, ext.miny - webs, ext.maxx + webs, ext.maxy + webs)
      val mv = MakeValid.geometry(simp, Some(clip))
      println(s"pid=$pid makevalid=${mv.map(Wkt.encode(_).take(80))}")
    }
  }
}
