package graft.core

import graft.core.Geom._

/** scratch micro-profiler for the q33 kernel chain (not a test). */
object PerfScratch {
  def time[A](label: String, reps: Int)(f: => A): Unit = {
    var i = 0
    while (i < 3) { f; i += 1 } // warm
    val t0 = System.nanoTime()
    i = 0
    while (i < reps) { f; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e6 / reps
    println(f"$label%-28s $dt%8.3f ms/op")
  }

  def main(args: Array[String]): Unit = {
    // representative q33 tile: z9, tx=350, ty=200
    val ext = Slippy.tileExtent3857(9, 350, 200)
    val (minx, miny, maxx, maxy) = (ext.minx, ext.miny, ext.maxx, ext.maxy)
    val xs = maxx - minx; val ys = maxy - miny
    val webs = xs / 4096.0
    val gl = minx + 0.2 * xs; val gt = miny + 0.3 * ys
    val ga = gl + 0.35 * xs; val gb = gt + 0.33 * ys
    val box = GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gt), (ga, gb), (gl, gb), (gl, gt))))
    val bow = GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gb), (ga, gt), (gl, gb), (gl, gt))))
    val clip = Geom.Extent(minx - webs, miny - webs, maxx + webs, maxy + webs)

    time("simplify(box)", 2000) { Simplify.geometry(box, webs) }
    time("makevalid(box)", 200) { MakeValid.geometry(box, Some(clip)) }
    time("makevalid(bow)", 200) { MakeValid.geometry(bow, Some(clip)) }
    val fixedBox = MakeValid.geometry(box, Some(clip)).get
    val fixedBow = MakeValid.geometry(bow, Some(clip)).get
    time("prepare+mvt(box)", 2000) {
      val p = Mvt.prepareGeo(fixedBox, Geom.Extent(minx, miny, maxx, maxy), 4096.0)
      Mvt.encodeGeometry(p)
    }
    time("prepare+mvt(bow)", 2000) {
      val p = Mvt.prepareGeo(fixedBow, Geom.Extent(minx, miny, maxx, maxy), 4096.0)
      Mvt.encodeGeometry(p)
    }
  }
}
