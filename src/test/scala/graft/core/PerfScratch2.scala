package graft.core

import graft.core.Geom._

/** multi-threaded kernel scaling probe (no Spark): the q33 chain on the
  * same geometry at T=1, 8, 32 threads — isolates JVM/DRAM contention
  * from Spark scheduling. Not a test.
  */
object PerfScratch2 {

  def chain(pid: Long): Int = {
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
      if (pid % 2 == 0)
        GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gt), (ga, gb), (gl, gb))))
      else
        GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gb), (ga, gt), (gl, gb))))
    val simp = Simplify.geometry(g, webs)
    val clip = Extent(ext.minx - webs, ext.miny - webs, ext.maxx + webs, ext.maxy + webs)
    MakeValid.geometry(simp, Some(clip)) match {
      case Some(fixed) =>
        val prep = Mvt.prepareGeo(fixed, ext, 4096.0)
        val (cmds, gt2) = Mvt.encodeGeometry(prep)
        cmds.length + gt2
      case None => 0
    }
  }

  /** the chain as the Spark kernel actually runs it: WKB bytes in
    * (decode per row), command stream out — isolates the codec share.
    */
  def chainWkb(pid: Long, wkb: Array[Byte]): Int = {
    val z = 9
    val tx = (pid * 7 % 512).toInt
    val ty = (pid % 312 + 100).toInt
    val ext = Slippy.tileExtent3857(z, tx, ty)
    val webs = (ext.maxx - ext.minx) / 4096.0
    val g = Wkb.decode(wkb)
    val simp = Simplify.geometry(g, webs)
    val clip = Extent(ext.minx - webs, ext.miny - webs, ext.maxx + webs, ext.maxy + webs)
    MakeValid.geometry(simp, Some(clip)) match {
      case Some(fixed) =>
        val prep = Mvt.prepareGeo(fixed, ext)
        val (cmds, gt2) = Mvt.encodeGeometry(prep)
        cmds.length + gt2
      case None => 0
    }
  }

  def runThreads(threads: Int, rowsPerThread: Long): Double = {
    val ts = (0 until threads).map { t =>
      new Thread(new Runnable {
        def run(): Unit = {
          var i = 0L; var acc = 0L
          while (i < rowsPerThread) { acc += chain(t * rowsPerThread + i); i += 1 }
          if (acc == 42) println("") // defeat DCE
        }
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val total = if (args.nonEmpty) args(0).toLong else 600000L
    val reps = if (args.length > 1) args(1).toInt else 1
    // deep JIT warm: 60k rows single-threaded
    var i = 0L; var acc = 0L
    while (i < 60000) { acc += chain(i); i += 1 }
    println(s"warm acc=$acc")
    // drift-free progress metric: exact allocated bytes per row
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val a0 = tmx.getThreadAllocatedBytes(tid)
    i = 0
    while (i < 60000) { acc += chain(i); i += 1 }
    val a1 = tmx.getThreadAllocatedBytes(tid)
    println(f"alloc/row = ${(a1 - a0) / 60000.0}%.0f bytes")
    // the WKB-in variant (what q33_pipeline_op runs per row)
    val wkbs = Array.tabulate(4096) { k =>
      val pid = k.toLong
      val tx = (pid * 7 % 512).toInt; val ty = (pid % 312 + 100).toInt
      val ext = Slippy.tileExtent3857(9, tx, ty)
      val xs = ext.maxx - ext.minx; val ys = ext.maxy - ext.miny
      val gl = ext.minx + ((pid % 8).toDouble * 0.05 + 0.1) * xs
      val gt = ext.miny + ((pid % 9).toDouble * 0.05 + 0.1) * ys
      val ga = gl + ((pid % 4).toDouble * 0.05 + 0.25) * xs
      val gb = gt + ((pid % 6).toDouble * 0.04 + 0.25) * ys
      val g =
        if (pid % 2 == 0) GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gt), (ga, gb), (gl, gb))))
        else GPolygon(Vector(Vector[Pt]((gl, gt), (ga, gb), (ga, gt), (gl, gb))))
      Wkb.encode(g)
    }
    i = 0
    while (i < 60000) { acc += chainWkb(i, wkbs((i % 4096).toInt)); i += 1 }
    val a2 = tmx.getThreadAllocatedBytes(tid)
    val t0 = System.nanoTime()
    i = 0
    while (i < 60000) { acc += chainWkb(i, wkbs((i % 4096).toInt)); i += 1 }
    val a3 = tmx.getThreadAllocatedBytes(tid)
    val wkbUs = (System.nanoTime() - t0) / 1e3 / 60000.0
    println(f"wkb-chain alloc/row = ${(a3 - a2) / 60000.0}%.0f bytes, ${wkbUs}%.1f us/row")
    for (_ <- 1 to reps; t <- Seq(1, 8, 32)) {
      val rows = total / t
      val sec = runThreads(t, rows)
      val usPerRow = sec * 1e6 * t / total.toDouble
      println(f"threads=$t%2d  total=${sec}%6.2f s   per-row(cpu)=$usPerRow%7.1f us  rows/s=${total / sec}%.0f")
    }
  }
}
