package graft.core

import graft.core.Geom._

/** Allocation-free scratch hash structures for the per-row geometry
  * kernels (round-3 DRAM-wall fix — see VERDICT r2 "what's wrong" #1).
  *
  * `mutable.HashSet[Pt]` / `HashMap[Pt, Int]` box BOTH doubles of the
  * specialized tuple on every hashCode/equals call (generic Tuple2
  * accessors), and allocate a Node per entry — the JFR profile showed
  * 7+ GB/min of Double + HashSet$Node garbage from the makevalid hot
  * loops. These open-addressing tables key on `doubleToLongBits` pairs,
  * which reproduces Tuple2-of-Double equality EXACTLY: Double.equals is
  * bits equality (−0.0 ≠ +0.0, NaN == NaN after canonicalization) — the
  * same semantics the round-2 code relied on.
  *
  * Each hot call site owns a ThreadLocal instance (sites never self-nest,
  * so reuse is safe; distinct sites nesting is fine because each has its
  * own instance). `clear()` keeps capacity — steady state allocates zero.
  */
object Scratch {

  /** key bits. ZERO IS CANONICALIZED: Scala's boxed == (and a Go map key)
    * treat −0.0 and +0.0 as the same key, so both map to +0.0's bits here.
    * NaN keys: doubleToLongBits canonicalizes, making NaN self-equal where
    * Scala/Go say never-equal — irrelevant in practice because a NaN
    * coordinate has already degenerated the geometry upstream in both
    * engines, and documented here for honesty.
    */
  @inline private def bits(d: Double): Long =
    if (d == 0.0) 0L else java.lang.Double.doubleToLongBits(d)

  @inline private def mix(x: Long, y: Long): Int = {
    var h = x * 0x9E3779B97F4A7C15L + y
    h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
    h.toInt
  }

  /** growable packed segment buffer — four primitive arrays instead of a
    * Seg object per segment (the destructure→sweep→triangulate path is all
    * coordinate reads; the per-row Seg population was ~30% of remaining
    * kernel allocation).
    */
  final class SegBuf {
    var x1 = new Array[Double](128)
    var y1 = new Array[Double](128)
    var x2 = new Array[Double](128)
    var y2 = new Array[Double](128)
    var n = 0

    def clear(): Unit = n = 0

    def add(ax: Double, ay: Double, bx: Double, by: Double): Unit = {
      if (n == x1.length) {
        val c = n * 2
        x1 = java.util.Arrays.copyOf(x1, c); y1 = java.util.Arrays.copyOf(y1, c)
        x2 = java.util.Arrays.copyOf(x2, c); y2 = java.util.Arrays.copyOf(y2, c)
      }
      x1(n) = ax; y1(n) = ay; x2(n) = bx; y2(n) = by
      n += 1
    }
  }

  /** open-addressing set of points (bit-equality). */
  final class PtSet(initialCap: Int = 64) {
    private var cap = Integer.highestOneBit(math.max(16, initialCap) * 2 - 1) << 1
    private var xs = new Array[Long](cap)
    private var ys = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0

    def size: Int = n

    def clear(): Unit =
      if (n > 0) { java.util.Arrays.fill(used, false); n = 0 }

    private def grow(): Unit = {
      val oxs = xs; val oys = ys; val ou = used
      cap <<= 1
      xs = new Array[Long](cap); ys = new Array[Long](cap); used = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < ou.length) {
        if (ou(i)) addBits(oxs(i), oys(i))
        i += 1
      }
    }

    private def addBits(xb: Long, yb: Long): Boolean = {
      var i = mix(xb, yb) & (cap - 1)
      while (used(i)) {
        if (xs(i) == xb && ys(i) == yb) return false
        i = (i + 1) & (cap - 1)
      }
      used(i) = true; xs(i) = xb; ys(i) = yb; n += 1
      if (n * 2 > cap) grow()
      true
    }

    /** add; returns true when the point was NOT already present. */
    def add(p: Pt): Boolean = addBits(bits(p._1), bits(p._2))

    /** tuple-free add. */
    def addXY(x: Double, y: Double): Boolean = addBits(bits(x), bits(y))

    def contains(p: Pt): Boolean = {
      val xb = bits(p._1); val yb = bits(p._2)
      var i = mix(xb, yb) & (cap - 1)
      while (used(i)) {
        if (xs(i) == xb && ys(i) == yb) return true
        i = (i + 1) & (cap - 1)
      }
      false
    }
  }

  /** open-addressing point → int map (bit-equality keys). */
  final class PtIntMap(initialCap: Int = 64) {
    private var cap = Integer.highestOneBit(math.max(16, initialCap) * 2 - 1) << 1
    private var xs = new Array[Long](cap)
    private var ys = new Array[Long](cap)
    private var vs = new Array[Int](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0

    def clear(): Unit =
      if (n > 0) { java.util.Arrays.fill(used, false); n = 0 }

    private def grow(): Unit = {
      val oxs = xs; val oys = ys; val ovs = vs; val ou = used
      cap <<= 1
      xs = new Array[Long](cap); ys = new Array[Long](cap)
      vs = new Array[Int](cap); used = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < ou.length) {
        if (ou(i)) putBits(oxs(i), oys(i), ovs(i))
        i += 1
      }
    }

    private def putBits(xb: Long, yb: Long, v: Int): Unit = {
      var i = mix(xb, yb) & (cap - 1)
      while (used(i)) {
        if (xs(i) == xb && ys(i) == yb) { vs(i) = v; return }
        i = (i + 1) & (cap - 1)
      }
      used(i) = true; xs(i) = xb; ys(i) = yb; vs(i) = v; n += 1
      if (n * 2 > cap) grow()
    }

    def put(p: Pt, v: Int): Unit = putBits(bits(p._1), bits(p._2), v)

    /** value for p, or `missing` when absent. */
    def getOrElse(p: Pt, missing: Int): Int = {
      val xb = bits(p._1); val yb = bits(p._2)
      var i = mix(xb, yb) & (cap - 1)
      while (used(i)) {
        if (xs(i) == xb && ys(i) == yb) return vs(i)
        i = (i + 1) & (cap - 1)
      }
      missing
    }

    /** Remove key (open addressing: re-insert the displaced cluster).
      * Returns true when present.
      */
    def remove(p: Pt): Boolean = {
      val xb = bits(p._1); val yb = bits(p._2)
      var i = mix(xb, yb) & (cap - 1)
      while (used(i)) {
        if (xs(i) == xb && ys(i) == yb) {
          used(i) = false; n -= 1
          // rehash the cluster after the hole
          var j = (i + 1) & (cap - 1)
          while (used(j)) {
            val kx = xs(j); val ky = ys(j); val kv = vs(j)
            used(j) = false; n -= 1
            putBits(kx, ky, kv)
            j = (j + 1) & (cap - 1)
          }
          return true
        }
        i = (i + 1) & (cap - 1)
      }
      false
    }
  }
}
