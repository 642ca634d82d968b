package graft.core

import graft.core.Geom._

/** Minimal binary floating point with round-to-nearest-even at a fixed bit
  * precision — the subset of Go's math/big.Float the reference uses for
  * LineIntersectBigFloat (planar/line_intersect.go:74-135, precision 110)
  * and Line.ContainsPointBigFloat (line.go:52-81, precision 20).
  *
  * Value = mantissa · 2^exp with |mantissa| ≤ prec bits after every op,
  * exactly like big.Float's SetPrec/Sub/Mul/Quo rounding model.
  */
final class BigFloat private (val m: BigInt, val e: Int) {

  def isZero: Boolean = m.signum == 0

  def unary_- : BigFloat = new BigFloat(-m, e)

  def sub(o: BigFloat, prec: Int): BigFloat = {
    if (isZero) return BigFloat.round(-o.m, o.e, prec)
    if (o.isZero) return BigFloat.round(m, e, prec)
    val ce = math.min(e, o.e)
    BigFloat.round((m << (e - ce)) - (o.m << (o.e - ce)), ce, prec)
  }

  def mul(o: BigFloat, prec: Int): BigFloat =
    BigFloat.round(m * o.m, e + o.e, prec)

  /** Correctly rounded quotient at `prec` bits (guard + sticky). */
  def quo(o: BigFloat, prec: Int): BigFloat = {
    require(!o.isZero, "division by zero")
    if (isZero) return BigFloat.Zero
    val s = prec + 2 + math.max(0, o.m.abs.bitLength - m.abs.bitLength + 1)
    val num = m.abs << s
    val den = o.m.abs
    val (q, r) = num /% den
    val sign = m.signum * o.m.signum
    // append a sticky bit so half-way cases with a nonzero remainder
    // round away instead of to even
    val q2 = (q << 1) | (if (r.signum != 0) BigInt(1) else BigInt(0))
    BigFloat.round(BigInt(sign) * q2, e - o.e - s - 1, prec)
  }

  def cmp(o: BigFloat): Int = {
    val sc = Integer.compare(m.signum, o.m.signum)
    if (sc != 0 || m.signum == 0) return sc
    val ce = math.min(e, o.e)
    (m << (e - ce)).compare(o.m << (o.e - ce))
  }

  def setPrec(prec: Int): BigFloat = BigFloat.round(m, e, prec)

  def toDouble: Double = {
    if (isZero) return 0.0
    val r = BigFloat.round(m, e, 53)
    // mantissa ≤ 53 bits is exact in a double; scalb applies the exponent
    math.scalb(r.m.toDouble, r.e)
  }

  override def toString: String = s"${toDouble}~(m=$m,e=$e)"
  override def equals(o: Any): Boolean = o match {
    case b: BigFloat => cmp(b) == 0
    case _           => false
  }
  override def hashCode: Int = toDouble.hashCode
}

object BigFloat {

  val Zero = new BigFloat(BigInt(0), 0)

  /** Round mantissa·2^exp to `prec` bits, half to even (big.Float mode). */
  private[core] def round(m0: BigInt, e0: Int, prec: Int): BigFloat = {
    if (m0.signum == 0) return Zero
    val a = m0.abs
    val bl = a.bitLength
    if (bl <= prec) return new BigFloat(m0, e0)
    val shift = bl - prec
    var q = a >> shift
    val rem = a - (q << shift)
    val half = BigInt(1) << (shift - 1)
    val c = rem.compare(half)
    if (c > 0 || (c == 0 && q.testBit(0))) q += 1
    var e = e0 + shift
    if (q.bitLength > prec) { q >>= 1; e += 1 } // carry out of the top bit
    new BigFloat(if (m0.signum < 0) -q else q, e)
  }

  /** big.NewFloat(d).SetPrec(prec) — doubles are ≤53 bits so prec ≥ 53 is
    * exact; lower precisions round.
    */
  def ofDouble(d: Double, prec: Int): BigFloat = {
    if (d == 0.0) return Zero
    require(!d.isNaN && !d.isInfinite, "finite doubles only")
    val bits = java.lang.Double.doubleToLongBits(d)
    val expBits = ((bits >> 52) & 0x7FF).toInt
    val fracBits = bits & 0xFFFFFFFFFFFFFL
    val (mant, exp) =
      if (expBits == 0) (fracBits, -1074) // subnormal
      else (fracBits | (1L << 52), expBits - 1075)
    val sm = if (d < 0) -BigInt(mant) else BigInt(mant)
    round(sm, exp, prec)
  }
}
