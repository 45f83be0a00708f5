package graft.engine

/** IEEE 754 half-precision (GDAL's GDT_Float16 pixel type,
  * /root/reference/port/cpl_float.h GDALFloat16 / CPLHalfToFloat,
  * CPLFloatToHalf): decode/encode between 16-bit halves and doubles, the
  * payload codec for Float16 raster bands stored as binary columns.
  * Round-to-nearest-even on encode, like the reference (and hardware). */
object Half {

  /** 16-bit half (as Int, low 16 bits) → Double. Exact. */
  def toDouble(h: Int): Double = {
    val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    val mag =
      if (exp == 0) frac * 5.960464477539063e-8 // subnormal: frac · 2⁻²⁴
      else if (exp == 31) {
        if (frac == 0) Double.PositiveInfinity else Double.NaN
      } else (1.0 + frac / 1024.0) * math.pow(2.0, exp - 15)
    if (java.lang.Double.isNaN(mag)) Double.NaN else sign * mag
  }

  /** Double → 16-bit half, round-to-nearest-even; overflow → ±Inf. */
  def fromDouble(d: Double): Int = {
    if (java.lang.Double.isNaN(d)) return 0x7e00 // canonical qNaN
    val sign = if (d < 0.0 || (d == 0.0 && 1.0 / d < 0)) 0x8000 else 0
    val a = math.abs(d)
    if (a == 0.0) return sign
    if (java.lang.Double.isInfinite(d) || a >= 65520.0) return sign | 0x7c00
    // scale into the half grid via the float intermediate trick: multiply
    // into [2^-24 ulp] integer space and round-half-even
    val bits = java.lang.Double.doubleToLongBits(a)
    val exp = ((bits >> 52) & 0x7ff).toInt - 1023
    if (exp < -26) return sign // < ¼ subnormal ulp: underflows to zero
    if (exp >= -14) {
      // normal half range: mantissa to 10 bits, round half even
      val mant = (bits & 0xfffffffffffffL) | (1L << 52)
      val shift = 42 // keep 10 mantissa bits + implicit 1
      val keep = mant >> shift
      val rem = mant & ((1L << shift) - 1)
      val halfUlp = 1L << (shift - 1)
      var m = keep
      if (rem > halfUlp || (rem == halfUlp && (keep & 1) == 1)) m += 1
      var e = exp + 15
      if (m == (1L << 11)) { m >>= 1; e += 1 } // mantissa rounds up to next exp
      if (e >= 31) return sign | 0x7c00
      (sign | (e << 10) | (m & 0x3ff).toInt)
    } else {
      // subnormal half: value = n · 2⁻²⁴ with n in [0, 1024), round half even
      val scaled = a * 16777216.0 // a · 2²⁴ — exact for doubles this small
      val fl = math.floor(scaled)
      val rem = scaled - fl
      var n = fl.toLong
      if (rem > 0.5 || (rem == 0.5 && (n & 1) == 1)) n += 1
      if (n >= 1024) sign | (1 << 10) // rounds up into the normal range
      else (sign | n.toInt)
    }
  }

  /** little-endian packed halves → doubles (a Float16 band payload). */
  def decode(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = toDouble(((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff))
      i += 1
    }
    out
  }

  def encode(vals: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](vals.length * 2)
    var i = 0
    while (i < vals.length) {
      val h = fromDouble(vals(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
