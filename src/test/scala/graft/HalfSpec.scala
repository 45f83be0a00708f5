package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Half

/** IEEE 754 half codec (GDT_Float16, port/cpl_float.h). */
class HalfSpec extends AnyFunSuite {

  test("known bit patterns decode exactly") {
    assert(Half.toDouble(0x3c00) === 1.0)
    assert(Half.toDouble(0xc000) === -2.0)
    assert(Half.toDouble(0x7bff) === 65504.0)
    assert(Half.toDouble(0x0001) === math.pow(2, -24))
    assert(Half.toDouble(0x0400) === math.pow(2, -14))
    assert(Half.toDouble(0x8000) === -0.0 && 1.0 / Half.toDouble(0x8000) < 0)
    assert(Half.toDouble(0x7c00).isPosInfinity)
    assert(Half.toDouble(0xfc00).isNegInfinity)
    assert(Half.toDouble(0x7e00).isNaN)
    assert(Half.toDouble(0x3555) === (1.0 + 341.0 / 1024.0) / 4.0)
  }

  test("every finite half round-trips through encode(decode)") {
    for (h <- 0 until 0x10000) {
      val d = Half.toDouble(h)
      if (!d.isNaN && !d.isInfinite) {
        assert(Half.fromDouble(d) === h, f"0x$h%04x -> $d")
      }
    }
  }

  test("round-to-nearest-even at representable midpoints") {
    // between 1.0 (0x3c00) and 1+2^-10 (0x3c01): midpoint ties to even
    val mid = 1.0 + math.pow(2, -11)
    assert(Half.fromDouble(mid) === 0x3c00, "tie -> even mantissa")
    assert(Half.fromDouble(mid + 1e-9) === 0x3c01)
    assert(Half.fromDouble(mid - 1e-9) === 0x3c00)
    // between 0x3c01 and 0x3c02 the tie goes UP (to even 0x3c02)
    val mid2 = 1.0 + 3.0 * math.pow(2, -11)
    assert(Half.fromDouble(mid2) === 0x3c02)
    // overflow and underflow
    assert(Half.fromDouble(65520.0) === 0x7c00)
    assert(Half.fromDouble(1e-9) === 0x0000)
    assert(Half.fromDouble(math.pow(2, -25)) === 0x0000, "0.5 ulp ties to even 0")
    assert(Half.fromDouble(math.pow(2, -25) * 1.5) === 0x0001)
    assert(Half.fromDouble(3.0 * math.pow(2, -25)) === 0x0002, "1.5 ulp ties to even 2")
  }

  test("payload pack/unpack is little-endian and length-preserving") {
    val vals = Array(1.0, -2.0, 65504.0, 0.0, math.pow(2, -14))
    val bytes = Half.encode(vals)
    assert(bytes.length === 10)
    assert((bytes(0) & 0xff) === 0x00 && (bytes(1) & 0xff) === 0x3c)
    assert(Half.decode(bytes).toSeq === vals.toSeq)
  }
}
