package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal

/** aHash perceptual-fingerprint properties through the REAL ImageIO
  * decode path (the m11 kernel): block-mean structure is what the hash
  * sees, so sub-threshold pixel noise must not move it, one inverted
  * block must flip exactly that block's bit, and non-multiple-of-8
  * dimensions must still partition every pixel into the 8×8 grid. */
class AHashSpec extends AnyFunSuite {

  private def hashOf(w: Int, h: Int)(f: (Int, Int) => Int): (Long, Long) = {
    val p = Multimodal.aHashParts(Multimodal.grayPng(w, h)(f))
    (p(0), p(1))
  }

  private def checker(x: Int, y: Int): Int =
    if (((x / 4) + (y / 4)) % 2 == 0) 200 else 40

  test("invariant to sub-threshold noise (near-dup robustness)") {
    val a = hashOf(32, 32)(checker)
    val b = hashOf(32, 32)((x, y) => checker(x, y) + (x * 7 + y * 11) % 7)
    assert(a == b)
  }

  test("one inverted block flips exactly one bit") {
    val a = hashOf(32, 32)(checker)
    val b = hashOf(32, 32) { (x, y) =>
      if (x / 4 == 2 && y / 4 == 1) 240 - checker(x, y) else checker(x, y)
    }
    val hd = java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(hd == 1, s"hamming $hd")
    // and it is block (bx=2, by=1) → bit 1*8+2 = 10 (in the lo half)
    assert(((a._1 ^ b._1) >>> 10) == 1L && (a._2 ^ b._2) == 0L)
  }

  test("checkerboard on the block grid: alternating bits, halves equal") {
    val (lo, hi) = hashOf(32, 32)(checker)
    // blocks with (bx+by) even are bright → bit pattern 0b01010101 rows
    // alternating with 0b10101010 rows, identical in both halves
    val row0 = 0x55L; val row1 = 0xaaL
    val expectLo = row0 | (row1 << 8) | (row0 << 16) | (row1 << 24)
    assert(lo == expectLo && hi == expectLo, f"lo=$lo%x hi=$hi%x")
  }

  test("non-multiple-of-8 dims partition all pixels (hash well-defined)") {
    val a = hashOf(33, 29)(checker)
    val b = hashOf(33, 29)((x, y) => checker(x, y) + (x + y) % 3)
    assert(a == b) // noise margin still holds with ragged blocks
  }

  test("undecodable payload refuses loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.aHashParts(Array[Byte](1, 2, 3, 4))
    }
  }
}
