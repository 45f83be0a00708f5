package graft.cell

import graft.geom.Envelope

/** Hilbert d2xy encoding for spatial sort/clustering.
  * Semantics of the reference's GDALHilbertCode (/root/reference/alg/hilbert.cpp:19-90),
  * which itself derives from the public-domain hilbert_curves bit-twiddling
  * method: 16-bit (x, y) → 32-bit Hilbert index; coordinates are scaled into
  * the domain envelope with round(MAX * (v - min) / extent), MAX = 2^16 - 2
  * (the top value is reserved for empty/null geometries).
  */
object Hilbert {

  final val HilbertMax: Int = (1 << 16) - 2

  /** 16-bit x,y → Hilbert curve index (public-domain bit-parallel method). */
  def code(xIn: Int, yIn: Int): Long = {
    val x = xIn & 0xffff
    val y = yIn & 0xffff

    var a = x ^ y
    var b = 0xffff ^ a
    var c = 0xffff ^ (x | y)
    var d = x & (y ^ 0xffff)

    var aa = a | (b >>> 1)
    var bb = (a >>> 1) ^ a
    var cc = ((c >>> 1) ^ (b & (d >>> 1))) ^ c
    var dd = ((a & (c >>> 1)) ^ (d >>> 1)) ^ d

    a = aa; b = bb; c = cc; d = dd
    aa = (a & (a >>> 2)) ^ (b & (b >>> 2))
    bb = (a & (b >>> 2)) ^ (b & ((a ^ b) >>> 2))
    cc = c ^ ((a & (c >>> 2)) ^ (b & (d >>> 2)))
    dd = d ^ ((b & (c >>> 2)) ^ ((a ^ b) & (d >>> 2)))

    a = aa; b = bb; c = cc; d = dd
    aa = (a & (a >>> 4)) ^ (b & (b >>> 4))
    bb = (a & (b >>> 4)) ^ (b & ((a ^ b) >>> 4))
    cc = c ^ ((a & (c >>> 4)) ^ (b & (d >>> 4)))
    dd = d ^ ((b & (c >>> 4)) ^ ((a ^ b) & (d >>> 4)))

    a = aa; b = bb; c = cc; d = dd
    cc = c ^ ((a & (c >>> 8)) ^ (b & (d >>> 8)))
    dd = d ^ ((b & (c >>> 8)) ^ ((a ^ b) & (d >>> 8)))

    a = cc ^ (cc >>> 1)
    b = dd ^ (dd >>> 1)

    var i0 = x ^ y
    var i1 = b | (0xffff ^ (i0 | a))

    i0 = (i0 | (i0 << 8)) & 0x00ff00ff
    i0 = (i0 | (i0 << 4)) & 0x0f0f0f0f
    i0 = (i0 | (i0 << 2)) & 0x33333333
    i0 = (i0 | (i0 << 1)) & 0x55555555

    i1 = (i1 | (i1 << 8)) & 0x00ff00ff
    i1 = (i1 | (i1 << 4)) & 0x0f0f0f0f
    i1 = (i1 | (i1 << 2)) & 0x33333333
    i1 = (i1 | (i1 << 1)) & 0x55555555

    ((i1.toLong << 1) | i0.toLong) & 0xffffffffL
  }

  /** Scale a point into a domain envelope and encode (hilbert.cpp:80-92). */
  def code(domain: Envelope, x: Double, y: Double): Long = {
    val xi =
      if (domain.width != 0.0) math.round(HilbertMax * (x - domain.minX) / domain.width).toInt
      else 0
    val yi =
      if (domain.height != 0.0) math.round(HilbertMax * (y - domain.minY) / domain.height).toInt
      else 0
    code(xi, yi)
  }
}
