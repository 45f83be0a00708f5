package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** Point-in-geometry predicates evaluated directly on WKB bytes — zero
  * object materialization on the hot join path. Reference analog: GDAL
  * evaluates filters straight on WKB without instantiating OGRGeometry
  * (FilterWKBGeometry, /root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:4096-4145;
  * ogr_wkb.cpp helpers, /root/reference/ogr/ogr_wkb.h:30-36).
  *
  * The numeric rules are replicated TERM-BY-TERM from GeoOps.isPointInRing /
  * isPointOnRingBoundary (themselves exact ports of ogrlinearring.cpp), so
  * results are bit-identical to the decode path. (Multi)polygon only; any
  * other top-level type falls back to decode + GeoOps dispatch.
  */
object WkbPip {

  def containsPoint(bytes: Array[Byte], px: Double, py: Double): Boolean =
    try evalDirect(bytes, px, py, grace = false)
    catch { case _: UnsupportedOperationException =>
      GeoOps.containsPoint(Wkb.read(bytes), px, py) }

  def intersectsPoint(bytes: Array[Byte], px: Double, py: Double): Boolean =
    try evalDirect(bytes, px, py, grace = true)
    catch { case _: UnsupportedOperationException =>
      GeoOps.intersectsPoint(Wkb.read(bytes), px, py) }

  private def unsupported(): Nothing = throw new UnsupportedOperationException

  /** grace=false: containsPoint (ray rule only). grace=true:
    * intersectsPoint (boundary counts; hole boundary still intersects). */
  private def evalDirect(bytes: Array[Byte], px: Double, py: Double, grace: Boolean): Boolean = {
    val buf = ByteBuffer.wrap(bytes)
    evalGeom(buf, px, py, grace)
  }

  /** Reads one geometry header; only types 3 (polygon) and 6 (multipolygon)
    * are evaluated directly. Returns nd (total dims) via the low bits. */
  private def readHeader(buf: ByteBuffer): (Int, Int) = {
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var t = buf.getInt()
    var nd = 2
    if ((t & 0x80000000) != 0) nd += 1
    if ((t & 0x40000000) != 0) nd += 1
    val hasSrid = (t & 0x20000000) != 0
    t &= 0x0fffffff
    if (t >= 3000) { nd = 4; t -= 3000 }
    else if (t >= 2000) { nd = 3; t -= 2000 }
    else if (t >= 1000) { nd = 3; t -= 1000 }
    if (hasSrid) buf.getInt()
    (t, nd)
  }

  private def evalGeom(buf: ByteBuffer, px: Double, py: Double, grace: Boolean): Boolean = {
    val (t, nd) = readHeader(buf)
    t match {
      case 3 => evalPolygon(buf, nd, px, py, grace)
      case 6 =>
        val n = buf.getInt()
        var i = 0
        var hit = false
        while (i < n) { // must consume every child to keep cursor aligned
          val r = evalGeom(buf, px, py, grace)
          hit ||= r
          i += 1
        }
        hit
      case _ => unsupported()
    }
  }

  private def evalPolygon(buf: ByteBuffer, nd: Int, px: Double, py: Double,
                          grace: Boolean): Boolean = {
    val nRings = buf.getInt()
    if (nRings == 0) { return false }
    // exterior ring
    var pos = buf.position()
    var n = buf.getInt()
    var in = ringInside(buf, n, nd, px, py)
    if (!in && grace) {
      buf.position(pos); n = buf.getInt()
      in = ringBoundary(buf, n, nd, px, py)
    }
    if (!in) {
      skipRings(buf, nRings - 1, nd)
      return false
    }
    var i = 1
    var result = true
    while (i < nRings) {
      pos = buf.position()
      n = buf.getInt()
      val insideHole = ringInside(buf, n, nd, px, py)
      if (insideHole && result) {
        if (grace) {
          buf.position(pos); val n2 = buf.getInt()
          if (!ringBoundary(buf, n2, nd, px, py)) result = false
        } else result = false
      }
      i += 1
    }
    result
  }

  private def skipRings(buf: ByteBuffer, k: Int, nd: Int): Unit = {
    var i = 0
    while (i < k) {
      val n = buf.getInt()
      buf.position(buf.position() + n * nd * 8)
      i += 1
    }
  }

  /** Single pass: envelope (pretest of GeoOps.isPointInRing) + ray
    * crossings; same terms, same strict comparisons. */
  private def ringInside(buf: ByteBuffer, n: Int, nd: Int, px: Double, py: Double): Boolean = {
    if (n < 4) {
      buf.position(buf.position() + n * nd * 8)
      return false
    }
    var x = buf.getDouble(); var y = buf.getDouble()
    var k = 2; while (k < nd) { buf.getDouble(); k += 1 }
    var minX = x; var maxX = x; var minY = y; var maxY = y
    var prevDx = x - px
    var prevDy = y - py
    var crossings = 0
    var i = 1
    while (i < n) {
      x = buf.getDouble(); y = buf.getDouble()
      k = 2; while (k < nd) { buf.getDouble(); k += 1 }
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
      val x1 = x - px
      val y1 = y - py
      val x2 = prevDx
      val y2 = prevDy
      if (((y1 > 0) && (y2 <= 0)) || ((y2 > 0) && (y1 <= 0))) {
        val inter = (x1 * y2 - x2 * y1) / (y2 - y1)
        if (inter > 0.0) crossings += 1
      }
      prevDx = x1
      prevDy = y1
      i += 1
    }
    (px >= minX && px <= maxX && py >= minY && py <= maxY) && (crossings % 2) != 0
  }

  /** Single pass: envelope pretest + exact-collinearity boundary test of
    * GeoOps.isPointOnRingBoundary (no short-circuit; same terms). */
  private def ringBoundary(buf: ByteBuffer, n: Int, nd: Int, px: Double, py: Double): Boolean = {
    if (n < 4) {
      buf.position(buf.position() + n * nd * 8)
      return false
    }
    var prevX = buf.getDouble(); var prevY = buf.getDouble()
    var k = 2; while (k < nd) { buf.getDouble(); k += 1 }
    var minX = prevX; var maxX = prevX; var minY = prevY; var maxY = prevY
    var prevDx = px - prevX
    var prevDy = py - prevY
    var onBoundary = false
    var i = 1
    while (i < n) {
      val cx = buf.getDouble(); val cy = buf.getDouble()
      k = 2; while (k < nd) { buf.getDouble(); k += 1 }
      if (cx < minX) minX = cx; if (cx > maxX) maxX = cx
      if (cy < minY) minY = cy; if (cy > maxY) maxY = cy
      val dx1 = px - cx
      val dy1 = py - cy
      val dx2 = prevDx
      val dy2 = prevDy
      if (!onBoundary && dx1 * dy2 - dx2 * dy1 == 0) {
        if (!(dx1 == dx2 && dy1 == dy2)) {
          val dxSeg = cx - prevX
          val dySeg = cy - prevY
          val cross = dx2 * dxSeg + dy2 * dySeg
          if (cross >= 0) {
            val sqLen = dxSeg * dxSeg + dySeg * dySeg
            if (cross <= sqLen) onBoundary = true
          }
        }
      }
      prevX = cx; prevY = cy
      prevDx = dx1
      prevDy = dy1
      i += 1
    }
    (px >= minX && px <= maxX && py >= minY && py <= maxY) && onBoundary
  }
}
