package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Circular-arc linearization (reference:
  * OGRGeometryFactory::curveToLineString,
  * /root/reference/ogr/ogrgeometryfactory.cpp — arcs strok ed at a max
  * angle step, default 4°, the OGR_ARC_STEPSIZE default). GDAL linearizes
  * curve geometries on read for drivers/operations without curve support;
  * this engine does the same at WKT parse time (Wkt.scala CIRCULARSTRING). */
object Arc {

  /** OGR_ARC_STEPSIZE default (ogrgeometryfactory.cpp curve stroking). */
  final val MaxAngleStepDeg = 4.0

  /** Linearize a CIRCULARSTRING coordinate sequence (2k+1 points = k arcs,
    * each through a 3-point triple). Collinear triples degrade to straight
    * segments; arc interior points are sampled at equal angular steps
    * ≤ maxStepDeg, with the exact input endpoints preserved. */
  def linearize(cs: Array[Double], maxStepDeg: Double = MaxAngleStepDeg): Array[Double] = {
    val out = new ArrayBuffer[Double]()
    if (cs.length < 2) return cs
    out += cs(0); out += cs(1)
    var i = 0
    while (i + 5 < cs.length) {
      val x0 = cs(i); val y0 = cs(i + 1)
      val x1 = cs(i + 2); val y1 = cs(i + 3)
      val x2 = cs(i + 4); val y2 = cs(i + 5)
      val d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
      if (d == 0.0) {
        // collinear: straight segments through the mid point
        out += x1; out += y1; out += x2; out += y2
      } else {
        val sq0 = x0 * x0 + y0 * y0
        val sq1 = x1 * x1 + y1 * y1
        val sq2 = x2 * x2 + y2 * y2
        val cx = (sq0 * (y1 - y2) + sq1 * (y2 - y0) + sq2 * (y0 - y1)) / d
        val cy = (sq0 * (x2 - x1) + sq1 * (x0 - x2) + sq2 * (x1 - x0)) / d
        val r = math.sqrt((x0 - cx) * (x0 - cx) + (y0 - cy) * (y0 - cy))
        val a0 = math.atan2(y0 - cy, x0 - cx)
        val a1 = math.atan2(y1 - cy, x1 - cx)
        val a2 = math.atan2(y2 - cy, x2 - cx)
        val tau = 2.0 * math.Pi
        def norm(a: Double): Double = { val m = a % tau; if (m < 0) m + tau else m }
        val ccwTo2 = norm(a2 - a0)
        val ccwTo1 = norm(a1 - a0)
        val sweep = if (ccwTo1 <= ccwTo2) ccwTo2 else ccwTo2 - tau
        val nSeg = math.max(1, math.ceil(math.abs(sweep) * 180.0 / math.Pi / maxStepDeg).toInt)
        var k = 1
        while (k < nSeg) {
          val a = a0 + sweep * k / nSeg
          out += cx + r * math.cos(a)
          out += cy + r * math.sin(a)
          k += 1
        }
        out += x2; out += y2
      }
      i += 4
    }
    out.toArray
  }
}
