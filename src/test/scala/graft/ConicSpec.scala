package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Conic

/** Lambert Conformal Conic + Albers correctness by mathematical property
  * (the g34 gate proves engine/SQL parity; this proves the projections
  * are the RIGHT functions): inverse∘forward identity, unit scale on the
  * LCC standard parallels, and Albers' defining equal-area property. */
class ConicSpec extends AnyFunSuite {

  private val lcc = Conic.lccParams(33.0, 45.0, 23.0, -96.0)
  private val alb = Conic.albersParams(29.5, 45.5, 23.0, -96.0)

  test("LCC and Albers roundtrip to 1e-9 degrees") {
    for (lon <- Seq(-120.0, -96.0, -75.5); lat <- Seq(25.0, 37.3, 46.9)) {
      val (x1, y1) = Conic.lccForward(lon, lat, lcc)
      val (lo1, la1) = Conic.lccInverse(x1, y1, lcc)
      assert(math.abs(lo1 - lon) < 1e-9 && math.abs(la1 - lat) < 1e-9, s"LCC at $lon,$lat")
      val (x2, y2) = Conic.albersForward(lon, lat, alb)
      val (lo2, la2) = Conic.albersInverse(x2, y2, alb)
      assert(math.abs(lo2 - lon) < 1e-9 && math.abs(la2 - lat) < 1e-9, s"Albers at $lon,$lat")
    }
  }

  test("LCC scale is 1 on the standard parallels, >1 outside") {
    // project a tiny east-west step on lat 33 / 45 (standard), and on 39
    def scaleAt(lat: Double): Double = {
      val dLon = 1e-4
      val (x0, y0) = Conic.lccForward(-96.0, lat, lcc)
      val (x1, y1) = Conic.lccForward(-96.0 + dLon, lat, lcc)
      val proj = math.hypot(x1 - x0, y1 - y0)
      // ellipsoidal arc length of the parallel step: ν cosφ dλ
      val phi = lat * math.Pi / 180.0
      val s = math.sin(phi)
      val nu = Conic.A / math.sqrt(1.0 - 0.00669437999014132 * s * s)
      proj / (nu * math.cos(phi) * dLon * math.Pi / 180.0)
    }
    assert(math.abs(scaleAt(33.0) - 1.0) < 1e-6)
    assert(math.abs(scaleAt(45.0) - 1.0) < 1e-6)
    assert(scaleAt(39.0) < 1.0 - 1e-4) // between the parallels scale < 1
    assert(scaleAt(25.0) > 1.0 + 1e-4) // outside, > 1
  }

  test("Albers preserves area of a small quad to 1e-6 relative") {
    // 0.1° x 0.1° quad at mid-latitude: projected planar area must equal
    // the ellipsoid's authalic area of the quad
    val (lon, lat) = (-101.3, 38.7)
    val d = 0.1
    val pts = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
      .map { case (lo, la) => Conic.albersForward(lo, la, alb) }
    val planar = 0.5 * math.abs(
      pts.indices.map { i =>
        val (x0, y0) = pts(i); val (x1, y1) = pts((i + 1) % 4)
        x0 * y1 - x1 * y0
      }.sum)
    // authalic area via q: A_ell = a²(1-e²)/2 * Δλ * [q(φ2)-q(φ1)] / (1-e²)
    // = a²/2 · Δλ · (q2-q1)   (q already carries the (1-e²) factor)
    val d2r = math.Pi / 180.0
    def qOf(latDeg: Double): Double = {
      val e2 = 0.00669437999014132; val e = math.sqrt(e2)
      val s = math.sin(latDeg * d2r)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    val ell = Conic.A * Conic.A / 2.0 * (d * d2r) * (qOf(lat + d) - qOf(lat))
    assert(math.abs(planar / ell - 1.0) < 1e-6, s"planar $planar vs ellipsoidal $ell")
  }
}
