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

  test("LAEA roundtrip, center identity, antipode NaN") {
    for ((lon, lat) <- Seq((10.0, 40.0), (-30.0, 5.0), (65.0, 75.0), (0.0, -20.0))) {
      val (x, y) = Conic.laeaForward(lon, lat, 40.0, 10.0)
      val (lo, la) = Conic.laeaInverse(x, y, 40.0, 10.0)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
    assert(Conic.laeaForward(10.0, 40.0, 40.0, 10.0) == (0.0, 0.0))
    val (nx, _) = Conic.laeaForward(-170.0, -40.0, 40.0, 10.0)
    assert(nx.isNaN, "antipode must be a projection error")
  }

  test("LAEA is equal-area: small quad area matches spherical patch") {
    // 1°×1° quad at (20E, 50N): spherical area R²·Δλ·(sinφ2−sinφ1)
    val d2r = math.Pi / 180.0
    val corners = Seq((20.0, 50.0), (21.0, 50.0), (21.0, 51.0), (20.0, 51.0))
    val proj = corners.map { case (lo, la) => Conic.laeaForward(lo, la, 40.0, 10.0) }
    val planar = math.abs(proj.indices.map { i =>
      val (x0, y0) = proj(i); val (x1, y1) = proj((i + 1) % 4)
      x0 * y1 - x1 * y0
    }.sum / 2.0)
    val sph = Conic.A * Conic.A * (1.0 * d2r) *
      (math.sin(51.0 * d2r) - math.sin(50.0 * d2r))
    // planar quad with straight edges under-covers the patch slightly
    assert(math.abs(planar / sph - 1.0) < 2e-4, s"planar $planar vs spherical $sph")
  }

  test("Miller: known ordinate ratio vs Mercator, roundtrip, finite poles") {
    // Snyder §18: Miller y = Mercator-y(0.8φ)/0.8; at the pole it is finite
    val (x, y) = Conic.millForward(-75.0, 50.0, 0.0)
    assert(math.abs(x - Conic.A * (-75.0 * math.Pi / 180.0)) < 1e-6)
    val mercAt40 = Conic.A * math.log(math.tan(math.Pi / 4.0 + 0.5 * 40.0 * math.Pi / 180.0))
    assert(math.abs(y - mercAt40 / 0.8) < 1e-6)
    val (_, yp) = Conic.millForward(0.0, 90.0, 0.0)
    assert(!yp.isNaN && !yp.isInfinite && yp > 0)
    for ((lon, lat) <- Seq((-75.0, 50.0), (120.0, -66.0), (0.0, 0.0), (179.5, 89.0))) {
      val (fx, fy) = Conic.millForward(lon, lat, 0.0)
      val (lo, la) = Conic.millInverse(fx, fy, 0.0)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
  }
}
