package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Conic

/** Polar Stereographic (variant B) + Sinusoidal by mathematical property
  * (g43 proves engine/SQL parity; this proves they're the RIGHT
  * projections): roundtrip identity over both hemispheres' domains,
  * PS unit scale on the standard parallel and pole→origin, sinusoidal
  * equal-area and true-scale central meridian. */
class ProjSpec extends AnyFunSuite {

  private val e2 = (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)

  test("PS north + south roundtrip to 1e-9 degrees; pole maps to origin") {
    val n = Conic.psParams(70.0, -45.0)
    for (lon <- Seq(-179.5, -45.0, 0.0, 120.7); lat <- Seq(55.0, 70.0, 89.5)) {
      val (x, y) = Conic.psForward(lon, lat, n)
      val (lo, la) = Conic.psInverse(x, y, n)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"PS-N at $lon,$lat")
    }
    val sp = Conic.psParams(-71.0, 0.0) // EPSG:3031 parameters
    for (lon <- Seq(-170.0, 0.0, 66.6); lat <- Seq(-55.0, -71.0, -89.5)) {
      val (x, y) = Conic.psForward(lon, lat, sp)
      val (lo, la) = Conic.psInverse(x, y, sp)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"PS-S at $lon,$lat")
    }
    val (px, py) = Conic.psForward(33.0, 90.0, n)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6, s"pole → ($px,$py)")
  }

  test("PS scale is 1 on the standard parallel, grows away from it") {
    val p = Conic.psParams(70.0, -45.0)
    def scaleAt(lat: Double): Double = {
      val dLon = 1e-4
      val (x0, y0) = Conic.psForward(10.0, lat, p)
      val (x1, y1) = Conic.psForward(10.0 + dLon, lat, p)
      val phi = lat * math.Pi / 180.0
      val s = math.sin(phi)
      val nu = Conic.A / math.sqrt(1.0 - e2 * s * s)
      math.hypot(x1 - x0, y1 - y0) / (nu * math.cos(phi) * dLon * math.Pi / 180.0)
    }
    assert(math.abs(scaleAt(70.0) - 1.0) < 1e-6)
    assert(scaleAt(60.0) > 1.0 + 1e-3) // equatorward of lat_ts: scale > 1
    assert(scaleAt(80.0) < 1.0 - 1e-3) // poleward: scale < 1
  }

  test("Sinusoidal roundtrips, is equal-area, and true-scale on λ0") {
    val p = Conic.sinuParams(0.0)
    for (lon <- Seq(-179.0, -20.0, 0.0, 155.5); lat <- Seq(-84.0, -33.0, 0.0, 47.1, 84.0)) {
      val (x, y) = Conic.sinuForward(lon, lat, p)
      val (lo, la) = Conic.sinuInverse(x, y, p)
      assert(math.abs(lo - lon) < 1e-8 && math.abs(la - lat) < 1e-8, s"sinu at $lon,$lat")
    }
    // equal-area: a tiny quad's planar area == ellipsoid surface area
    val (lon, lat, d) = (37.2, 51.8, 0.01)
    val quad = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
      .map { case (lo, la) => Conic.sinuForward(lo, la, p) }
    val planar = 0.5 * math.abs((0 until 4).map { i =>
      val (x1, y1) = quad(i); val (x2, y2) = quad((i + 1) % 4)
      x1 * y2 - x2 * y1
    }.sum)
    // evaluate the surface element at the quad CENTER — corner evaluation
    // leaves an O(d) first-order error the comparison would chase
    val phi = (lat + d / 2.0) * math.Pi / 180.0
    val s = math.sin(phi)
    val one = 1.0 - e2 * s * s
    // ellipsoid area element: (M ν cosφ) dφ dλ, M = a(1-e²)/(1-e²sin²φ)^1.5
    val m = Conic.A * (1.0 - e2) / math.pow(one, 1.5)
    val nu = Conic.A / math.sqrt(one)
    val dr = math.Pi / 180.0
    val surf = m * nu * math.cos(phi) * (d * dr) * (d * dr)
    assert(math.abs(planar / surf - 1.0) < 1e-4, s"$planar vs $surf")
    // true scale along the central meridian: y spacing == meridian arc
    val (_, y0) = Conic.sinuForward(0.0, lat, p)
    val (_, y1) = Conic.sinuForward(0.0, lat + d, p)
    assert(math.abs((y1 - y0) / (m * d * dr) - 1.0) < 1e-6)
  }

  test("aeqd: radial distance == great-circle distance (the defining property)") {
    val (lat0, lon0) = (40.0, 10.0)
    for ((lon, lat) <- Seq((10.0, 40.0), (25.3, 47.1), (-120.7, -33.4),
        (170.0, 80.2), (-60.0, 0.0))) {
      val (x, y) = Conic.aeqdForward(lon, lat, lat0, lon0)
      val d2r = math.Pi / 180.0
      // haversine central angle (well-conditioned at c ~ 0, unlike acos)
      val sdLat = math.sin((lat - lat0) * d2r / 2.0)
      val sdLon = math.sin((lon - lon0) * d2r / 2.0)
      val h = sdLat * sdLat + math.cos(lat0 * d2r) * math.cos(lat * d2r) * sdLon * sdLon
      val c = 2.0 * math.asin(math.min(1.0, math.sqrt(h)))
      assert(math.abs(math.hypot(x, y) - Conic.A * c) < 1e-6, s"($lon,$lat)")
      val (lonB, latB) = Conic.aeqdInverse(x, y, lat0, lon0)
      assert(math.abs(lonB - lon) < 1e-9 && math.abs(latB - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("aeqd: (near-)antipodal points are a projection error (NaN, like PROJ)") {
    val (lat0, lon0) = (40.0, 10.0)
    // exact antipode and a point within ~1e-8 rad of it
    for ((lon, lat) <- Seq((-170.0, -40.0), (-170.0 + 1e-9, -40.0 + 1e-9))) {
      val (x, y) = Conic.aeqdForward(lon, lat, lat0, lon0)
      assert(x.isNaN && y.isNaN, s"($lon,$lat) -> ($x,$y)")
    }
    // just OUTSIDE the guard still projects finitely and round-trips
    val (x, y) = Conic.aeqdForward(-170.001, -40.001, lat0, lon0)
    assert(java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y))
  }

  test("mollweide: pole/equator anchors, round-trip, equal-area element") {
    val sqrt2A = math.sqrt(2.0) * Conic.A
    assert(math.abs(Conic.mollForward(0.0, 90.0, 0.0)._2 - sqrt2A) < 1e-6)
    assert(Conic.mollForward(90.0, 0.0, 0.0)._2 == 0.0)
    // total width at equator: x(180) = 2*sqrt(2)*A
    assert(math.abs(Conic.mollForward(180.0, 0.0, 0.0)._1 - 2.0 * math.sqrt(2.0) * Conic.A) < 1e-6)
    for ((lon, lat) <- Seq((13.37, 52.52), (-77.04, 38.91), (151.21, -33.87), (0.1, 89.0))) {
      val (x, y) = Conic.mollForward(lon, lat, 0.0)
      val (lonB, latB) = Conic.mollInverse(x, y, 0.0)
      assert(math.abs(lonB - lon) < 1e-8 && math.abs(latB - lat) < 1e-8, s"($lon,$lat)")
    }
    // equal-area: the projected quad area equals the SPHERE surface element
    val (lon, lat, d) = (30.0, 45.0, 0.01)
    def pt(lo: Double, la: Double) = Conic.mollForward(lo, la, 0.0)
    val quad = Seq(pt(lon, lat), pt(lon + d, lat), pt(lon + d, lat + d), pt(lon, lat + d))
    val planar = 0.5 * math.abs((0 until 4).map { i =>
      val (x1, y1) = quad(i); val (x2, y2) = quad((i + 1) % 4)
      x1 * y2 - x2 * y1
    }.sum)
    val dr = math.Pi / 180.0
    val surf = Conic.A * Conic.A * math.cos((lat + d / 2.0) * dr) * (d * dr) * (d * dr)
    assert(math.abs(planar / surf - 1.0) < 1e-4, s"$planar vs $surf")
  }

  test("eqc: linear in lon/lat with cos(lat1) x-scale, exact round-trip") {
    val (x, y) = Conic.eqcForward(-45.0, 60.0, 30.0)
    val d2r = math.Pi / 180.0
    assert(math.abs(x - Conic.A * (-45.0 * d2r) * math.cos(30.0 * d2r)) < 1e-9)
    assert(math.abs(y - Conic.A * (60.0 * d2r)) < 1e-9)
    val (lonB, latB) = Conic.eqcInverse(x, y, 30.0)
    assert(math.abs(lonB + 45.0) < 1e-12 && math.abs(latB - 60.0) < 1e-12)
  }

  // ---- perspective azimuthals (g53 family)

  private val azCases = for {
    lon <- Seq(-160.0, -45.3, 0.0, 10.0, 77.7, 179.0)
    lat <- Seq(-80.0, -33.0, 0.0, 40.0, 66.6)
  } yield (lon, lat)

  test("ortho/gnom/stere: round-trip identity inside each domain") {
    val (lat0, lon0) = (40.0, 10.0)
    def cosC(lon: Double, lat: Double): Double = {
      val d = math.Pi / 180.0
      math.sin(lat0 * d) * math.sin(lat * d) +
        math.cos(lat0 * d) * math.cos(lat * d) * math.cos((lon - lon0) * d)
    }
    for ((lon, lat) <- azCases) {
      val c = cosC(lon, lat)
      if (c > 1e-3) { // strictly inside ortho + gnom domains
        val (ox, oy) = Conic.orthoForward(lon, lat, lat0, lon0)
        val (olo, ola) = Conic.orthoInverse(ox, oy, lat0, lon0)
        assert(math.abs(olo - lon) < 1e-9 && math.abs(ola - lat) < 1e-9, s"ortho $lon,$lat")
        val (gx, gy) = Conic.gnomForward(lon, lat, lat0, lon0)
        val (glo, gla) = Conic.gnomInverse(gx, gy, lat0, lon0)
        assert(math.abs(glo - lon) < 1e-9 && math.abs(gla - lat) < 1e-9, s"gnom $lon,$lat")
      }
      if (c > -0.999) { // everywhere but the antipode for stere
        val (sx, sy) = Conic.stereForward(lon, lat, lat0, lon0)
        val (slo, sla) = Conic.stereInverse(sx, sy, lat0, lon0)
        assert(math.abs(slo - lon) < 1e-8 && math.abs(sla - lat) < 1e-8, s"stere $lon,$lat")
      }
    }
  }

  test("ortho/gnom/stere: defining radial scalings vs angular distance c") {
    // At (lat0=0, lon0=0) and a point on the equator at lon=c the radius
    // from center is R sin c (ortho), R tan c (gnom), 2R tan(c/2) (stere)
    // — Snyder 20-3, 22-4, 21-2 collapsed to the equatorial aspect.
    val d2r = math.Pi / 180.0
    for (cDeg <- Seq(5.0, 30.0, 60.0, 85.0)) {
      val c = cDeg * d2r
      val (ox, oy) = Conic.orthoForward(cDeg, 0.0, 0.0, 0.0)
      assert(math.abs(ox - Conic.A * math.sin(c)) < 1e-6 && math.abs(oy) < 1e-6, s"ortho c=$cDeg")
      val (gx, _) = Conic.gnomForward(cDeg, 0.0, 0.0, 0.0)
      assert(math.abs(gx - Conic.A * math.tan(c)) < 1e-5, s"gnom c=$cDeg")
      val (sx, _) = Conic.stereForward(cDeg, 0.0, 0.0, 0.0)
      assert(math.abs(sx - 2.0 * Conic.A * math.tan(c / 2.0)) < 1e-6, s"stere c=$cDeg")
    }
  }

  test("ortho/gnom/stere: out-of-domain points are a projection error (NaN)") {
    // far hemisphere point relative to (40, 10)
    val (fx, fy) = Conic.orthoForward(-170.0, -40.0, 40.0, 10.0)
    assert(fx.isNaN && fy.isNaN)
    val (hx, hy) = Conic.gnomForward(-170.0, -40.0, 40.0, 10.0)
    assert(hx.isNaN && hy.isNaN)
    // gnomonic horizon (c = 90°): equatorial aspect, lon exactly 90° away
    val (ex, ey) = Conic.gnomForward(90.0, 0.0, 0.0, 0.0)
    assert(ex.isNaN && ey.isNaN)
    // stereographic antipode only
    val (ax, ay) = Conic.stereForward(-170.0, -40.0, 40.0, 10.0)
    assert(ax.isNaN && ay.isNaN)
    // ...but the far hemisphere is fine for stere (one-point compactification)
    val (bx, by) = Conic.stereForward(-170.0, -39.0, 40.0, 10.0)
    assert(!bx.isNaN && !by.isNaN)
    // ortho inverse off the disc
    val (nx, ny) = Conic.orthoInverse(Conic.A * 1.01, 0.0, 40.0, 10.0)
    assert(nx.isNaN && ny.isNaN)
  }

  test("gnomonic: great circles map to straight lines (the defining property)") {
    // Three points on one great circle (the plane through two random
    // points and the origin) must be collinear in gnomonic coordinates.
    val d2r = math.Pi / 180.0
    def unit(lon: Double, lat: Double) = {
      val (lo, la) = (lon * d2r, lat * d2r)
      (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
    }
    val a = unit(-20.0, 25.0); val b = unit(55.0, 60.0)
    // midpoint on the sphere of the arc a→b
    val m0 = ((a._1 + b._1) / 2, (a._2 + b._2) / 2, (a._3 + b._3) / 2)
    val n = math.sqrt(m0._1 * m0._1 + m0._2 * m0._2 + m0._3 * m0._3)
    val m = (m0._1 / n, m0._2 / n, m0._3 / n)
    def toLonLat(v: (Double, Double, Double)) =
      (math.atan2(v._2, v._1) / d2r, math.asin(v._3) / d2r)
    val pts = Seq(a, m, b).map(toLonLat).map { case (lo, la) =>
      Conic.gnomForward(lo, la, 40.0, 10.0)
    }
    val (x1, y1) = pts(0); val (x2, y2) = pts(1); val (x3, y3) = pts(2)
    val cross = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
    val scale = math.hypot(x3 - x1, y3 - y1) * math.hypot(x2 - x1, y2 - y1)
    assert(math.abs(cross) / scale < 1e-9, s"deviation ${cross / scale}")
  }

  test("stereographic: conformal (local circles stay circles, k uniform in direction)") {
    // Scale factor along the meridian equals scale along the parallel at
    // a test point (numeric differentiation) — conformality check.
    val (lat0, lon0) = (40.0, 10.0)
    val (lon, lat) = (35.0, 55.0)
    val h = 1e-6
    val d2r = math.Pi / 180.0
    val (x0, y0) = Conic.stereForward(lon, lat, lat0, lon0)
    val (xm, ym) = Conic.stereForward(lon, lat + h, lat0, lon0)
    val (xp, yp) = Conic.stereForward(lon + h, lat, lat0, lon0)
    val kMeridian = math.hypot(xm - x0, ym - y0) / (h * d2r * Conic.A)
    val kParallel = math.hypot(xp - x0, yp - y0) / (h * d2r * Conic.A * math.cos(lat * d2r))
    assert(math.abs(kMeridian / kParallel - 1.0) < 1e-4, s"$kMeridian vs $kParallel")
  }
}
