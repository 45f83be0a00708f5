package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Geodesic

/** Ellipsoidal geodesic measures vs published test vectors.
  * References: Vincenty 1975 (Survey Review 23/176) worked example
  * (Flinders Peak → Buninyong), the WGS84 quarter meridian, and the
  * authalic-sphere identity 4πRq² = ellipsoid surface area. */
class GeodesicSpec extends AnyFunSuite {

  test("Vincenty: Flinders Peak → Buninyong = 54972.271 m (classic vector)") {
    val lat1 = -(37.0 + 57.0 / 60 + 3.72030 / 3600)
    val lon1 = 144.0 + 25.0 / 60 + 29.52440 / 3600
    val lat2 = -(37.0 + 39.0 / 60 + 10.15610 / 3600)
    val lon2 = 143.0 + 55.0 / 60 + 35.38390 / 3600
    val d = Geodesic.vincenty(lat1, lon1, lat2, lon2)
    assert(math.abs(d - 54972.271) < 0.001, s"got $d")
  }

  test("Vincenty: quarter meridian = 10001965.729 m") {
    val d = Geodesic.vincenty(0.0, 0.0, 90.0, 0.0)
    assert(math.abs(d - 10001965.7293) < 0.005, s"got $d")
  }

  test("Vincenty: equatorial arc = a·Δλ (c²α=0 branch)") {
    val d = Geodesic.vincenty(0.0, 0.0, 0.0, 90.0)
    assert(math.abs(d - Geodesic.A * math.Pi / 2) < 0.001, s"got $d")
    // symmetry + coincidence
    assert(Geodesic.vincenty(10, 20, 30, 40) == Geodesic.vincenty(30, 40, 10, 20))
    assert(Geodesic.vincenty(10, 20, 10, 20) == 0.0)
  }

  test("authalic area: octant = ellipsoid surface / 8; sphere identity") {
    val octant = Geodesic.ringArea(Array(0.0, 0.0, 90.0, 0.0, 0.0, 90.0))
    val rq = Geodesic.AuthalicR
    assert(math.abs(octant - math.Pi / 2 * rq * rq) / octant < 1e-12)
    // WGS84 ellipsoid surface area, published: 5.10065621724e14 m²
    assert(math.abs(8 * octant - 5.10065621724e14) / 5.10065621724e14 < 1e-9)
  }

  test("polygon with hole subtracts; ring orientation irrelevant (abs)") {
    import graft.geom._
    val ext = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0)
    val hole = Array(2.0, 2.0, 4.0, 2.0, 4.0, 4.0, 2.0, 4.0, 2.0, 2.0)
    val a = Geodesic.area(Polygon(Array(ext, hole)))
    val ae = Geodesic.ringArea(ext); val ah = Geodesic.ringArea(hole)
    assert(a == ae - ah && ah > 0 && a > 0)
    val holeRev = Array(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0, 2.0, 2.0)
    assert(Geodesic.ringArea(holeRev) == ah)
    // small-rect sanity: ~1° square at equator ≈ 111.32 km × 110.57 km
    val r1 = Geodesic.ringArea(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0))
    assert(math.abs(r1 - 1.2308e10) / 1.2308e10 < 1e-3, s"got $r1")
  }
}
