package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Datum

/** 7-parameter Helmert datum shift (TOWGS84 / EPSG 9606 position-vector). */
class DatumSpec extends AnyFunSuite {

  // published OSGB36→WGS84 TOWGS84 set (position-vector, arc-sec, ppm)
  private val osgb = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

  test("ECEF round-trip at various latitudes (6 fixed iterations suffice)") {
    for ((lon, lat) <- Seq((0.0, 0.0), (2.33, 48.86), (-58.4, -34.6),
        (151.2, -33.87), (0.0, 89.9), (12.5, -89.5), (-179.99, 45.0))) {
      val (x, y, z) = Datum.toEcef(lon, lat, 0.0, Datum.WGS84)
      val (lon2, lat2, h2) = Datum.toGeodetic(x, y, z, Datum.WGS84)
      assert(math.abs(lon2 - lon) < 1e-11, s"lon ($lon,$lat)")
      assert(math.abs(lat2 - lat) < 1e-11, s"lat ($lon,$lat)")
      assert(math.abs(h2) < 1e-5, s"h ($lon,$lat)")
    }
  }

  test("zero parameters + same ellipsoid = identity") {
    val (lon, lat) = Datum.toWgs84(13.4, 52.5, Datum.WGS84, 0, 0, 0, 0, 0, 0, 0)
    assert(math.abs(lon - 13.4) < 1e-11 && math.abs(lat - 52.5) < 1e-11)
  }

  test("toWgs84 and fromWgs84 round-trip") {
    // the Helmert inverse is exact; the residual (~1e-8 deg ≈ mm) is the
    // inherent 2D-transform loss — each direction re-projects with h=0,
    // and the shifted point sits ~50 m off the target ellipsoid surface
    // (same behavior as any 2D TOWGS84 transform)
    val (tx, ty, tz, rx, ry, rz, s) = osgb
    for ((lon, lat) <- Seq((-0.1276, 51.5072), (-3.19, 55.95), (-5.93, 54.60))) {
      val (lw, pw) = Datum.toWgs84(lon, lat, Datum.Airy1830, tx, ty, tz, rx, ry, rz, s)
      val (lb, pb) = Datum.fromWgs84(lw, pw, Datum.Airy1830, tx, ty, tz, rx, ry, rz, s)
      assert(math.abs(lb - lon) < 1e-7 && math.abs(pb - lat) < 1e-7, s"($lon,$lat)")
    }
  }

  test("shift magnitudes are physically right (ED50 ~100-300m W.Europe, OSGB ~50-150m)") {
    def meters(lon0: Double, lat0: Double, lon1: Double, lat1: Double): Double = {
      val d2r = math.Pi / 180.0
      val dx = (lon1 - lon0) * d2r * 6371000.0 * math.cos(lat0 * d2r)
      val dy = (lat1 - lat0) * d2r * 6371000.0
      math.hypot(dx, dy)
    }
    // ED50 (Intl 1924) → WGS84, mean European set (-87, -96, -120)
    val (le, pe) = Datum.toWgs84(2.35, 48.85, Datum.Intl1924, -87, -96, -120, 0, 0, 0, 0)
    val dEd50 = meters(2.35, 48.85, le, pe)
    assert(dEd50 > 80 && dEd50 < 300, s"ED50 shift $dEd50 m")
    // OSGB36 → WGS84 over London
    val (tx, ty, tz, rx, ry, rz, s) = osgb
    val (lo, po) = Datum.toWgs84(-0.1276, 51.5072, Datum.Airy1830, tx, ty, tz, rx, ry, rz, s)
    val dOsgb = meters(-0.1276, 51.5072, lo, po)
    assert(dOsgb > 50 && dOsgb < 200, s"OSGB shift $dOsgb m")
    // OSGB36's zero meridian lies ~5-6 arc-sec EAST of WGS84's, so the
    // same physical point gets a SMALLER (more westerly) WGS84 longitude
    assert(lo < -0.1276 && (-0.1276) - lo < 0.01)
  }

  test("pure translation equals hand-computed ECEF translation") {
    val (x, y, z) = Datum.toEcef(7.0, 46.0, 0.0, Datum.Intl1924)
    val (lon, lat) = Datum.toWgs84(7.0, 46.0, Datum.Intl1924, -87, -96, -120, 0, 0, 0, 0)
    val (lon2, lat2, _) = Datum.toGeodetic(x - 87.0, y - 96.0, z - 120.0, Datum.WGS84)
    assert(math.abs(lon - lon2) < 1e-14 && math.abs(lat - lat2) < 1e-14)
  }
}
