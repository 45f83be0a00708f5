package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Utm

/** UTM series: known anchors + sub-micrometer forward/inverse roundtrip. */
class UtmSpec extends AnyFunSuite {

  test("central meridian anchors") {
    val (x0, y0) = Utm.forward(3.0, 0.0, 31) // zone 31 central meridian, equator
    assert(math.abs(x0 - 500000.0) < 1e-6)
    assert(math.abs(y0) < 1e-6)
    // known EPSG test point: 2°E 49°N zone 31 ~ (426857.0, 5427937.5) ±1 m
    val (x1, y1) = Utm.forward(2.0, 49.0, 31)
    assert(math.abs(x1 - 426857.0) < 2.0, s"x=$x1")
    assert(math.abs(y1 - 5427938.0) < 2.0, s"y=$y1")
  }

  test("roundtrip within a zone (series truncation ~1 mm)") {
    val rnd = new scala.util.Random(41L)
    for (_ <- 0 until 200) {
      val lon = 0.2 + rnd.nextDouble() * 5.6
      val lat = -79.0 + rnd.nextDouble() * 158.0
      val (x, y) = Utm.forward(lon, lat, 31)
      val (lon2, lat2) = Utm.inverse(x, y, 31)
      assert(math.abs(lon2 - lon) < 1e-8, s"$lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"$lat -> $lat2")
    }
  }
}
