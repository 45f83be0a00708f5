package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** WRAPDATELINE branch coverage beyond the g58 gate
  * (ogrgeometryfactory.cpp:3134-3596, 4430-4620). */
class DatelineSpec extends AnyFunSuite {

  test("point longitudes normalize into [-180, 180]") {
    assert(Dateline.wrapLon(190.0) == -170.0)
    assert(Dateline.wrapLon(-190.0) == 170.0)
    assert(Dateline.wrapLon(540.0) == -180.0) // fmod form: (540+180) % 360 - 180
    assert(Dateline.wrapLon(170.0) == 170.0)
    assert(Dateline.cut(Point(200.0, 5.0)) match {
      case MultiPoint(ps) => ps.head == Point(-160.0, 5.0)
      case _ => false
    })
  }

  test("crossing line splits with interpolated +-180 vertices") {
    // the gap must exceed 360 - offset = 350 strictly: 176 -> -176 is 352
    val ls = LineString(Array(176.0, 0.0, -176.0, 10.0))
    val MultiLineString(ps) = Dateline.cut(ls): @unchecked
    assert(ps.length == 2)
    // ratio = 4/8, yc = 5
    assert(ps(0).coords.sameElements(Array(176.0, 0.0, 180.0, 5.0)))
    assert(ps(1).coords.sameElements(Array(-180.0, 5.0, -176.0, 10.0)))
    // a 350-degree gap (175 -> -175) is NOT > 350: kept whole
    val MultiLineString(kept) = Dateline.cut(LineString(Array(175.0, 0.0, -175.0, 10.0))): @unchecked
    assert(kept.length == 1)
  }

  test("exact +180 vertex between west-side points emits the -180 twin (special branch)") {
    // prev west of right border, vertex exactly at 180, next west again
    val ls = LineString(Array(-175.0, 0.0, 180.0, 5.0, -175.0, 10.0))
    val MultiLineString(ps) = Dateline.cut(ls): @unchecked
    assert(ps.length == 1)
    assert(ps(0).coords.sameElements(Array(-175.0, 0.0, -180.0, 5.0, -175.0, 10.0)))
  }

  test("non-crossing line is kept whole") {
    val ls = LineString(Array(10.0, 0.0, 20.0, 5.0))
    val MultiLineString(ps) = Dateline.cut(ls): @unchecked
    assert(ps.length == 1 && ps(0).coords.sameElements(ls.coords))
  }

  test("360-degree jump at the pole is not a crossing (EPSILON guard)") {
    val ls = LineString(Array(-180.0, 90.0, 180.0, 90.0, 170.0, 80.0))
    val MultiLineString(ps) = Dateline.cut(ls): @unchecked
    assert(ps.length == 1)
  }

  test("crossing polygon clips into two pieces with exact areas") {
    val p = Polygon(Array(Array(176.0, -10.0, -176.0, -10.0, -176.0, 20.0, 176.0, 20.0, 176.0, -10.0)))
    val MultiPolygon(ps) = Dateline.cut(p): @unchecked
    assert(ps.length == 2)
    val areas = ps.map(GeoOps.area).sorted
    assert(areas.sameElements(Array(120.0, 120.0)))
    val (mn, mx) = ps.map(q => (q.rings(0).grouped(2).map(_.head).min,
      q.rings(0).grouped(2).map(_.head).max)).unzip
    assert(mn.min == -180.0 && mx.max == 180.0)
  }

  test("geometry spanning beyond -180 (around -180) wraps with +360 offset") {
    val ls = LineString(Array(-185.0, 0.0, -175.0, 10.0))
    val MultiLineString(ps) = Dateline.cut(ls): @unchecked
    assert(ps.length == 2)
    // world-rect piece first, then the [-360,-180] piece shifted +360
    assert(ps(0).coords.sameElements(Array(-180.0, 5.0, -175.0, 10.0)))
    assert(ps(1).coords.sameElements(Array(175.0, 0.0, 180.0, 5.0)))
  }

  test("multi geometries recurse per member") {
    val m = MultiLineString(Array(
      LineString(Array(176.0, 0.0, -176.0, 10.0)),
      LineString(Array(0.0, 0.0, 1.0, 1.0))))
    val MultiLineString(ps) = Dateline.cut(m): @unchecked
    assert(ps.length == 3)
  }
}
