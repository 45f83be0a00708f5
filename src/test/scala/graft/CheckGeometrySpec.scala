package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{CheckGeometry, Wkt}

/** check-geometry kernel cases beyond the g36 gate families. */
class CheckGeometrySpec extends AnyFunSuite {

  private def detail(wkt: String) = CheckGeometry.validityDetail(Wkt.parse(wkt))

  test("valid polygon with a proper hole has no detail") {
    assert(detail("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))").isEmpty)
  }

  test("hole crossing the shell is a Self-intersection (cross-ring)") {
    val d = detail("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (8 8, 14 8, 14 9, 8 9, 8 8))")
    assert(d.exists(_._1 == "Self-intersection"))
    // first contact is on the shell's right edge x=10
    assert(d.exists(r => math.abs(r._2 - 10.0) < 1e-12))
  }

  test("nested shells in a multipolygon") {
    val d = detail("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))")
    assert(d.exists(_._1 == "Nested shells"))
  }

  test("pinched ring (vertex touch between non-adjacent segments)") {
    // figure-eight sharing vertex (5,5): segments meet at a non-shared endpoint
    val d = detail("POLYGON ((0 0, 5 5, 10 0, 10 10, 5 5, 0 10, 0 0))")
    assert(d.exists(_._1 == "Ring Self-intersection"))
    assert(d.exists(r => r._2 == 5.0 && r._3 == 5.0))
  }

  test("degenerate linestring and unclosed ring") {
    assert(detail("LINESTRING (1 2, 3 4)").isEmpty)
    val d = detail("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 1))") // not closed
    assert(d.exists(_._1 == "Ring is not closed"))
  }

  test("points and multipoints are always valid") {
    assert(detail("POINT (3 4)").isEmpty)
    assert(detail("MULTIPOINT ((1 1), (2 2))").isEmpty)
  }
}
