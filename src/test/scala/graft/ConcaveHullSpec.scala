package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** Concave hull: Delaunay + border erosion properties. */
class ConcaveHullSpec extends AnyFunSuite {

  private def gridPoints(cells: Seq[(Int, Int)]): MultiPoint =
    MultiPoint(cells.map { case (x, y) => Point(x.toDouble, y.toDouble) }.toArray)

  private def isIn(g: Geom, px: Double, py: Double): Boolean = {
    val rings = g match {
      case p: Polygon => p.rings.toSeq
      case MultiPolygon(ps) => ps.toSeq.flatMap(_.rings)
      case _ => Seq.empty
    }
    rings.count(r => GeoOps.isPointInRing(r, px, py, testEnvelope = true) ||
      GeoOps.isPointOnRingBoundary(r, px, py, testEnvelope = true)) % 2 == 1 ||
      rings.exists(r => GeoOps.isPointOnRingBoundary(r, px, py, testEnvelope = true))
  }

  test("ratio 1 equals the convex hull") {
    val rnd = new scala.util.Random(31L)
    val pts = MultiPoint(Array.fill(40)(Point(rnd.nextDouble() * 10, rnd.nextDouble() * 10)))
    val concave = ConcaveHullOp.concaveHull(pts, 1.0)
    val convex = GeoOps.convexHull(pts)
    assert(math.abs(GeoOps.area(concave) - GeoOps.area(convex)) < 1e-9)
  }

  test("L-shaped grid: hull carves the notch, contains all points") {
    // L-shape: [0,10]x[0,4] ∪ [0,4]x[0,10] on the integer grid
    val cells = for {
      x <- 0 to 10; y <- 0 to 10
      if y <= 4 || x <= 4
    } yield (x, y)
    val pts = gridPoints(cells)
    val hull = ConcaveHullOp.concaveHull(pts, 0.05)
    val convexArea = GeoOps.area(GeoOps.convexHull(pts))
    val a = GeoOps.area(hull)
    // the notch ([5,10]x[5,10] minus the hypotenuse half) must be carved:
    // well below convex area, at or above the L area (diagonal smoothing
    // at the inner corner can only ADD up to half a cell)
    assert(a < convexArea - 10.0, s"hull=$a convex=$convexArea")
    assert(a >= 10.0 * 4 + 4 * 10 - 4 * 4, s"hull=$a below L area")
    assert(a <= 10.0 * 4 + 4 * 10 - 4 * 4 + 1.0, s"hull=$a too much smoothing")
    // every input point on or inside
    cells.foreach { case (x, y) =>
      assert(isIn(hull, x.toDouble, y.toDouble), s"($x,$y) outside hull")
    }
    // and the notch interior is OUT
    assert(!isIn(hull, 8.0, 8.0))
  }

  test("collinear / tiny inputs fall back to convex hull") {
    val line = MultiPoint(Array(Point(0, 0), Point(1, 0), Point(2, 0)))
    val h = ConcaveHullOp.concaveHull(line, 0.5)
    assert(GeoOps.area(h) < 1e-12) // degenerate, no crash
    val two = MultiPoint(Array(Point(0, 0), Point(1, 1)))
    ConcaveHullOp.concaveHull(two, 0.5) // no crash
  }
}
