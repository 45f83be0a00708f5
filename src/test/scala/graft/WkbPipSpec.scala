package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.geom._

/** WkbPip (direct-on-WKB point predicates) must be bit-identical to the
  * decode + GeoOps path on every geometry and point, including boundary
  * and hole cases. */
class WkbPipSpec extends AnyFunSuite {

  private def ringGen(cx: Double, cy: Double, r: Double, n: Int): Array[Double] = {
    val pts = (0 until n).map { i =>
      val a = 2 * math.Pi * i / n
      (cx + r * math.cos(a), cy + r * math.sin(a))
    } :+ (cx + r, cy)
    pts.flatMap { case (x, y) => Seq(x, y) }.toArray
  }

  private def randomGeom(rnd: Random): Geom = {
    def coord = -50.0 + 100.0 * rnd.nextDouble()
    def poly() = {
      val cx = coord; val cy = coord
      val r = 1.0 + 29.0 * rnd.nextDouble()
      val n = 3 + rnd.nextInt(10)
      val ext = ringGen(cx, cy, r, n)
      if (rnd.nextBoolean()) Polygon(Array(ext, ringGen(cx, cy, r / 3, math.max(3, n - 1))))
      else Polygon(Array(ext))
    }
    rnd.nextInt(4) match {
      case 0 => poly()
      case 1 => MultiPolygon(Array(poly(), poly()))
      case 2 => Point(coord, coord)
      case _ => LineString(Array(coord, coord, coord, coord, coord, coord))
    }
  }

  test("containsPoint/intersectsPoint direct == decode path (seeded random)") {
    val rnd = new Random(42)
    for (_ <- 1 to 2000) {
      val g = randomGeom(rnd)
      val px = -50.0 + 100.0 * rnd.nextDouble()
      val py = -50.0 + 100.0 * rnd.nextDouble()
      val wkb = Wkb.write(g)
      assert(WkbPip.containsPoint(wkb, px, py) == GeoOps.containsPoint(g, px, py))
      assert(WkbPip.intersectsPoint(wkb, px, py) == GeoOps.intersectsPoint(g, px, py))
    }
  }

  test("boundary / vertex / hole points agree with decode path") {
    val poly = Polygon(Array(
      Array[Double](0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array[Double](3, 3, 7, 3, 7, 7, 3, 7, 3, 3)))
    val wkb = Wkb.write(poly)
    val probes = Seq(
      (5.0, 1.0),   // in shell, outside hole
      (5.0, 5.0),   // in hole
      (0.0, 5.0),   // on exterior boundary
      (5.0, 0.0),   // on bottom edge
      (0.0, 0.0),   // exterior vertex
      (3.0, 5.0),   // on hole boundary
      (3.0, 3.0),   // hole vertex
      (11.0, 5.0),  // outside
      (10.0, 10.0), // corner
      (-1.0, -1.0))
    for ((px, py) <- probes) {
      assert(WkbPip.containsPoint(wkb, px, py) == GeoOps.containsPoint(poly, px, py), s"contains ($px,$py)")
      assert(WkbPip.intersectsPoint(wkb, px, py) == GeoOps.intersectsPoint(poly, px, py), s"intersects ($px,$py)")
    }
  }

  test("multipolygon cursor stays aligned across children") {
    val mp = MultiPolygon(Array(
      Polygon(Array(Array[Double](0, 0, 2, 0, 2, 2, 0, 2, 0, 0))),
      Polygon(Array(Array[Double](10, 10, 14, 10, 14, 14, 10, 14, 10, 10),
        Array[Double](11, 11, 13, 11, 13, 13, 11, 13, 11, 11)))))
    val wkb = Wkb.write(mp)
    for (p <- Seq((1.0, 1.0), (12.0, 10.5), (12.0, 12.0), (5.0, 5.0)))
      assert(WkbPip.containsPoint(wkb, p._1, p._2) == GeoOps.containsPoint(mp, p._1, p._2), p)
  }

  test("non-polygon top level falls back to decode semantics") {
    val ls = LineString(Array[Double](0, 0, 10, 10))
    val wkb = Wkb.write(ls)
    assert(!WkbPip.containsPoint(wkb, 5, 5))
    assert(WkbPip.intersectsPoint(wkb, 5, 5))
    assert(!WkbPip.intersectsPoint(wkb, 5, 6))
    val pt = Wkb.write(Point(3, 4))
    assert(WkbPip.intersectsPoint(pt, 3, 4))
    assert(!WkbPip.containsPoint(pt, 3, 4))
  }
}
