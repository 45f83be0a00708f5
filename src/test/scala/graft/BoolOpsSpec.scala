package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** Boolean-op core: exact rectangle fixtures plus a Monte-Carlo membership
  * property — for any sample point p away from the input boundaries,
  * pointIn(op(A,B), p) must equal op(pointIn(A,p), pointIn(B,p)). This
  * validates subdivision, field propagation, ring connection AND hole
  * assignment without trusting implementation internals. */
class BoolOpsSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))

  private def polyArea(g: Geom): Double = g match {
    case p: Polygon =>
      math.abs(GeoOps.signedRingArea(p.exterior)) -
        p.rings.drop(1).map(r => math.abs(GeoOps.signedRingArea(r))).sum
    case MultiPolygon(ps) => ps.map(polyArea(_)).sum
    case _ => 0.0
  }

  /** Even-odd membership over all rings of all polygons. */
  private def isIn(g: Geom, px: Double, py: Double): Boolean = {
    val rings = g match {
      case p: Polygon => p.rings.toSeq
      case MultiPolygon(ps) => ps.toSeq.flatMap(_.rings)
      case _ => Seq.empty
    }
    rings.count(r => GeoOps.isPointInRing(r, px, py, testEnvelope = true)) % 2 == 1
  }

  private def minDistToBoundary(g: Geom, px: Double, py: Double): Double = {
    val rings = g match {
      case p: Polygon => p.rings.toSeq
      case MultiPolygon(ps) => ps.toSeq.flatMap(_.rings)
      case _ => Seq.empty
    }
    var d = Double.MaxValue
    rings.foreach { r =>
      var i = 0
      while (i + 3 < r.length) {
        d = math.min(d, GeoOps.distToSegmentSq(px, py, r(i), r(i + 1), r(i + 2), r(i + 3)))
        i += 2
      }
    }
    math.sqrt(d)
  }

  test("rectangle fixtures: exact areas for all four ops") {
    val a = rect(0, 0, 4, 4)
    val b = rect(2, 2, 6, 6)
    assert(math.abs(polyArea(BoolOps.intersection(a, b)) - 4.0) < 1e-12)
    assert(math.abs(polyArea(BoolOps.union(a, b)) - 28.0) < 1e-12)
    assert(math.abs(polyArea(BoolOps.difference(a, b)) - 12.0) < 1e-12)
    assert(math.abs(polyArea(BoolOps.symDifference(a, b)) - 24.0) < 1e-12)
  }

  test("disjoint and contained rectangles") {
    val a = rect(0, 0, 2, 2)
    val b = rect(5, 5, 6, 6)
    assert(polyArea(BoolOps.intersection(a, b)) == 0.0)
    assert(math.abs(polyArea(BoolOps.union(a, b)) - 5.0) < 1e-12)
    val inner = rect(0.5, 0.5, 1.5, 1.5)
    // containment: difference makes a hole
    val diff = BoolOps.difference(a, inner)
    assert(math.abs(polyArea(diff) - 3.0) < 1e-12)
    diff match {
      case p: Polygon => assert(p.numInterior == 1, "hole expected")
      case MultiPolygon(ps) => assert(ps.length == 1 && ps(0).numInterior == 1)
      case other => fail(s"unexpected $other")
    }
    assert(math.abs(polyArea(BoolOps.intersection(a, inner)) - 1.0) < 1e-12)
  }

  test("shared-edge adjacency: union merges, intersection has zero area") {
    val a = rect(0, 0, 2, 2)
    val b = rect(2, 0, 4, 2)
    assert(math.abs(polyArea(BoolOps.union(a, b)) - 8.0) < 1e-12)
    assert(polyArea(BoolOps.intersection(a, b)) < 1e-12)
    assert(math.abs(polyArea(BoolOps.difference(a, b)) - 4.0) < 1e-12)
  }

  test("identical operands") {
    val a = rect(0, 0, 3, 3)
    assert(math.abs(polyArea(BoolOps.intersection(a, a)) - 9.0) < 1e-12)
    assert(math.abs(polyArea(BoolOps.union(a, a)) - 9.0) < 1e-12)
    assert(polyArea(BoolOps.difference(a, a)) < 1e-12)
    assert(polyArea(BoolOps.symDifference(a, a)) < 1e-12)
  }

  test("polygon with hole vs overlapping rect: membership property") {
    val withHole = Polygon(Array(
      Array(0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(3, 3, 3, 7, 7, 7, 7, 3, 3, 3))) // hole (CW)
    val b = rect(5, 5, 12, 12)
    checkMembership(withHole, b, samples = 800)
  }

  private def checkMembership(a: Geom, b: Geom, samples: Int,
                              seed: Long = 42L): Unit = {
    val ea = a.envelope.union(b.envelope)
    val rnd = new scala.util.Random(seed)
    val results = Seq(
      ("inter", BoolOps.intersection(a, b), (p: Boolean, q: Boolean) => p && q),
      ("union", BoolOps.union(a, b), (p: Boolean, q: Boolean) => p || q),
      ("diff", BoolOps.difference(a, b), (p: Boolean, q: Boolean) => p && !q),
      ("xor", BoolOps.symDifference(a, b), (p: Boolean, q: Boolean) => p != q))
    var k = 0
    while (k < samples) {
      val px = ea.minX - 1 + rnd.nextDouble() * (ea.width + 2)
      val py = ea.minY - 1 + rnd.nextDouble() * (ea.height + 2)
      // stay clear of input boundaries (membership undefined on them)
      if (minDistToBoundary(a, px, py) > 1e-6 && minDistToBoundary(b, px, py) > 1e-6) {
        val inA = isIn(a, px, py); val inB = isIn(b, px, py)
        results.foreach { case (name, g, f) =>
          val want = f(inA, inB)
          val got = isIn(g, px, py)
          assert(got == want, s"$name at ($px,$py): got $got want $want\n  A=$a\n  B=$b")
        }
      }
      k += 1
    }
  }

  private def randRect(rnd: scala.util.Random): Polygon = {
    val x0 = rnd.nextInt(20) - 10; val y0 = rnd.nextInt(20) - 10
    val w = 1 + rnd.nextInt(8); val h = 1 + rnd.nextInt(8)
    rect(x0, y0, x0 + w, y0 + h)
  }

  private def randStar(rnd: scala.util.Random): Polygon = {
    // star polygon: random radii sorted by angle — simple by construction
    val cx = rnd.nextDouble() * 10 - 5; val cy = rnd.nextDouble() * 10 - 5
    val n = 5 + rnd.nextInt(7)
    val pts = (0 until n).map { i =>
      val ang = 2 * math.Pi * i / n + rnd.nextDouble() * 0.5 / n
      val rad = 0.5 + rnd.nextDouble() * 5
      (cx + rad * math.cos(ang), cy + rad * math.sin(ang))
    }
    val closed = pts :+ pts.head
    Polygon(Array(closed.flatMap { case (x, y) => Seq(x, y) }.toArray))
  }

  test("random rectangles: membership property (integer coords, shared edges common)") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 60)
      checkMembership(randRect(rnd), randRect(rnd), samples = 200, seed = rnd.nextLong())
  }

  test("random star polygons: membership property") {
    val rnd = new scala.util.Random(11L)
    for (_ <- 0 until 60)
      checkMembership(randStar(rnd), randStar(rnd), samples = 200, seed = rnd.nextLong())
  }

  test("random rect vs star: membership property") {
    val rnd = new scala.util.Random(13L)
    for (_ <- 0 until 60)
      checkMembership(randRect(rnd), randStar(rnd), samples = 200, seed = rnd.nextLong())
  }

  test("area identity: area(A)+area(B) == area(A∪B)+area(A∩B)") {
    val rnd = new scala.util.Random(17L)
    for (_ <- 0 until 40) {
      val a = randStar(rnd); val b = randStar(rnd)
      val lhs = polyArea(a) + polyArea(b)
      val rhs = polyArea(BoolOps.union(a, b)) + polyArea(BoolOps.intersection(a, b))
      assert(math.abs(lhs - rhs) < 1e-7, s"A=$a B=$b")
    }
  }
}
