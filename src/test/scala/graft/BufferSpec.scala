package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** Buffer (capsule construction + union) and MakeValid (even-odd
  * re-noding): closed-form area fixtures plus Monte-Carlo containment —
  * every point within dist of the input must be inside the buffer (up to
  * chord sagitta), every point farther than dist outside it. */
class BufferSpec extends AnyFunSuite {

  private val k = 32 // 4 * quadSegs(8)
  private def capArea(d: Double): Double = (k / 2.0) * d * d * math.sin(2 * math.Pi / k)

  test("segment buffer: rect + exact half-disc caps") {
    val b = Buffer.buffer(LineString(Array(0.0, 0, 3.0, 0)), 0.5)
    assert(math.abs(GeoOps.area(b) - (3.0 + capArea(0.5))) < 1e-9)
  }

  test("point buffer: inscribed 32-gon") {
    val b = Buffer.buffer(Point(1.0, 2.0), 1.0)
    assert(math.abs(GeoOps.area(b) - capArea(1.0)) < 1e-9)
  }

  test("square grow and erode") {
    val sq = Polygon(Array(Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)))
    val grow = Buffer.buffer(sq, 0.5)
    assert(math.abs(GeoOps.area(grow) - (16.0 + 8.0 + capArea(0.5))) < 1e-9)
    val er = Buffer.buffer(sq, -0.5)
    assert(math.abs(GeoOps.area(er) - 9.0) < 1e-9)
  }

  test("buffer distance property: random polyline, sampled containment") {
    val rnd = new scala.util.Random(23L)
    val cs = new Array[Double](10)
    for (i <- 0 until 5) { cs(2 * i) = rnd.nextDouble() * 8; cs(2 * i + 1) = rnd.nextDouble() * 8 }
    val line = LineString(cs)
    val d = 0.7
    val buf = Buffer.buffer(line, d)
    // max inward chord error (sagitta) of the k-gon discretization
    val sag = d * (1.0 - math.cos(math.Pi / k))
    def distToLine(px: Double, py: Double): Double = {
      var m = Double.MaxValue
      var i = 0
      while (i + 3 < cs.length) {
        m = math.min(m, GeoOps.distToSegmentSq(px, py, cs(i), cs(i + 1), cs(i + 2), cs(i + 3)))
        i += 2
      }
      math.sqrt(m)
    }
    def isIn(g: Geom, px: Double, py: Double): Boolean = {
      val rings = g match {
        case p: Polygon => p.rings.toSeq
        case MultiPolygon(ps) => ps.toSeq.flatMap(_.rings)
        case _ => Seq.empty
      }
      rings.count(r => GeoOps.isPointInRing(r, px, py, testEnvelope = true)) % 2 == 1
    }
    var n = 0
    while (n < 2000) {
      val px = rnd.nextDouble() * 10 - 1; val py = rnd.nextDouble() * 10 - 1
      val dl = distToLine(px, py)
      if (dl < d - sag - 1e-9) assert(isIn(buf, px, py), s"($px,$py) d=$dl should be inside")
      if (dl > d + 1e-9) assert(!isIn(buf, px, py), s"($px,$py) d=$dl should be outside")
      n += 1
    }
  }

  test("makeValid: bowtie splits into two triangles") {
    val bow = Polygon(Array(Array(0.0, 0, 2, 2, 2, 0, 0, 2, 0, 0)))
    val v = BoolOps.makeValid(bow)
    assert(math.abs(GeoOps.area(v) - 2.0) < 1e-12)
    v match {
      case MultiPolygon(ps) => assert(ps.length == 2)
      case other => fail(s"expected 2 polygons, got $other")
    }
    // already-valid polygon is preserved (area + single shell)
    val ok = Polygon(Array(Array(0.0, 0, 3, 0, 3, 3, 0, 3, 0, 0)))
    assert(math.abs(GeoOps.area(BoolOps.makeValid(ok)) - 9.0) < 1e-12)
  }
}
