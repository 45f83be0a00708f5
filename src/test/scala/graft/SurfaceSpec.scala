package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** Surface geometry types (Triangle / TIN / PolyhedralSurface,
  * ogr_core.h:426-513) and the curve WKB read path: codec round-trips,
  * the MultiPolygon cast, and analysis ops routed through it. */
class SurfaceSpec extends AnyFunSuite {

  private val triWkt = "TRIANGLE ((0 0,4 0,0 4,0 0))"
  private val tinWkt = "TIN (((0 0,2 0,0 2,0 0)),((2 0,2 2,0 2,2 0)))"
  private val phsWkt = "POLYHEDRALSURFACE (((0 0,3 0,3 3,0 3,0 0)),((0 0,0 3,3 3,3 0,0 0)))"

  test("WKT parse preserves type and round-trips through both codecs") {
    for (w <- Seq(triWkt, tinWkt, phsWkt)) {
      val g = Wkt.parse(w)
      assert(Wkt.write(g) === w)
      val viaWkb = Wkb.read(Wkb.write(g))
      assert(Wkt.write(viaWkb) === w)
    }
    assert(Wkt.parse(triWkt).wkbType === 17)
    assert(Wkt.parse(tinWkt).wkbType === 16)
    assert(Wkt.parse(phsWkt).wkbType === 15)
  }

  test("area is the facet sum; npoints counts every vertex") {
    assert(GeoOps.area(Wkt.parse(triWkt)) === 8.0)
    assert(GeoOps.area(Wkt.parse(tinWkt)) === 4.0)
    assert(GeoOps.area(Wkt.parse(phsWkt)) === 18.0)
    assert(GeoOps.npoints(Wkt.parse(triWkt)) === 4)
    assert(GeoOps.npoints(Wkt.parse(tinWkt)) === 8)
    assert(GeoOps.npoints(Wkt.parse(phsWkt)) === 10)
  }

  test("point predicates and relate see the MultiPolygon cast") {
    val tin = Wkt.parse(tinWkt)
    assert(GeoOps.containsPoint(tin, 0.5, 0.5))
    assert(GeoOps.containsPoint(tin, 1.5, 1.5)) // second facet
    assert(!GeoOps.containsPoint(tin, 2.5, 2.5))
    assert(GeoOps.intersectsPoint(tin, 2.0, 2.0)) // facet boundary vertex
    assert(GeoOps.intersects(tin, Wkt.parse("POLYGON ((1 1,3 1,3 3,1 3,1 1))")))
    assert(Relate.within(Wkt.parse("POINT (0.5 0.5)"), tin))
  }

  test("forceMulti casts surfaces to facet MultiPolygon and promotes singles") {
    val m = GeoOps.forceMulti(Wkt.parse(tinWkt))
    assert(m.typeName === "MULTIPOLYGON")
    assert(GeoOps.area(m) === 4.0)
    assert(GeoOps.forceMulti(Wkt.parse("POINT (1 2)")).typeName === "MULTIPOINT")
    assert(GeoOps.forceMulti(Wkt.parse("LINESTRING (0 0,1 1)")).typeName === "MULTILINESTRING")
    assert(GeoOps.forceMulti(Wkt.parse("POLYGON ((0 0,1 0,1 1,0 0))")).typeName === "MULTIPOLYGON")
  }

  test("dump explodes patches; isValid enforces the 4-point triangle ring") {
    val parts = GeoOps.dump(Wkt.parse(tinWkt))
    assert(parts.length === 2 && parts.forall(_.typeName === "POLYGON"))
    assert(GeoOps.isValid(Wkt.parse(triWkt)))
    assert(!GeoOps.isValid(Triangle(Array(0, 0, 4, 0, 2, 2, 1, 1, 0, 0)))) // 5 pts
    assert(!GeoOps.isValid(Triangle(Array(0, 0, 4, 0, 2, 2, 1, 1)))) // open
  }

  test("MULTISURFACE parses to MultiPolygon (tagged and bare elements)") {
    val g = Wkt.parse(
      "MULTISURFACE (((0 0,1 0,1 1,0 1,0 0)), POLYGON ((2 0,3 0,3 1,2 1,2 0)))")
    assert(g.typeName === "MULTIPOLYGON")
    assert(math.abs(GeoOps.area(g) - 2.0) < 1e-12)
  }

  test("curve WKB types 8..12 linearize on read") {
    // full circle r=1 as CircularString → linearized ring length ≈ 2π
    val circ = Wkt.parse("CIRCULARSTRING (-1 0, 0 1, 1 0, 0 -1, -1 0)")
    val viaWkb = Wkb.read(Wkb.write(circ)) // written as LineString(2); sanity
    assert(math.abs(GeoOps.length(viaWkb) - 2 * math.Pi) < 0.01)
    // hand-build a WKB CurvePolygon (type 10) with one plain linear ring
    val ring = LineString(Array(0, 0, 2, 0, 2, 2, 0, 2, 0, 0))
    val inner = Wkb.write(ring)
    val buf = java.nio.ByteBuffer.allocate(1 + 4 + 4 + inner.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(10).putInt(1).put(inner)
    val cp = Wkb.read(buf.array())
    assert(cp.typeName === "POLYGON" && GeoOps.area(cp) === 4.0)
  }

  test("transforms preserve the surface node type") {
    val t = GeoOps.swapXY(Wkt.parse(tinWkt))
    assert(t.typeName === "TIN" && GeoOps.area(t) === 4.0)
    val p = GeoOps.to3857(Wkt.parse(triWkt))
    assert(p.typeName === "TRIANGLE")
  }
}
