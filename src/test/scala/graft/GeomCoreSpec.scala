package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._
import graft.cell.{CellId, Hilbert}

class GeomCoreSpec extends AnyFunSuite {

  // ----------------------------------------------------------- WKT / WKB

  test("WKT point round-trip") {
    val g = Wkt.parse("POINT (2.1 48.9)")
    assert(g == Point(2.1, 48.9))
    assert(Wkt.write(g) == "POINT (2.1 48.9)")
  }

  test("WKT polygon with hole round-trip via WKB") {
    val wkt = "POLYGON ((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"
    val g = Wkt.parse(wkt)
    val g2 = Wkb.read(Wkb.write(g))
    assert(Wkt.write(g2) == wkt)
  }

  test("WKT handles Z and EMPTY") {
    assert(Wkt.parse("POINT Z (1 2 3)") == Point(1, 2))
    assert(Wkt.parse("POINT (1 2 3)") == Point(1, 2)) // undeclared z tolerated
    assert(Wkt.parse("POINT EMPTY").isEmpty)
    assert(Wkt.parse("POLYGON EMPTY").isEmpty)
    assert(Wkt.parse("MULTIPOINT ((1 2),(3 4))").asInstanceOf[MultiPoint].points.length == 2)
    assert(Wkt.parse("MULTIPOINT (1 2,3 4)").asInstanceOf[MultiPoint].points.length == 2)
  }

  test("WKT linearizes CIRCULARSTRING; other curve types rejected") {
    // semicircle radius 1 through (0,0)-(1,1)-(2,0): 45 chords, closed-form length
    val g = Wkt.parse("CIRCULARSTRING (0 0,1 1,2 0)").asInstanceOf[LineString]
    assert(g.numPoints == 46)
    assert(math.abs(GeoOps.length(g) - 90.0 * math.sin(math.Pi / 90.0)) < 1e-9)
    // COMPOUNDCURVE concatenates segments, deduping the shared joint
    val cc = Wkt.parse("COMPOUNDCURVE ((0 0,1 0), CIRCULARSTRING (1 0,2 1,3 0))")
      .asInstanceOf[LineString]
    assert(cc.numPoints == 2 + 45) // 2 straight + 45 arc chords (joint deduped)
    // CURVEPOLYGON with a compound ring closes into a polygon
    val cp = Wkt.parse("CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (-1 0,0 1,1 0), (1 0,-1 0)))")
      .asInstanceOf[Polygon]
    assert(math.abs(GeoOps.area(cp) - 0.5 * 45.0 * math.sin(math.Pi / 45.0)) < 1e-9)
    // surface types now parse (SurfaceSpec); malformed input still rejects
    val e = intercept[IllegalArgumentException](Wkt.parse("FROB ((0 0,1 0,0 1,0 0))"))
    assert(e.getMessage.contains("unknown geometry type"))
  }

  test("WKB multi geometries round-trip") {
    for (wkt <- Seq(
      "MULTILINESTRING ((0 0,1 1),(2 2,3 3,4 4))",
      "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,1 1))")) {
      assert(Wkt.write(Wkb.read(Wkb.write(Wkt.parse(wkt)))) == wkt)
    }
  }

  test("WKB big-endian read") {
    // big-endian POINT(1 2): 00 00000001 3ff0000000000000 4000000000000000
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte); be.putInt(1); be.putDouble(1.0); be.putDouble(2.0)
    assert(Wkb.read(be.array()) == Point(1, 2))
  }

  // ----------------------------------------------------------- PIP (FIXTURES.md §7)

  private val square = Wkt.parse("POLYGON ((0 0,10 0,10 10,0 10,0 0))").asInstanceOf[Polygon]

  test("PIP: strictly inside / outside simple square") {
    assert(GeoOps.polygonContains(square, 5, 5))
    assert(!GeoOps.polygonContains(square, 15, 5))
    assert(!GeoOps.polygonContains(square, -0.001, 5))
  }

  test("PIP: inside envelope but outside concave ring") {
    // U-shape: envelope [0,10]x[0,10], notch from x=3..7 down from the top
    val u = Wkt.parse("POLYGON ((0 0,10 0,10 10,7 10,7 3,3 3,3 10,0 10,0 0))").asInstanceOf[Polygon]
    assert(u.envelope.contains(5, 8))
    assert(!GeoOps.polygonContains(u, 5, 8)) // in the notch
    assert(GeoOps.polygonContains(u, 5, 1))  // in the base
    assert(GeoOps.polygonContains(u, 1.5, 8)) // in the left arm
  }

  test("PIP: point inside a hole is outside") {
    val withHole = Wkt.parse("POLYGON ((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))").asInstanceOf[Polygon]
    assert(!GeoOps.polygonContains(withHole, 5, 5))
    assert(GeoOps.polygonContains(withHole, 2, 2))
    // on hole boundary: not contained, but still intersects
    assert(GeoOps.polygonIntersectsPoint(withHole, 4, 5))
  }

  test("PIP: boundary membership via isPointOnRingBoundary") {
    val ring = square.exterior
    assert(GeoOps.isPointOnRingBoundary(ring, 5, 0, true))   // on edge
    assert(GeoOps.isPointOnRingBoundary(ring, 10, 10, true)) // on vertex
    assert(!GeoOps.isPointOnRingBoundary(ring, 5, 5, true))
    // ray rule on edges is strict (>0 crossing, ogrlinearring.cpp:507)
    assert(GeoOps.polygonIntersectsPoint(square, 5, 0))
  }

  test("PIP: ring orientation invariance") {
    val cw = Wkt.parse("POLYGON ((0 0,0 10,10 10,10 0,0 0))").asInstanceOf[Polygon]
    assert(GeoOps.polygonContains(cw, 5, 5))
    assert(!GeoOps.polygonContains(cw, 15, 5))
  }

  // ----------------------------------------------------------- measures

  test("great-circle: quarter meridian (law of cosines, ogr_geo_utils.cpp:33-46)") {
    val d = GeoOps.greatCircle(0, 0, 90, 0, 6378137.0)
    assert(math.abs(d - math.Pi / 2 * 6378137.0) < 1e-6)
    assert(GeoOps.greatCircle(48.9, 2.1, 48.9, 2.1) == 0.0)
    // antipodal clamps instead of NaN
    assert(!GeoOps.greatCircle(0, 0, 0, 180).isNaN)
  }

  test("area / length / centroid") {
    assert(GeoOps.area(square) == 100.0)
    val withHole = Wkt.parse("POLYGON ((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
    assert(GeoOps.area(withHole) == 96.0)
    assert(GeoOps.length(Wkt.parse("LINESTRING (0 0,3 4)")) == 5.0)
    val c = GeoOps.centroid(square)
    assert(math.abs(c.x - 5) < 1e-12 && math.abs(c.y - 5) < 1e-12)
  }

  test("simplify drops collinear, keeps corners; segmentize densifies") {
    val l = Wkt.parse("LINESTRING (0 0,1 0,2 0,2 5,2 10)").asInstanceOf[LineString]
    val s = GeoOps.simplify(l, 0.01).asInstanceOf[LineString]
    assert(s.numPoints == 3) // (0 0), (2 0), (2 10)
    val seg = GeoOps.segmentizeLine(Array(0, 0, 10, 0), 3.0)
    assert(seg.length / 2 == 5) // 0, 2.5, 5, 7.5, 10
  }

  test("convex hull of scattered points") {
    val mp = Wkt.parse("MULTIPOINT ((0 0),(10 0),(10 10),(0 10),(5 5),(2 3))")
    val hull = GeoOps.convexHull(mp).asInstanceOf[Polygon]
    assert(GeoOps.ringArea(hull.exterior) == 100.0)
  }

  test("clip polygon to rect (Sutherland-Hodgman)") {
    val clipped = GeoOps.clipToRect(square, Envelope(5, 5, 15, 15)).asInstanceOf[Polygon]
    assert(GeoOps.area(clipped) == 25.0)
    val gone = GeoOps.clipToRect(square, Envelope(20, 20, 30, 30)).asInstanceOf[Polygon]
    assert(gone.isEmpty)
  }

  test("distance point/line/polygon") {
    assert(GeoOps.distance(Point(0, 0), Point(3, 4)) == 5.0)
    assert(GeoOps.distance(Point(0, 5), Wkt.parse("LINESTRING (5 0,5 10)")) == 5.0)
    assert(GeoOps.distance(Point(5, 5), square) == 0.0)
    assert(GeoOps.distance(Point(15, 5), square) == 5.0)
  }

  // ----------------------------------------------------------- mercator / cells

  test("mercator worked golden (FIXTURES.md §4): (0,0,z=1) -> XYZ (0,1)") {
    assert(Mercator.lonToX(0) == 0.0)
    assert(math.abs(Mercator.latToY(0)) < 1e-9)
    assert(Mercator.metersToPixelX(0, 1) == 256.0)
    assert(Mercator.pixelToTileTms(256.0) == 0)
    assert(Mercator.lonLatToTileX(0, 1) == 0)
    assert(Mercator.lonLatToTileY(0, 1) == 1)
  }

  test("mercator known tiles") {
    // Paris (2.35, 48.85) at z=10 is tile (518, 352) (slippy-map convention)
    assert(Mercator.lonLatToTileX(2.35, 10) == 518)
    assert(Mercator.lonLatToTileY(48.85, 10) == 352)
    // inverse round-trip
    assert(math.abs(Mercator.yToLat(Mercator.latToY(48.85)) - 48.85) < 1e-9)
    assert(math.abs(Mercator.xToLon(Mercator.lonToX(2.35)) - 2.35) < 1e-12)
  }

  test("tileRange (GetTileIndices floor+1e-3 semantics) brackets the point tile") {
    val e = Envelope(2.0, 48.0, 3.0, 49.0)
    val (minX, minY, maxX, maxY) = Mercator.tileRangeLonLat(e, 10)
    assert(minX <= 518 && 518 <= maxX)
    assert(minY <= 352 && 352 <= maxY)
    // whole world at z=0 is the single tile
    assert(Mercator.tileRangeLonLat(Envelope(-180, -85, 180, 85), 0) == ((0, 0, 0, 0)))
  }

  test("quadkey (gdal2tiles QuadTree semantics)") {
    // tile (0,0) z=1 top-left => digit 0; (1,1) => 3
    assert(Mercator.quadKey(1, 0, 0) == "0")
    assert(Mercator.quadKey(1, 1, 0) == "1")
    assert(Mercator.quadKey(1, 0, 1) == "2")
    assert(Mercator.quadKey(1, 1, 1) == "3")
    assert(Mercator.quadKey(3, 3, 5) == "213")
  }

  test("cell pack/unpack/parent/children/ring") {
    val c = CellId.pack(10, 518, 352)
    assert(CellId.zoom(c) == 10 && CellId.x(c) == 518 && CellId.y(c) == 352)
    assert(CellId.parent(c) == CellId.pack(9, 259, 176))
    assert(CellId.children(CellId.parent(c)).contains(c))
    assert(CellId.parentAt(c, 8) == CellId.pack(8, 129, 88))
    val r1 = CellId.ring(c, 1)
    assert(r1.length == 8)
    assert(r1.forall(n => math.abs(CellId.x(n) - 518) <= 1 && math.abs(CellId.y(n) - 352) <= 1))
    assert(CellId.disk(c, 1).length == 9)
    // antimeridian wrap
    val edge = CellId.pack(3, 0, 4)
    assert(CellId.ring(edge, 1).exists(n => CellId.x(n) == 7))
    // pole clamp: no y < 0 cells
    val top = CellId.pack(3, 4, 0)
    assert(CellId.ring(top, 1).forall(n => CellId.y(n) >= 0))
    assert(CellId.ring(top, 1).length == 5)
  }

  test("cell cover of envelope is sorted, distinct, and consistent with point cells") {
    val poly = Wkt.parse("POLYGON ((2 48,3 48,3 49,2 49,2 48))")
    val cover = CellId.cover(poly, 10)
    assert(cover.sorted.sameElements(cover))
    assert(cover.distinct.length == cover.length)
    // the cell of an interior point must be in the cover
    val pc = CellId.fromLonLat(2.35, 48.85, 10)
    assert(cover.contains(pc))
  }

  test("cell fromLonLat matches mercator tile math at several zooms") {
    for (z <- Seq(0, 1, 5, 10, 15); (lon, lat) <- Seq((0.0, 0.0), (2.35, 48.85), (-122.4, 37.77), (179.9, -84.9))) {
      val c = CellId.fromLonLat(lon, lat, z)
      assert(CellId.zoom(c) == z)
      assert(CellId.x(c) == Mercator.lonLatToTileX(lon, z))
      assert(CellId.y(c) == Mercator.lonLatToTileY(lat, z))
    }
  }

  // ----------------------------------------------------------- hilbert

  test("hilbert code matches an independent iterative xy2d oracle") {
    // classic iterative Hilbert xy2d for a 2^16 grid (public-domain algorithm)
    def xy2d(xIn: Int, yIn: Int): Long = {
      var rx = 0; var ry = 0
      var x = xIn; var y = yIn
      var d = 0L
      var s = 1 << 15
      while (s > 0) {
        rx = if ((x & s) > 0) 1 else 0
        ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s.toLong * ((3 * rx) ^ ry)
        // rotate
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    for ((x, y) <- Seq((0, 0), (1, 0), (1, 1), (0, 1), (12345, 54321), (65534, 2), (40000, 40000)))
      assert(Hilbert.code(x, y) == xy2d(x, y), s"($x,$y)")
  }

  test("hilbert envelope scaling (round, MAX=2^16-2)") {
    val dom = Envelope(0, 0, 100, 100)
    assert(Hilbert.code(dom, 0, 0) == Hilbert.code(0, 0))
    assert(Hilbert.code(dom, 100, 100) == Hilbert.code(65534, 65534))
    assert(Hilbert.code(dom, 50, 50) == Hilbert.code(32767, 32767))
  }
}
