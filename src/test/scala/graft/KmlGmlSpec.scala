package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** KML (ogr2kmlgeometry.cpp / kmlnode.cpp) and GML (ogr2gmlgeometry.cpp /
  * gml2ogrgeometry.cpp) fragment codec semantics. */
class KmlGmlSpec extends AnyFunSuite {

  private val ls = LineString(Array(0.1, -1e-7, 1234567.8901234567, 89.99999999))
  private val poly = Polygon(Array(
    Array(0.0, 0.0, 10.5, 0.0, 10.5, 7.25, 0.0, 0.0),
    Array(1.0, 1.0, 2.0, 1.0, 1.5, 2.0, 1.0, 1.0)))

  test("KML round-trip is lossless for point/line/polygon/multis") {
    val gs: Seq[Geom] = Seq(
      Point(3.5, -2.25), ls, poly,
      MultiPoint(Array(Point(1, 2), Point(-3.5, 4.25))),
      MultiLineString(Array(ls, LineString(Array(5.0, 6.0, 7.0, 8.0)))),
      MultiPolygon(Array(poly)))
    gs.foreach { g =>
      val rt = KmlGeom.parse(KmlGeom.write(g))
      assert(Wkt.write(rt) === Wkt.write(g), KmlGeom.write(g))
    }
  }

  test("GML round-trip is lossless and keeps collection types distinct") {
    val gs: Seq[Geom] = Seq(
      Point(3.5, -2.25), ls, poly,
      MultiPoint(Array(Point(1, 2))),
      MultiLineString(Array(ls)),
      MultiPolygon(Array(poly)),
      GeometryCollection(Array(Point(9, 10), ls)))
    gs.foreach { g =>
      val rt = GmlGeom.parse(GmlGeom.write(g))
      assert(Wkt.write(rt) === Wkt.write(g), GmlGeom.write(g))
    }
  }

  test("KML MultiGeometry coagulates: homogeneous members read as the Multi type") {
    // a GeometryCollection of all-points writes as MultiGeometry and reads
    // back MultiPoint — the KML model has one container (reference :301-321)
    val g = KmlGeom.parse(KmlGeom.write(GeometryCollection(Array(Point(1, 2), Point(3, 4)))))
    assert(g.isInstanceOf[MultiPoint])
    val mixed = KmlGeom.parse(KmlGeom.write(GeometryCollection(Array(Point(1, 2), ls))))
    assert(mixed.isInstanceOf[GeometryCollection])
  }

  test("KML writer element shapes match the reference (empty point = <Point/>)") {
    assert(KmlGeom.write(Point.Empty) === "<Point/>")
    assert(KmlGeom.write(Point(1, 2)) === "<Point><coordinates>1.0,2.0</coordinates></Point>")
    val k = KmlGeom.write(poly)
    assert(k.startsWith("<Polygon><outerBoundaryIs><LinearRing><coordinates>"))
    assert(k.contains("<innerBoundaryIs>"))
  }

  test("KML reader accepts namespaces, altitude tuples, and whitespace") {
    val g = KmlGeom.parse(
      """<kml:Point xmlns:kml="http://www.opengis.net/kml/2.2">
        |  <kml:coordinates> 1.5,2.5,100.0 </kml:coordinates>
        |</kml:Point>""".stripMargin)
    assert(Wkt.write(g) === "POINT (1.5 2.5)")
  }

  test("GML reader accepts GML3 pos/posList/exterior alongside GML2 forms") {
    val p = GmlGeom.parse("<gml:Point><gml:pos>1.5 2.5</gml:pos></gml:Point>")
    assert(Wkt.write(p) === "POINT (1.5 2.5)")
    val l = GmlGeom.parse(
      """<LineString><posList srsDimension="3">0 0 9 2 2 9</posList></LineString>""")
    assert(Wkt.write(l) === "LINESTRING (0 0,2 2)")
    val pg = GmlGeom.parse(
      """<Polygon><exterior><LinearRing><posList>0 0 4 0 4 4 0 0</posList>
        |</LinearRing></exterior></Polygon>""".stripMargin)
    assert(Wkt.write(pg) === "POLYGON ((0 0,4 0,4 4,0 0))")
    val ms = GmlGeom.parse(
      """<MultiSurface><surfaceMember><Polygon><exterior><LinearRing>
        |<posList>0 0 1 0 0 1 0 0</posList></LinearRing></exterior></Polygon>
        |</surfaceMember></MultiSurface>""".stripMargin)
    assert(ms.isInstanceOf[MultiPolygon])
  }

  test("malformed XML returns null, never throws") {
    Seq("", "<", "<Point>", "<Point><coordinates>1</coordinates></Point>",
        "<Whatever/>", "<Point/><Point/>",
        "<Polygon><outerBoundaryIs><NoRing/></outerBoundaryIs></Polygon>")
      .foreach { s =>
        assert(KmlGeom.parse(s) == null, s"kml: $s")
        assert(GmlGeom.parse(s) == null || s == "<Whatever/>", s"gml: $s")
      }
    assert(GmlGeom.parse("<Whatever/>") == null)
  }

  test("surfaces write as their MultiPolygon facets in both formats") {
    val tin = Tin(Array(Triangle(Array(0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0))))
    assert(KmlGeom.parse(KmlGeom.write(tin)).isInstanceOf[MultiPolygon])
    assert(GmlGeom.parse(GmlGeom.write(tin)).isInstanceOf[MultiPolygon])
  }
}
