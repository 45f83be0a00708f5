package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** RFC 7946 codec semantics (reference driver ogr/ogrsf_frmts/geojson/):
  * lossless round-trip, reader tolerance, writer precision mode. */
class GeoJsonSpec extends AnyFunSuite {

  private def rt(g: Geom): Geom = GeoJson.parse(GeoJson.write(g))

  private def assertSame(a: Geom, b: Geom): Unit =
    assert(Wkt.write(a) === Wkt.write(b))

  test("round-trip is lossless for every geometry type, awkward doubles included") {
    val pts = Array(0.1, -1e-7, 1234567.8901234567, 89.99999999, 1e21, -180.0)
    val ls = LineString(pts)
    val poly = Polygon(Array(
      Array(0.0, 0.0, 10.5, 0.0, 10.5, 7.25, 0.0, 0.0),
      Array(1.0, 1.0, 2.0, 1.0, 1.5, 2.0, 1.0, 1.0)))
    val gs: Seq[Geom] = Seq(
      Point(3.14159265358979, -2.718281828459045),
      ls, poly,
      MultiPoint(Array(Point(1, 2), Point(-3.5, 4.25))),
      MultiLineString(Array(ls, LineString(Array(5.0, 6.0, 7.0, 8.0)))),
      MultiPolygon(Array(poly, Polygon(Array(Array(0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0))))),
      GeometryCollection(Array(Point(9, 10), ls)))
    gs.foreach(g => assertSame(rt(g), g))
  }

  test("empty point writes [] and parses back empty") {
    val j = GeoJson.write(Point.Empty)
    assert(j === """{"type":"Point","coordinates":[]}""")
    assert(GeoJson.parse(j).isEmpty)
  }

  test("reader tolerates member order, whitespace, bbox/foreign members, Z ordinates") {
    val g = GeoJson.parse(
      """ { "bbox" : [0,0,2,2], "coordinates" : [ [ 0,0,5 ] , [ 2 , 2 , 7 ] ],
        |   "custom" : {"nested": [1, "x", null, true]},
        |   "type" : "LineString" } """.stripMargin)
    assert(g.isInstanceOf[LineString])
    assert(Wkt.write(g) === "LINESTRING (0 0,2 2)")
  }

  test("Feature objects unwrap to their geometry (OGRGeoJSONReadGeometry parity)") {
    val g = GeoJson.parse(
      """{"type":"Feature","properties":{"name":"a \"quoted\" name"},
        |"geometry":{"type":"Point","coordinates":[1.5,2.5]}}""".stripMargin)
    assert(Wkt.write(g) === "POINT (1.5 2.5)")
    assert(GeoJson.parse("""{"type":"Feature","geometry":null}""") == null)
  }

  test("malformed input returns null, never throws") {
    Seq("", "{", """{"type":"Point"}""", """{"type":"Nope","coordinates":[]}""",
        """{"type":"Point","coordinates":[1]}""", "[1,2]",
        """{"type":"Polygon","coordinates":[[[1,"x"]]]}""",
        """{"type":"Point","coordinates":[1,2]} trailing""")
      .foreach(s => assert(GeoJson.parse(s) == null, s))
  }

  test("precision mode truncates with trailing-zero trim (OGRFormatDouble semantics)") {
    val j = GeoJson.write(Point(1.23456789012, -2.5), 7)
    assert(j === """{"type":"Point","coordinates":[1.2345679,-2.5]}""")
    val j2 = GeoJson.write(Point(3.0, 4.10), 7)
    assert(j2 === """{"type":"Point","coordinates":[3,4.1]}""")
  }

  test("surfaces write as MultiPolygon (GeoJSON has no surface types)") {
    val tin = Tin(Array(Triangle(Array(0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0))))
    val g = rt(tin)
    assert(g.isInstanceOf[MultiPolygon])
    assert(Wkt.write(g) === Wkt.write(tin.toMulti))
  }

  test("GeometryCollection with a malformed member rejects the whole input") {
    assert(GeoJson.parse(
      """{"type":"GeometryCollection","geometries":[
        |{"type":"Point","coordinates":[1,2]},{"type":"Bad"}]}""".stripMargin) == null)
  }
}
