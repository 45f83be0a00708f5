package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** GPX five-layer reader semantics (ogrgpxlayer.cpp, ogr_gpx.h). */
class GpxSpec extends AnyFunSuite {

  private val doc =
    """<?xml version="1.0"?>
      |<gpx version="1.1" creator="x">
      |  <wpt lat="10.5" lon="20.25"><name>a</name><ele>99</ele></wpt>
      |  <wpt lat="-1" lon="2"/>
      |  <rte>
      |    <rtept lat="0" lon="0"/><rtept lat="1" lon="1"/><rtept lat="2" lon="3"/>
      |  </rte>
      |  <trk>
      |    <trkseg><trkpt lat="5" lon="6"/><trkpt lat="7" lon="8"/></trkseg>
      |    <trkseg><trkpt lat="9" lon="10"/></trkseg>
      |  </trk>
      |</gpx>""".stripMargin

  test("five layers with the reference's lineage ids") {
    val fs = GpxGeom.parse(doc)
    assert(fs.count(_.layer == "waypoints") === 2)
    assert(fs.count(_.layer == "routes") === 1)
    assert(fs.count(_.layer == "route_points") === 3)
    assert(fs.count(_.layer == "tracks") === 1)
    assert(fs.count(_.layer == "track_points") === 3)
    // waypoint geometry is (lon, lat) — x/y order, elevation dropped
    val w0 = fs.find(f => f.layer == "waypoints" && f.fid == 0).get
    assert(Wkt.write(w0.geom) === "POINT (20.25 10.5)")
    // route is one LineString over its rtepts
    val r = fs.find(_.layer == "routes").get.geom.asInstanceOf[LineString]
    assert(r.numPoints === 3 && r.x(2) === 3.0 && r.y(2) === 2.0)
    // track is a MultiLineString, one part per trkseg
    val t = fs.find(_.layer == "tracks").get.geom.asInstanceOf[MultiLineString]
    assert(t.lines.length === 2)
    assert(t.lines(0).numPoints === 2 && t.lines(1).numPoints === 1)
    // track_points carry (track_fid, track_seg_id, track_seg_point_id)
    val tp = fs.filter(_.layer == "track_points")
    assert(tp.map(f => (f.id1, f.id2, f.id3)).toSeq === Seq((0, 0, 0), (0, 0, 1), (0, 1, 0)))
    // route_points carry (route_fid, -1, point_id)
    val rp = fs.filter(_.layer == "route_points")
    assert(rp.map(f => (f.id1, f.id2, f.id3)).toSeq === Seq((0, -1, 0), (0, -1, 1), (0, -1, 2)))
  }

  test("empty gpx yields no features; non-gpx root and malformed input yield none") {
    assert(GpxGeom.parse("""<gpx version="1.1"/>""").isEmpty)
    assert(GpxGeom.parse("""<kml/>""").isEmpty)
    assert(GpxGeom.parse("""<gpx><wpt lon="1"/></gpx>""").isEmpty) // missing lat
    assert(GpxGeom.parse("not xml").isEmpty)
  }
}
