package graft.geom

import scala.collection.mutable.ArrayBuffer

/** GPX reader — the reference GPX driver's five-layer model
  * (/root/reference/ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp, ogr_gpx.h):
  * a GPX document exposes `waypoints` (each <wpt> → Point), `routes`
  * (each <rte> → LineString over its <rtept>s), `tracks` (each <trk> →
  * MultiLineString, one LineString per <trkseg>), plus the exploded
  * `route_points` / `track_points` point layers with their
  * (route_fid/track_fid, track_seg_id, track_seg_point_id) lineage —
  * exactly the reference's short-name id fields (ogr_gpx.h:93-97).
  *
  * Coordinates live in lat/lon ATTRIBUTES (not element text — the
  * opposite convention of KML); output geometry is (lon, lat) x/y like
  * the reference layer. Elevation <ele> children are ignored (XY model).
  * Malformed input → empty result from `tryParse`/null from helpers,
  * never a throw. */
object GpxGeom {

  /** One feature row: (layer, fid within layer, parent ids, geometry).
    * ids = (route_fid | track_fid, track_seg_id, track_seg_point_id) with
    * -1 for not-applicable, matching the reference's point layers. */
  final case class Feature(layer: String, fid: Int,
                           id1: Int, id2: Int, id3: Int, geom: Geom)

  def parse(xml: String): Array[Feature] =
    try {
      val root = XmlLite.parse(xml)
      if (root.name != "gpx") return Array.empty
      val out = new ArrayBuffer[Feature]()
      var wptFid = 0
      root.childSeq("wpt").foreach { w =>
        out += Feature("waypoints", wptFid, -1, -1, -1, pointOf(w))
        wptFid += 1
      }
      var rteFid = 0
      var rptFid = 0
      root.childSeq("rte").foreach { r =>
        val pts = r.childSeq("rtept").map(pointOf)
        out += Feature("routes", rteFid, -1, -1, -1,
          LineString(flat(pts)))
        var i = 0
        while (i < pts.length) {
          out += Feature("route_points", rptFid, rteFid, -1, i, pts(i))
          rptFid += 1
          i += 1
        }
        rteFid += 1
      }
      var trkFid = 0
      var tptFid = 0
      root.childSeq("trk").foreach { t =>
        val segs = t.childSeq("trkseg")
        out += Feature("tracks", trkFid, -1, -1, -1,
          MultiLineString(segs.map(sg => LineString(flat(sg.childSeq("trkpt").map(pointOf))))))
        var si = 0
        while (si < segs.length) {
          val pts = segs(si).childSeq("trkpt").map(pointOf)
          var pi = 0
          while (pi < pts.length) {
            out += Feature("track_points", tptFid, trkFid, si, pi, pts(pi))
            tptFid += 1
            pi += 1
          }
          si += 1
        }
        trkFid += 1
      }
      out.toArray
    } catch { case _: Exception => Array.empty }

  private def pointOf(n: XmlLite.Node): Point = {
    val lat = n.attrs.getOrElse("lat", throw new IllegalArgumentException("lat"))
    val lon = n.attrs.getOrElse("lon", throw new IllegalArgumentException("lon"))
    Point(java.lang.Double.parseDouble(lon.trim), java.lang.Double.parseDouble(lat.trim))
  }

  private def flat(pts: Array[Point]): Array[Double] = {
    val out = new Array[Double](pts.length * 2)
    var i = 0
    while (i < pts.length) { out(2 * i) = pts(i).x; out(2 * i + 1) = pts(i).y; i += 1 }
    out
  }
}
