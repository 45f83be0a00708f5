package graft.geom

import scala.collection.mutable.ArrayBuffer

/** KML geometry codec — OGC KML 2.2 §10 geometry elements, exactly the
  * subset the reference's KML driver handles (writer
  * /root/reference/ogr/ogr2kmlgeometry.cpp OGR2KMLGeometryAppend; reader
  * ogr/ogrsf_frmts/kml/kmlnode.cpp Geometry elements).
  *
  * Shapes: Point / LineString / LinearRing / Polygon (outerBoundaryIs +
  * innerBoundaryIs, each wrapping a LinearRing) / MultiGeometry (the KML
  * container for every multi type AND GeometryCollection — KML does not
  * distinguish them, reference :301-321, so Multi* write as MultiGeometry
  * and MultiGeometry reads back as the most specific type its members
  * allow: all-Point → MultiPoint, all-LineString → MultiLineString,
  * all-Polygon → MultiPolygon, else GeometryCollection, matching the
  * driver's coagulation). Coordinates are lon,lat[,alt] tuples separated
  * by whitespace (reference AppendCoordinateList :139-165); altitude is
  * accepted on read and dropped (the [[Geom]] XY model), and writes omit
  * it. Numbers print with the shortest round-trip repr (the codec's
  * losslessness convention — GeoJson.scala has the same documented
  * deviation from the reference's fixed %.15g buffers).
  *
  * An empty point writes `<Point/>` (reference :188). Parse errors and
  * unknown elements → null, never a throw. */
object KmlGeom {

  // ---------------------------------------------------------------- write

  def write(g: Geom): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, sb)
    sb.toString
  }

  private def num(v: Double, sb: java.lang.StringBuilder): Unit =
    sb.append(java.lang.Double.toString(v))

  private def coords(cs: Array[Double], sb: java.lang.StringBuilder): Unit = {
    sb.append("<coordinates>")
    var i = 0
    while (i < cs.length / 2) {
      if (i > 0) sb.append(' ')
      num(cs(2 * i), sb); sb.append(','); num(cs(2 * i + 1), sb)
      i += 1
    }
    sb.append("</coordinates>")
  }

  private def ring(cs: Array[Double], sb: java.lang.StringBuilder): Unit = {
    sb.append("<LinearRing>"); coords(cs, sb); sb.append("</LinearRing>")
  }

  private def writeGeom(g: Geom, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      if (p.isEmpty) sb.append("<Point/>")
      else {
        sb.append("<Point><coordinates>")
        num(p.x, sb); sb.append(','); num(p.y, sb)
        sb.append("</coordinates></Point>")
      }
    case l: LineString =>
      sb.append("<LineString>"); coords(l.coords, sb); sb.append("</LineString>")
    case pg: Polygon =>
      sb.append("<Polygon>")
      if (!pg.isEmpty) {
        sb.append("<outerBoundaryIs>"); ring(pg.rings(0), sb); sb.append("</outerBoundaryIs>")
        var i = 1
        while (i < pg.rings.length) {
          sb.append("<innerBoundaryIs>"); ring(pg.rings(i), sb); sb.append("</innerBoundaryIs>")
          i += 1
        }
      }
      sb.append("</Polygon>")
    case mp: MultiPoint =>
      sb.append("<MultiGeometry>")
      mp.points.foreach(writeGeom(_, sb))
      sb.append("</MultiGeometry>")
    case ml: MultiLineString =>
      sb.append("<MultiGeometry>")
      ml.lines.foreach(writeGeom(_, sb))
      sb.append("</MultiGeometry>")
    case mg: MultiPolygon =>
      sb.append("<MultiGeometry>")
      mg.polys.foreach(writeGeom(_, sb))
      sb.append("</MultiGeometry>")
    case gc: GeometryCollection =>
      sb.append("<MultiGeometry>")
      gc.geoms.foreach(writeGeom(_, sb))
      sb.append("</MultiGeometry>")
    case s: Surface => writeGeom(s.toMulti, sb)
  }

  // ---------------------------------------------------------------- parse

  def parse(s: String): Geom =
    try toGeom(XmlLite.parse(s)) catch { case _: Exception => null }

  /** coordinates text: whitespace-separated lon,lat[,alt] tuples. */
  private def parseCoords(t: String): Array[Double] = {
    val toks = t.trim.split("\\s+").filter(_.nonEmpty)
    val out = new Array[Double](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val parts = toks(i).split(",")
      if (parts.length < 2) throw new IllegalArgumentException("tuple")
      out(2 * i) = java.lang.Double.parseDouble(parts(0))
      out(2 * i + 1) = java.lang.Double.parseDouble(parts(1))
      i += 1
    }
    out
  }

  private def coordsOf(n: XmlLite.Node): Array[Double] = n.child("coordinates") match {
    case Some(c) => parseCoords(c.text)
    case None => Array.empty
  }

  private def ringOf(n: XmlLite.Node): Array[Double] = n.child("LinearRing") match {
    case Some(r) => coordsOf(r)
    case None => throw new IllegalArgumentException("LinearRing expected")
  }

  private def toGeom(n: XmlLite.Node): Geom = n.name match {
    case "Point" =>
      val cs = coordsOf(n)
      if (cs.isEmpty) Point.Empty else Point(cs(0), cs(1))
    case "LineString" | "LinearRing" => LineString(coordsOf(n))
    case "Polygon" =>
      val rs = new ArrayBuffer[Array[Double]]()
      n.child("outerBoundaryIs").foreach(o => rs += ringOf(o))
      n.childSeq("innerBoundaryIs").foreach(i => rs += ringOf(i))
      Polygon(rs.toArray)
    case "MultiGeometry" =>
      val gs = n.children.map(toGeom)
      if (gs.contains(null)) null
      else if (gs.nonEmpty && gs.forall(_.isInstanceOf[Point]))
        MultiPoint(gs.map(_.asInstanceOf[Point]))
      else if (gs.nonEmpty && gs.forall(_.isInstanceOf[LineString]))
        MultiLineString(gs.map(_.asInstanceOf[LineString]))
      else if (gs.nonEmpty && gs.forall(_.isInstanceOf[Polygon]))
        MultiPolygon(gs.map(_.asInstanceOf[Polygon]))
      else GeometryCollection(gs)
    case _ => null
  }
}
