package graft.geom

import scala.collection.mutable.ArrayBuffer

/** GML geometry codec — the reference's GML2/GML3 geometry fragment
  * algorithms (writer /root/reference/ogr/ogr2gmlgeometry.cpp
  * OGR2GMLGeometryAppend, GML2 form; reader ogr/gml2ogrgeometry.cpp
  * GML2OGRGeometry_XMLNode, which accepts GML2 and GML3 constructs
  * interchangeably).
  *
  * Writer emits the GML2 profile exactly as the reference's default path:
  * `<gml:Point><gml:coordinates>x,y</gml:coordinates></gml:Point>`,
  * LineString likewise, Polygon with `outerBoundaryIs`/`innerBoundaryIs`
  * LinearRings (:294-315), and the four multi containers with their
  * member elements (`MultiPolygon`/`polygonMember`,
  * `MultiLineString`/`lineStringMember`, `MultiPoint`/`pointMember`,
  * `MultiGeometry`/`geometryMember`, :322-360). GML2 coordinates are
  * comma-within-tuple, space-between-tuples.
  *
  * Reader additionally accepts the GML3 constructs the reference does:
  * `pos` (space-separated single position, :433-489), `posList`
  * (flat space-separated list with optional srsDimension attribute,
  * :532+), and `exterior`/`interior` ring wrappers (the GML3 names for
  * outer/innerBoundaryIs). Namespace prefixes are stripped
  * (BareGMLElement). srsName axis-order interpretation is NOT applied
  * (the reference's default without GML_INVERT_AXIS). Z ordinates
  * (3-tuples / srsDimension=3) are accepted and dropped per the [[Geom]]
  * XY model. Malformed input → null. */
object GmlGeom {

  // ---------------------------------------------------------------- write

  def write(g: Geom): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, sb)
    sb.toString
  }

  private def num(v: Double, sb: java.lang.StringBuilder): Unit =
    sb.append(java.lang.Double.toString(v))

  private def coords(cs: Array[Double], sb: java.lang.StringBuilder): Unit = {
    sb.append("<gml:coordinates>")
    var i = 0
    while (i < cs.length / 2) {
      if (i > 0) sb.append(' ')
      num(cs(2 * i), sb); sb.append(','); num(cs(2 * i + 1), sb)
      i += 1
    }
    sb.append("</gml:coordinates>")
  }

  private def ring(cs: Array[Double], sb: java.lang.StringBuilder): Unit = {
    sb.append("<gml:LinearRing>"); coords(cs, sb); sb.append("</gml:LinearRing>")
  }

  private def member(tag: String, g: Geom, sb: java.lang.StringBuilder): Unit = {
    sb.append('<').append(tag).append('>')
    writeGeom(g, sb)
    sb.append("</").append(tag).append('>')
  }

  private def writeGeom(g: Geom, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("<gml:Point>")
      if (!p.isEmpty) coords(Array(p.x, p.y), sb)
      sb.append("</gml:Point>")
    case l: LineString =>
      sb.append("<gml:LineString>"); coords(l.coords, sb); sb.append("</gml:LineString>")
    case pg: Polygon =>
      sb.append("<gml:Polygon>")
      if (!pg.isEmpty) {
        sb.append("<gml:outerBoundaryIs>"); ring(pg.rings(0), sb)
        sb.append("</gml:outerBoundaryIs>")
        var i = 1
        while (i < pg.rings.length) {
          sb.append("<gml:innerBoundaryIs>"); ring(pg.rings(i), sb)
          sb.append("</gml:innerBoundaryIs>")
          i += 1
        }
      }
      sb.append("</gml:Polygon>")
    case mp: MultiPoint =>
      sb.append("<gml:MultiPoint>")
      mp.points.foreach(member("gml:pointMember", _, sb))
      sb.append("</gml:MultiPoint>")
    case ml: MultiLineString =>
      sb.append("<gml:MultiLineString>")
      ml.lines.foreach(member("gml:lineStringMember", _, sb))
      sb.append("</gml:MultiLineString>")
    case mg: MultiPolygon =>
      sb.append("<gml:MultiPolygon>")
      mg.polys.foreach(member("gml:polygonMember", _, sb))
      sb.append("</gml:MultiPolygon>")
    case gc: GeometryCollection =>
      sb.append("<gml:MultiGeometry>")
      gc.geoms.foreach(member("gml:geometryMember", _, sb))
      sb.append("</gml:MultiGeometry>")
    case s: Surface => writeGeom(s.toMulti, sb)
  }

  // ---------------------------------------------------------------- parse

  def parse(s: String): Geom =
    try toGeom(XmlLite.parse(s)) catch { case _: Exception => null }

  /** GML2 coordinates: "x,y x,y"; also tolerates the reader's cs/ts
    * defaults only (no custom separators — reference default path). */
  private def parseCoordinates(t: String): Array[Double] = {
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

  /** GML3 posList: flat whitespace list, stride = srsDimension (default 2,
    * gml2ogrgeometry.cpp:538-560); x,y kept, z dropped. */
  private def parsePosList(t: String, dim: Int): Array[Double] = {
    val toks = t.trim.split("\\s+").filter(_.nonEmpty)
    if (dim < 2 || toks.length % dim != 0) throw new IllegalArgumentException("posList")
    val n = toks.length / dim
    val out = new Array[Double](n * 2)
    var i = 0
    while (i < n) {
      out(2 * i) = java.lang.Double.parseDouble(toks(i * dim))
      out(2 * i + 1) = java.lang.Double.parseDouble(toks(i * dim + 1))
      i += 1
    }
    out
  }

  /** Coordinate content of a Point/LineString/LinearRing node, accepting
    * coordinates (GML2), pos (GML3 single), posList (GML3 list). */
  private def coordsOf(n: XmlLite.Node): Array[Double] = {
    n.child("coordinates") match {
      case Some(c) => return parseCoordinates(c.text)
      case None =>
    }
    n.child("posList") match {
      case Some(c) =>
        val dim = c.attrs.get("srsDimension").map(_.trim.toInt).getOrElse(2)
        return parsePosList(c.text, dim)
      case None =>
    }
    val ps = n.childSeq("pos")
    if (ps.nonEmpty) {
      val out = new Array[Double](ps.length * 2)
      var i = 0
      while (i < ps.length) {
        val toks = ps(i).text.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.length < 2) throw new IllegalArgumentException("pos")
        out(2 * i) = java.lang.Double.parseDouble(toks(0))
        out(2 * i + 1) = java.lang.Double.parseDouble(toks(1))
        i += 1
      }
      return out
    }
    Array.empty
  }

  private def ringOf(n: XmlLite.Node): Array[Double] = n.child("LinearRing") match {
    case Some(r) => coordsOf(r)
    case None => throw new IllegalArgumentException("LinearRing expected")
  }

  private def membersOf(n: XmlLite.Node, tag: String): Array[Geom] = {
    val out = new ArrayBuffer[Geom]()
    n.childSeq(tag).foreach { m =>
      m.children.foreach { c =>
        val g = toGeom(c)
        if (g == null) throw new IllegalArgumentException(s"bad $tag")
        out += g
      }
    }
    // GML3 "members" plural containers are also accepted (reference
    // FindBareXMLChild walks both; e.g. MultiSurface/surfaceMembers)
    n.childSeq(tag + "s").foreach { m =>
      m.children.foreach { c =>
        val g = toGeom(c)
        if (g == null) throw new IllegalArgumentException(s"bad ${tag}s")
        out += g
      }
    }
    out.toArray
  }

  private def toGeom(n: XmlLite.Node): Geom = n.name match {
    case "Point" =>
      val cs = coordsOf(n)
      if (cs.isEmpty) Point.Empty else Point(cs(0), cs(1))
    case "LineString" | "LinearRing" => LineString(coordsOf(n))
    case "Polygon" =>
      val rs = new ArrayBuffer[Array[Double]]()
      n.child("outerBoundaryIs").orElse(n.child("exterior"))
        .foreach(o => rs += ringOf(o))
      (n.childSeq("innerBoundaryIs") ++ n.childSeq("interior"))
        .foreach(i => rs += ringOf(i))
      Polygon(rs.toArray)
    case "MultiPoint" =>
      MultiPoint(membersOf(n, "pointMember").map {
        case p: Point => p
        case _ => throw new IllegalArgumentException("pointMember")
      })
    case "MultiLineString" | "MultiCurve" =>
      val tag = if (n.name == "MultiCurve") "curveMember" else "lineStringMember"
      MultiLineString(membersOf(n, tag).map {
        case l: LineString => l
        case _ => throw new IllegalArgumentException("lineStringMember")
      })
    case "MultiPolygon" | "MultiSurface" =>
      val tag = if (n.name == "MultiSurface") "surfaceMember" else "polygonMember"
      MultiPolygon(membersOf(n, tag).map {
        case p: Polygon => p
        case _ => throw new IllegalArgumentException("polygonMember")
      })
    case "MultiGeometry" =>
      GeometryCollection(membersOf(n, "geometryMember"))
    case _ => null
  }
}
