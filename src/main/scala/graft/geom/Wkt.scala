package graft.geom

import scala.collection.mutable.ArrayBuffer

/** WKT reader/writer for the linear subset.
  * Reference semantics: OGRGeometry::importFromWkt / exportToWkt
  * (/root/reference/ogr/ogrgeometry.cpp:1968). Z/M ordinates and the
  * "POINT Z"/"POINT ZM" qualifiers are parsed and dropped (v1 is XY);
  * CIRCULARSTRING / COMPOUNDCURVE / CURVEPOLYGON / MULTICURVE /
  * MULTISURFACE are linearized on read (Arc.scala, the GDAL behavior for
  * curve-unaware consumers); TRIANGLE / TIN / POLYHEDRALSURFACE parse to
  * typed Surface nodes that round-trip (Geom.scala).
  */
object Wkt {

  def parse(s: String): Geom = new Parser(s).parseGeom()

  def tryParse(s: String): Option[Geom] =
    try Some(parse(s)) catch { case _: IllegalArgumentException => None }

  private final class Parser(s: String) {
    private var pos = 0

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WKT parse error at $pos: $msg in '$s'")

    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def word(): String = {
      skipWs()
      val st = pos
      while (pos < s.length && (s.charAt(pos).isLetter)) pos += 1
      if (pos == st) fail("expected identifier")
      s.substring(st, pos).toUpperCase
    }

    private def peekChar(): Char = { skipWs(); if (pos < s.length) s.charAt(pos) else '\u0000' }

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    private def number(): Double = {
      skipWs()
      val st = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == st) fail("expected number")
      java.lang.Double.parseDouble(s.substring(st, pos))
    }

    /** Reads optional Z/M/ZM qualifier or EMPTY; returns ordinate count and empty flag. */
    private def dims(): (Int, Boolean) = {
      skipWs()
      if (pos < s.length && s.charAt(pos).isLetter) {
        val w = word()
        w match {
          case "EMPTY" => (2, true)
          case "Z" | "M" => if (peekIsEmpty()) (3, true) else (3, false)
          case "ZM" => if (peekIsEmpty()) (4, true) else (4, false)
          case other => fail(s"unexpected token $other")
        }
      } else (2, false)
    }

    private def peekIsEmpty(): Boolean = {
      skipWs()
      if (pos < s.length && s.charAt(pos).isLetter) {
        val save = pos
        val w = word()
        if (w == "EMPTY") true else { pos = save; false }
      } else false
    }

    private def coordSeq(nd: Int): Array[Double] = {
      expect('(')
      val buf = new ArrayBuffer[Double]()
      var done = false
      while (!done) {
        val x = number(); val y = number()
        buf += x; buf += y
        // consume extra ordinates (declared Z/M or bare 3/4-value tuples)
        var extra = nd - 2
        while (extra > 0 && { skipWs(); pos < s.length && "+-0123456789.".indexOf(s.charAt(pos)) >= 0 }) {
          number(); extra -= 1
        }
        // tolerate undeclared Z: "POINT (1 2 3)"
        while ({ skipWs(); pos < s.length && "+-0123456789.".indexOf(s.charAt(pos)) >= 0 }) number()
        peekChar() match {
          case ',' => pos += 1
          case ')' => pos += 1; done = true
          case _   => fail("expected ',' or ')'")
        }
      }
      buf.toArray
    }

    /** One ring/curve element inside CURVEPOLYGON/MULTICURVE: a bare
      * coordinate sequence, a CIRCULARSTRING (linearized), or a
      * COMPOUNDCURVE (segments concatenated, shared joints deduped). */
    private def curveRing(nd: Int): Array[Double] = {
      skipWs()
      if (pos < s.length && s.charAt(pos) == '(') coordSeq(nd)
      else word() match {
        case "CIRCULARSTRING" => Arc.linearize(coordSeq(nd))
        case "COMPOUNDCURVE"  => compoundCoords(nd)
        case other => fail(s"unexpected curve component $other")
      }
    }

    private def compoundCoords(nd: Int): Array[Double] = {
      expect('(')
      val out = new ArrayBuffer[Double]()
      var done = false
      while (!done) {
        val seg = curveRing(nd)
        // drop the duplicated joint vertex between consecutive segments
        val from = if (out.length >= 2 && seg.length >= 2 &&
          out(out.length - 2) == seg(0) && out(out.length - 1) == seg(1)) 2 else 0
        var i = from
        while (i < seg.length) { out += seg(i); i += 1 }
        peekChar() match {
          case ',' => pos += 1
          case ')' => pos += 1; done = true
          case _   => fail("expected ',' or ')'")
        }
      }
      out.toArray
    }

    /** Rings of one parenthesized polygon body: ((...),(...)). */
    private def polygonRings(nd: Int): Array[Array[Double]] = {
      expect('(')
      val rings = new ArrayBuffer[Array[Double]]()
      var done = false
      while (!done) {
        rings += coordSeq(nd)
        peekChar() match {
          case ',' => pos += 1
          case ')' => pos += 1; done = true
          case _   => fail("expected ',' or ')'")
        }
      }
      rings.toArray
    }

    def parseGeom(): Geom = {
      val t = word()
      val (nd, empty) = dims()
      t match {
        case "POINT" =>
          if (empty) Point.Empty
          else { val cs = coordSeq(nd); if (cs.length != 2) fail("POINT needs 1 coord"); Point(cs(0), cs(1)) }
        case "LINESTRING" =>
          if (empty) LineString(Array.empty) else LineString(coordSeq(nd))
        case "CIRCULARSTRING" =>
          // GDAL linearizes curves for non-curve-aware consumers
          // (OGRGeometryFactory::forceTo / curveToLineString); this engine
          // linearizes at parse time with the same default max angle step
          if (empty) LineString(Array.empty)
          else LineString(Arc.linearize(coordSeq(nd)))
        case "POLYGON" =>
          if (empty) Polygon(Array.empty)
          else {
            expect('(')
            val rings = new ArrayBuffer[Array[Double]]()
            var done = false
            while (!done) {
              rings += coordSeq(nd)
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            Polygon(rings.toArray)
          }
        case "MULTIPOINT" =>
          if (empty) MultiPoint(Array.empty)
          else {
            expect('(')
            val pts = new ArrayBuffer[Point]()
            var done = false
            while (!done) {
              val cs = if (peekChar() == '(') coordSeq(nd)
                       else { val x = number(); val y = number();
                              while ({ skipWs(); pos < s.length && "+-0123456789.".indexOf(s.charAt(pos)) >= 0 }) number()
                              Array(x, y) }
              pts += Point(cs(0), cs(1))
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            MultiPoint(pts.toArray)
          }
        case "MULTILINESTRING" =>
          if (empty) MultiLineString(Array.empty)
          else {
            expect('(')
            val ls = new ArrayBuffer[LineString]()
            var done = false
            while (!done) {
              ls += LineString(coordSeq(nd))
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            MultiLineString(ls.toArray)
          }
        case "COMPOUNDCURVE" =>
          if (empty) LineString(Array.empty)
          else LineString(compoundCoords(nd))
        case "CURVEPOLYGON" =>
          // rings may be plain sequences, CIRCULARSTRING, or COMPOUNDCURVE
          // — all linearized (GDAL's behavior for curve-unaware consumers)
          if (empty) Polygon(Array.empty)
          else {
            expect('(')
            val rings = new ArrayBuffer[Array[Double]]()
            var done = false
            while (!done) {
              rings += curveRing(nd)
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            Polygon(rings.toArray)
          }
        case "MULTICURVE" =>
          if (empty) MultiLineString(Array.empty)
          else {
            expect('(')
            val ls = new ArrayBuffer[LineString]()
            var done = false
            while (!done) {
              ls += LineString(curveRing(nd)) // element: seq | circular | compound
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            MultiLineString(ls.toArray)
          }
        case "MULTIPOLYGON" =>
          if (empty) MultiPolygon(Array.empty)
          else {
            expect('(')
            val ps = new ArrayBuffer[Polygon]()
            var done = false
            while (!done) {
              expect('(')
              val rings = new ArrayBuffer[Array[Double]]()
              var rdone = false
              while (!rdone) {
                rings += coordSeq(nd)
                peekChar() match {
                  case ',' => pos += 1
                  case ')' => pos += 1; rdone = true
                  case _   => fail("expected ',' or ')'")
                }
              }
              ps += Polygon(rings.toArray)
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            MultiPolygon(ps.toArray)
          }
        case "GEOMETRYCOLLECTION" =>
          if (empty) GeometryCollection(Array.empty)
          else {
            expect('(')
            val gs = new ArrayBuffer[Geom]()
            var done = false
            while (!done) {
              gs += parseGeom()
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            GeometryCollection(gs.toArray)
          }
        case "TRIANGLE" =>
          // exactly one closed ring, no interiors
          // (OGRTriangle ring policy, /root/reference/ogr/ogrtriangle.cpp:60-100)
          if (empty) Triangle(Array.empty)
          else {
            val rings = polygonRings(nd)
            if (rings.length != 1) fail("TRIANGLE allows exactly one ring")
            Triangle(rings(0))
          }
        case "POLYHEDRALSURFACE" | "TIN" =>
          // patched facet surfaces (OGRPolyhedralSurface / OGRTriangulatedSurface,
          // /root/reference/ogr/ogrpolyhedralsurface.cpp); WKT body is the
          // MULTIPOLYGON shape with TIN patches limited to one ring
          if (empty) { if (t == "TIN") Tin(Array.empty) else PolyhedralSurface(Array.empty) }
          else {
            expect('(')
            val ps = new ArrayBuffer[Array[Array[Double]]]()
            var done = false
            while (!done) {
              ps += polygonRings(nd)
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            if (t == "TIN")
              Tin(ps.map { rs =>
                if (rs.length != 1) fail("TIN patch allows exactly one ring")
                Triangle(rs(0))
              }.toArray)
            else PolyhedralSurface(ps.map(rs => Polygon(rs)).toArray)
          }
        case "MULTISURFACE" =>
          // elements are bare polygon bodies or tagged POLYGON/CURVEPOLYGON;
          // cast to MultiPolygon for linear consumers (the reference's
          // forceTo(wkbMultiPolygon) path, ogrgeometryfactory.cpp)
          if (empty) MultiPolygon(Array.empty)
          else {
            expect('(')
            val ps = new ArrayBuffer[Polygon]()
            var done = false
            while (!done) {
              skipWs()
              val poly =
                if (pos < s.length && s.charAt(pos) == '(') Polygon(polygonRings(nd))
                else word() match {
                  case "POLYGON" => Polygon(polygonRings(nd))
                  case "CURVEPOLYGON" =>
                    expect('(')
                    val rings = new ArrayBuffer[Array[Double]]()
                    var rdone = false
                    while (!rdone) {
                      rings += curveRing(nd)
                      peekChar() match {
                        case ',' => pos += 1
                        case ')' => pos += 1; rdone = true
                        case _   => fail("expected ',' or ')'")
                      }
                    }
                    Polygon(rings.toArray)
                  case other => fail(s"unexpected MULTISURFACE component $other")
                }
              ps += poly
              peekChar() match {
                case ',' => pos += 1
                case ')' => pos += 1; done = true
                case _   => fail("expected ',' or ')'")
              }
            }
            MultiPolygon(ps.toArray)
          }
        case other => fail(s"unknown geometry type $other")
      }
    }
  }

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def coordsStr(cs: Array[Double]): String = {
    val sb = new StringBuilder("(")
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      sb.append(fmt(cs(i))).append(' ').append(fmt(cs(i + 1)))
      i += 2
    }
    sb.append(')').toString
  }

  def write(g: Geom): String = g match {
    case p: Point =>
      if (p.isEmpty) "POINT EMPTY" else s"POINT (${fmt(p.x)} ${fmt(p.y)})"
    case l: LineString =>
      if (l.isEmpty) "LINESTRING EMPTY" else "LINESTRING " + coordsStr(l.coords)
    case p: Polygon =>
      if (p.isEmpty) "POLYGON EMPTY"
      else "POLYGON (" + p.rings.map(coordsStr).mkString(",") + ")"
    case m: MultiPoint =>
      if (m.isEmpty) "MULTIPOINT EMPTY"
      else "MULTIPOINT (" + m.points.map(p => s"(${fmt(p.x)} ${fmt(p.y)})").mkString(",") + ")"
    case m: MultiLineString =>
      if (m.isEmpty) "MULTILINESTRING EMPTY"
      else "MULTILINESTRING (" + m.lines.map(l => coordsStr(l.coords)).mkString(",") + ")"
    case m: MultiPolygon =>
      if (m.isEmpty) "MULTIPOLYGON EMPTY"
      else "MULTIPOLYGON (" + m.polys.map(p => "(" + p.rings.map(coordsStr).mkString(",") + ")").mkString(",") + ")"
    case c: GeometryCollection =>
      if (c.isEmpty) "GEOMETRYCOLLECTION EMPTY"
      else "GEOMETRYCOLLECTION (" + c.geoms.map(write).mkString(",") + ")"
    case t: Triangle =>
      if (t.isEmpty) "TRIANGLE EMPTY" else "TRIANGLE (" + coordsStr(t.ring) + ")"
    case s: PolyhedralSurface =>
      if (s.isEmpty) "POLYHEDRALSURFACE EMPTY"
      else "POLYHEDRALSURFACE (" +
        s.patches.map(p => "(" + p.rings.map(coordsStr).mkString(",") + ")").mkString(",") + ")"
    case t: Tin =>
      if (t.isEmpty) "TIN EMPTY"
      else "TIN (" + t.patches.map(p => "(" + coordsStr(p.ring) + ")").mkString(",") + ")"
  }
}
