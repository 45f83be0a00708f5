package graft.geom

import scala.collection.mutable.ArrayBuffer

/** RFC 7946 GeoJSON geometry codec — the reference's highest-traffic text
  * interchange format (driver ogr/ogrsf_frmts/geojson/: writer
  * ogrgeojsonwriter.cpp OGRGeoJSONWriteGeometry, reader
  * ogrgeojsonreader.cpp OGRGeoJSONReadGeometry). The ~240 binary format
  * drivers are scoped out (SURVEY §2.A); GeoJSON comes in because it is a
  * pure text ALGORITHM with a public spec, and it completes the Spark-side
  * source story: `spark.read.json`/`from_json` handles Feature properties
  * natively, `st_geomfromgeojson` lifts the geometry member to WKB, and
  * `st_asgeojson` writes it back — a full GeoJSON-lines reader/writer from
  * stock Spark + two expressions, no custom source needed.
  *
  * Writer: coordinates print with Java's shortest-round-trip double repr
  * (lossless, so parse(write(g)) == g bit-for-bit). The reference's
  * XY_COORD_PRECISION / RFC7946 7-decimal mode is the `precision`
  * parameter (OGRFormatDouble %.{p}f with trailing-zero trim,
  * ogr_core.h OGRFormatDouble semantics).
  *
  * Reader: a self-contained recursive-descent JSON parser (same
  * no-external-libs discipline as [[Wkt]]): any member order, unknown
  * members skipped (bbox, foreign members per RFC 7946 §6.1), nested
  * GeometryCollection, and `Feature` objects unwrap to their geometry
  * (OGRGeoJSONReadGeometry accepts both). Malformed input → null (the
  * codec convention of st_geomfromtext). Z ordinates are accepted and
  * dropped, matching the [[Geom]] XY model's documented limitation.
  */
object GeoJson {

  // ---------------------------------------------------------------- write

  def write(g: Geom): String = write(g, -1)

  /** precision < 0 → shortest-round-trip repr; else fixed decimals with
    * trailing-zero trim (the reference's coordinate-precision option). */
  def write(g: Geom, precision: Int): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, precision, sb)
    sb.toString
  }

  private def num(v: Double, p: Int, sb: java.lang.StringBuilder): Unit = {
    if (java.lang.Double.isNaN(v)) { sb.append("null"); return }
    if (p < 0) { sb.append(java.lang.Double.toString(v)); return }
    // OGRFormatDouble: %.{p}f then strip trailing zeros (keep one digit)
    var s = String.format(java.util.Locale.ROOT, s"%.${p}f", Double.box(v))
    if (s.contains('.')) {
      var e = s.length
      while (e > 1 && s.charAt(e - 1) == '0') e -= 1
      if (s.charAt(e - 1) == '.') e -= 1
      s = s.substring(0, e)
    }
    sb.append(s)
  }

  private def pos(x: Double, y: Double, p: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append('['); num(x, p, sb); sb.append(','); num(y, p, sb); sb.append(']')
  }

  private def coordSeq(cs: Array[Double], p: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.length / 2) {
      if (i > 0) sb.append(',')
      pos(cs(2 * i), cs(2 * i + 1), p, sb)
      i += 1
    }
    sb.append(']')
  }

  private def rings(rs: Array[Array[Double]], p: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < rs.length) {
      if (i > 0) sb.append(',')
      coordSeq(rs(i), p, sb)
      i += 1
    }
    sb.append(']')
  }

  private def writeGeom(g: Geom, p: Int, sb: java.lang.StringBuilder): Unit = g match {
    case pt: Point =>
      sb.append("{\"type\":\"Point\",\"coordinates\":")
      if (pt.isEmpty) sb.append("[]") else pos(pt.x, pt.y, p, sb)
      sb.append('}')
    case l: LineString =>
      sb.append("{\"type\":\"LineString\",\"coordinates\":")
      coordSeq(l.coords, p, sb); sb.append('}')
    case pg: Polygon =>
      sb.append("{\"type\":\"Polygon\",\"coordinates\":")
      rings(pg.rings, p, sb); sb.append('}')
    case mp: MultiPoint =>
      sb.append("{\"type\":\"MultiPoint\",\"coordinates\":[")
      var i = 0
      while (i < mp.points.length) {
        if (i > 0) sb.append(',')
        pos(mp.points(i).x, mp.points(i).y, p, sb)
        i += 1
      }
      sb.append("]}")
    case ml: MultiLineString =>
      sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
      var i = 0
      while (i < ml.lines.length) {
        if (i > 0) sb.append(',')
        coordSeq(ml.lines(i).coords, p, sb)
        i += 1
      }
      sb.append("]}")
    case mg: MultiPolygon =>
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
      var i = 0
      while (i < mg.polys.length) {
        if (i > 0) sb.append(',')
        rings(mg.polys(i).rings, p, sb)
        i += 1
      }
      sb.append("]}")
    case gc: GeometryCollection =>
      sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
      var i = 0
      while (i < gc.geoms.length) {
        if (i > 0) sb.append(',')
        writeGeom(gc.geoms(i), p, sb)
        i += 1
      }
      sb.append("]}")
    case s: Surface => writeGeom(s.toMulti, p, sb) // GeoJSON has no surfaces
  }

  // ---------------------------------------------------------------- parse

  /** Parse a GeoJSON geometry (or Feature wrapping one). Returns null on
    * anything malformed — the codec never throws on data. */
  def parse(s: String): Geom =
    try {
      val p = new P(s)
      val v = p.value()
      p.ws()
      if (p.pos < s.length) null else toGeom(v)
    } catch { case _: Exception => null }

  // minimal JSON value model
  private sealed trait J
  private final case class JObj(m: Map[String, J]) extends J
  private final case class JArr(a: Vector[J]) extends J
  private final case class JNum(v: Double) extends J
  private final case class JStr(v: String) extends J
  private case object JNull extends J
  private final case class JBool(v: Boolean) extends J

  private final class P(s: String) {
    var pos = 0
    def ws(): Unit = { while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1 }
    private def fail(): Nothing = throw new IllegalArgumentException(s"json @$pos")
    private def expect(c: Char): Unit = { ws(); if (pos >= s.length || s.charAt(pos) != c) fail(); pos += 1 }
    def value(): J = {
      ws()
      if (pos >= s.length) fail()
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => numLit()
      }
    }
    private def lit(w: String): Unit = {
      if (!s.startsWith(w, pos)) fail(); pos += w.length
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val m = Map.newBuilder[String, J]
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(m.result()) }
      var more = true
      while (more) {
        ws(); val k = str(); expect(':'); val v = value()
        m += k -> v
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      JObj(m.result())
    }
    private def arr(): JArr = {
      expect('['); ws()
      val b = Vector.newBuilder[J]
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(b.result()) }
      var more = true
      while (more) {
        b += value()
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail()
          s.charAt(pos) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail()
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case _ => fail()
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }
    private def numLit(): JNum = {
      val st = pos
      if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (pos < s.length && {
        val c = s.charAt(pos)
        c.isDigit || c == '.' || c == 'e' || c == 'E' || c == '-' || c == '+'
      }) pos += 1
      if (pos == st) fail()
      JNum(java.lang.Double.parseDouble(s.substring(st, pos)))
    }
  }

  private def asPos(j: J): (Double, Double) = j match {
    // a position is [x, y] or [x, y, z] — z accepted and dropped
    case JArr(a) if a.length >= 2 =>
      (a(0), a(1)) match {
        case (JNum(x), JNum(y)) => (x, y)
        case _ => throw new IllegalArgumentException("position")
      }
    case _ => throw new IllegalArgumentException("position")
  }

  private def asCoords(j: J): Array[Double] = j match {
    case JArr(a) =>
      val out = new Array[Double](a.length * 2)
      var i = 0
      while (i < a.length) {
        val (x, y) = asPos(a(i)); out(2 * i) = x; out(2 * i + 1) = y; i += 1
      }
      out
    case _ => throw new IllegalArgumentException("coords")
  }

  private def asRings(j: J): Array[Array[Double]] = j match {
    case JArr(a) => a.map(asCoords).toArray
    case _ => throw new IllegalArgumentException("rings")
  }

  private def toGeom(j: J): Geom = j match {
    case JObj(m) =>
      val t = m.get("type") match {
        case Some(JStr(v)) => v
        case _ => return null
      }
      t match {
        case "Feature" => m.get("geometry") match {
          case Some(o: JObj) => toGeom(o)
          case Some(JNull) | None => null
          case _ => null
        }
        case "Point" => m.get("coordinates") match {
          case Some(JArr(a)) if a.isEmpty => Point.Empty
          case Some(c) => val (x, y) = asPos(c); Point(x, y)
          case None => null
        }
        case "LineString" => m.get("coordinates") match {
          case Some(c) => LineString(asCoords(c))
          case None => null
        }
        case "Polygon" => m.get("coordinates") match {
          case Some(c) => Polygon(asRings(c))
          case None => null
        }
        case "MultiPoint" => m.get("coordinates") match {
          case Some(JArr(a)) =>
            MultiPoint(a.map { p => val (x, y) = asPos(p); Point(x, y) }.toArray)
          case _ => null
        }
        case "MultiLineString" => m.get("coordinates") match {
          case Some(JArr(a)) => MultiLineString(a.map(c => LineString(asCoords(c))).toArray)
          case _ => null
        }
        case "MultiPolygon" => m.get("coordinates") match {
          case Some(JArr(a)) => MultiPolygon(a.map(r => Polygon(asRings(r))).toArray)
          case _ => null
        }
        case "GeometryCollection" => m.get("geometries") match {
          case Some(JArr(a)) =>
            val gs = new ArrayBuffer[Geom](a.length)
            a.foreach { o => val g = toGeom(o); if (g == null) return null; gs += g }
            GeometryCollection(gs.toArray)
          case _ => null
        }
        case _ => null
      }
    case _ => null
  }
}
