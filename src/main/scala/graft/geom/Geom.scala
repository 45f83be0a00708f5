package graft.geom

/** Axis-aligned bounding box. Reference analog: OGREnvelope
  * (/root/reference/ogr/ogr_core.h:43).
  */
final case class Envelope(minX: Double, minY: Double, maxX: Double, maxY: Double) {
  def isEmpty: Boolean = minX > maxX || minY > maxY

  def contains(x: Double, y: Double): Boolean =
    x >= minX && x <= maxX && y >= minY && y <= maxY

  def contains(o: Envelope): Boolean =
    o.minX >= minX && o.maxX <= maxX && o.minY >= minY && o.maxY <= maxY

  def intersects(o: Envelope): Boolean =
    !(o.minX > maxX || o.maxX < minX || o.minY > maxY || o.maxY < minY)

  def union(o: Envelope): Envelope =
    Envelope(math.min(minX, o.minX), math.min(minY, o.minY),
             math.max(maxX, o.maxX), math.max(maxY, o.maxY))

  def width: Double = maxX - minX
  def height: Double = maxY - minY
}

object Envelope {
  val Empty: Envelope = Envelope(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)

  /** Envelope of interleaved (x0,y0,x1,y1,...) coords. */
  def ofCoords(cs: Array[Double]): Envelope = {
    var mnx = Double.MaxValue; var mny = Double.MaxValue
    var mxx = Double.MinValue; var mxy = Double.MinValue
    var i = 0
    while (i < cs.length) {
      val x = cs(i); val y = cs(i + 1)
      if (x < mnx) mnx = x; if (x > mxx) mxx = x
      if (y < mny) mny = y; if (y > mxy) mxy = y
      i += 2
    }
    if (cs.isEmpty) Empty else Envelope(mnx, mny, mxx, mxy)
  }
}

/** Linear-geometry ADT (the v1 subset of the reference's ISO SQL/MM table,
  * /root/reference/ogr/ogr_core.h:426-513 — Point..GeometryCollection, XY).
  * Coordinates are interleaved (x0,y0,x1,y1,...) for compactness; Z/M
  * ordinates are accepted by the codecs and dropped (documented limitation).
  */
sealed trait Geom {
  def typeName: String
  def wkbType: Int
  def envelope: Envelope
  def isEmpty: Boolean
}

final case class Point(x: Double, y: Double) extends Geom {
  def typeName = "POINT"; def wkbType = 1
  def isEmpty: Boolean = x.isNaN || y.isNaN
  def envelope: Envelope = if (isEmpty) Envelope.Empty else Envelope(x, y, x, y)
}

object Point { val Empty: Point = Point(Double.NaN, Double.NaN) }

final case class LineString(coords: Array[Double]) extends Geom {
  def typeName = "LINESTRING"; def wkbType = 2
  def isEmpty: Boolean = coords.isEmpty
  def numPoints: Int = coords.length / 2
  def x(i: Int): Double = coords(2 * i)
  def y(i: Int): Double = coords(2 * i + 1)
  lazy val envelope: Envelope = Envelope.ofCoords(coords)
}

/** A ring is a closed LineString (first point == last point). */
final case class Polygon(rings: Array[Array[Double]]) extends Geom {
  def typeName = "POLYGON"; def wkbType = 3
  def isEmpty: Boolean = rings.isEmpty
  def exterior: Array[Double] = rings(0)
  def numInterior: Int = rings.length - 1
  lazy val envelope: Envelope =
    if (rings.isEmpty) Envelope.Empty else Envelope.ofCoords(rings(0))
}

final case class MultiPoint(points: Array[Point]) extends Geom {
  def typeName = "MULTIPOINT"; def wkbType = 4
  def isEmpty: Boolean = points.isEmpty
  lazy val envelope: Envelope =
    points.foldLeft(Envelope.Empty)((e, p) => if (p.isEmpty) e else e.union(p.envelope))
}

final case class MultiLineString(lines: Array[LineString]) extends Geom {
  def typeName = "MULTILINESTRING"; def wkbType = 5
  def isEmpty: Boolean = lines.isEmpty
  lazy val envelope: Envelope = lines.foldLeft(Envelope.Empty)((e, l) => e.union(l.envelope))
}

final case class MultiPolygon(polys: Array[Polygon]) extends Geom {
  def typeName = "MULTIPOLYGON"; def wkbType = 6
  def isEmpty: Boolean = polys.isEmpty
  lazy val envelope: Envelope = polys.foldLeft(Envelope.Empty)((e, p) => e.union(p.envelope))
}

final case class GeometryCollection(geoms: Array[Geom]) extends Geom {
  def typeName = "GEOMETRYCOLLECTION"; def wkbType = 7
  def isEmpty: Boolean = geoms.isEmpty
  lazy val envelope: Envelope = geoms.foldLeft(Envelope.Empty)((e, g) => e.union(g.envelope))
}

/** Surface types (ISO wkbPolyhedralSurface=15 / wkbTIN=16 / wkbTriangle=17,
  * /root/reference/ogr/ogr_core.h:426-513). A Triangle is one closed
  * >=4-point ring; TIN and PolyhedralSurface are patched facet sets.
  * Analysis operators consume them through [[Surface.toMulti]] — the
  * reference's CastToMultiPolygon
  * (/root/reference/ogr/ogrpolyhedralsurface.cpp:600-640); the typed nodes
  * exist so WKT/WKB round-trip and st_geometrytype stay faithful.
  */
sealed trait Surface extends Geom { def toMulti: MultiPolygon }

final case class Triangle(ring: Array[Double]) extends Surface {
  def typeName = "TRIANGLE"; def wkbType = 17
  def isEmpty: Boolean = ring.isEmpty
  def asPolygon: Polygon = Polygon(if (isEmpty) Array.empty else Array(ring))
  def toMulti: MultiPolygon =
    MultiPolygon(if (isEmpty) Array.empty else Array(asPolygon))
  lazy val envelope: Envelope =
    if (isEmpty) Envelope.Empty else Envelope.ofCoords(ring)
}

final case class PolyhedralSurface(patches: Array[Polygon]) extends Surface {
  def typeName = "POLYHEDRALSURFACE"; def wkbType = 15
  def isEmpty: Boolean = patches.isEmpty
  def toMulti: MultiPolygon = MultiPolygon(patches)
  lazy val envelope: Envelope =
    patches.foldLeft(Envelope.Empty)((e, p) => e.union(p.envelope))
}

final case class Tin(patches: Array[Triangle]) extends Surface {
  def typeName = "TIN"; def wkbType = 16
  def isEmpty: Boolean = patches.isEmpty
  def toMulti: MultiPolygon = MultiPolygon(patches.map(_.asPolygon))
  lazy val envelope: Envelope =
    patches.foldLeft(Envelope.Empty)((e, p) => e.union(p.envelope))
}

object Geom {
  /** Linear view: surfaces cast to their MultiPolygon facets (recursing
    * into collections). Binary predicates / overlay ops normalize through
    * this so they never see a Surface node. */
  def linear(g: Geom): Geom = g match {
    case s: Surface => s.toMulti
    case c: GeometryCollection => GeometryCollection(c.geoms.map(linear))
    case other => other
  }
}
