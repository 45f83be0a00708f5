package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Core computational geometry, replicating the reference's native (non-GEOS)
  * fast paths bit-for-bit. Methods are static-forwarder friendly so Catalyst
  * codegen can call them directly.
  */
object GeoOps {

  // ---------------------------------------------------------------- PIP

  /** Ray-crossing point-in-ring. Exact semantics of
    * OGRLinearRing::isPointInRing (/root/reference/ogr/ogrlinearring.cpp:452-521):
    * envelope pretest, then count crossings where the segment straddles the
    * horizontal ray and (x1*y2 - x2*y1)/(y2 - y1) > 0 strictly; odd => inside.
    * Points exactly on an edge are decided by the strict `> 0` rule (usually
    * outside) unless caught separately by [[isPointOnRingBoundary]].
    */
  def isPointInRing(ring: Array[Double], px: Double, py: Double, testEnvelope: Boolean): Boolean = {
    val n = ring.length / 2
    if (n < 4) return false
    if (testEnvelope) {
      val e = Envelope.ofCoords(ring)
      if (!(px >= e.minX && px <= e.maxX && py >= e.minY && py <= e.maxY)) return false
    }
    var crossings = 0
    var prevDx = ring(0) - px
    var prevDy = ring(1) - py
    var i = 1
    while (i < n) {
      val x1 = ring(2 * i) - px
      val y1 = ring(2 * i + 1) - py
      val x2 = prevDx
      val y2 = prevDy
      if (((y1 > 0) && (y2 <= 0)) || ((y2 > 0) && (y1 <= 0))) {
        val inter = (x1 * y2 - x2 * y1) / (y2 - y1)
        if (inter > 0.0) crossings += 1
      }
      prevDx = x1
      prevDy = y1
      i += 1
    }
    (crossings % 2) != 0
  }

  /** Point-on-ring-boundary. Exact semantics of
    * OGRLinearRing::isPointOnRingBoundary (/root/reference/ogr/ogrlinearring.cpp:533+):
    * exact collinearity (cross == 0) plus projection within the segment.
    */
  def isPointOnRingBoundary(ring: Array[Double], px: Double, py: Double, testEnvelope: Boolean): Boolean = {
    val n = ring.length / 2
    if (n < 4) return false
    if (testEnvelope) {
      val e = Envelope.ofCoords(ring)
      if (!(px >= e.minX && px <= e.maxX && py >= e.minY && py <= e.maxY)) return false
    }
    var prevDx = px - ring(0)
    var prevDy = py - ring(1)
    var i = 1
    while (i < n) {
      val dx1 = px - ring(2 * i)
      val dy1 = py - ring(2 * i + 1)
      val dx2 = prevDx
      val dy2 = prevDy
      if (dx1 * dy2 - dx2 * dy1 == 0) {
        if (!(dx1 == dx2 && dy1 == dy2)) {
          val dxSeg = ring(2 * i) - ring(2 * (i - 1))
          val dySeg = ring(2 * i + 1) - ring(2 * (i - 1) + 1)
          val cross = dx2 * dxSeg + dy2 * dySeg
          if (cross >= 0) {
            val sqLen = dxSeg * dxSeg + dySeg * dySeg
            if (cross <= sqLen) return true
          }
        }
      }
      prevDx = dx1
      prevDy = dy1
      i += 1
    }
    false
  }

  /** Polygon contains point: in the exterior ring and in no interior ring.
    * Reference: OGRPolygon::IsPointOnSurface (/root/reference/ogr/ogrpolygon.cpp:770-800)
    * and the no-hole fast path OGRCurvePolygon::ContainsPoint
    * (/root/reference/ogr/ogrcurvepolygon.cpp:813-823).
    */
  def polygonContains(p: Polygon, px: Double, py: Double): Boolean = {
    if (p.isEmpty) return false
    if (!isPointInRing(p.rings(0), px, py, testEnvelope = true)) return false
    var i = 1
    while (i < p.rings.length) {
      if (isPointInRing(p.rings(i), px, py, testEnvelope = true)) return false
      i += 1
    }
    true
  }

  /** Polygon intersects point: inside or on the boundary of the exterior ring,
    * and not strictly inside a hole (on a hole boundary still intersects).
    * Reference: OGRCurvePolygon::IntersectsPoint → OGRLinearRing
    * isPointInRing || isPointOnRingBoundary (/root/reference/ogr/ogrcurvepolygon.cpp:829).
    */
  def polygonIntersectsPoint(p: Polygon, px: Double, py: Double): Boolean = {
    if (p.isEmpty) return false
    val ext = p.rings(0)
    val in = isPointInRing(ext, px, py, testEnvelope = true) ||
      isPointOnRingBoundary(ext, px, py, testEnvelope = true)
    if (!in) return false
    var i = 1
    while (i < p.rings.length) {
      if (isPointInRing(p.rings(i), px, py, testEnvelope = true) &&
          !isPointOnRingBoundary(p.rings(i), px, py, testEnvelope = true)) return false
      i += 1
    }
    true
  }

  /** Geometry contains point, dispatching on type (polygons/multipolygons only;
    * everything else is false as in GEOS Contains for lower dimensions with
    * boundary points). */
  def containsPoint(g: Geom, px: Double, py: Double): Boolean = g match {
    case p: Polygon      => polygonContains(p, px, py)
    case m: MultiPolygon => m.polys.exists(polygonContains(_, px, py))
    case c: GeometryCollection => c.geoms.exists(containsPoint(_, px, py))
    case s: Surface      => containsPoint(s.toMulti, px, py)
    case _ => false
  }

  def intersectsPoint(g: Geom, px: Double, py: Double): Boolean = g match {
    case s: Surface      => intersectsPoint(s.toMulti, px, py)
    case p: Point        => p.x == px && p.y == py
    case m: MultiPoint   => m.points.exists(p => p.x == px && p.y == py)
    case l: LineString   => pointOnLine(l.coords, px, py)
    case m: MultiLineString => m.lines.exists(l => pointOnLine(l.coords, px, py))
    case p: Polygon      => polygonIntersectsPoint(p, px, py)
    case m: MultiPolygon => m.polys.exists(polygonIntersectsPoint(_, px, py))
    case c: GeometryCollection => c.geoms.exists(intersectsPoint(_, px, py))
  }

  private def pointOnLine(cs: Array[Double], px: Double, py: Double): Boolean = {
    val n = cs.length / 2
    var i = 1
    while (i < n) {
      if (distToSegmentSq(px, py, cs(2 * (i - 1)), cs(2 * (i - 1) + 1), cs(2 * i), cs(2 * i + 1)) == 0.0)
        return true
      i += 1
    }
    false
  }

  // ------------------------------------------------------- distance / metric

  def distToSegmentSq(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val qx = ax + t * dx; val qy = ay + t * dy
    (px - qx) * (px - qx) + (py - qy) * (py - qy)
  }

  /** Planar distance between two geometries (point/line/polygon cases needed by
    * kNN refine and ST_Distance; reference OGRGeometry::Distance
    * /root/reference/ogr/ogrgeometry.cpp:3818). */
  def distance(a: Geom, b: Geom): Double = (a, b) match {
    case (s: Surface, o) => distance(s.toMulti, o)
    case (o, s: Surface) => distance(o, s.toMulti)
    case (p: Point, q: Point) => math.hypot(p.x - q.x, p.y - q.y)
    case (p: Point, l: LineString) => distPointLine(p.x, p.y, l.coords)
    case (l: LineString, p: Point) => distPointLine(p.x, p.y, l.coords)
    case (p: Point, pol: Polygon) =>
      if (polygonIntersectsPoint(pol, p.x, p.y)) 0.0
      else pol.rings.map(r => distPointLine(p.x, p.y, r)).min
    case (pol: Polygon, p: Point) => distance(p, pol)
    case (p: Point, m: MultiPolygon) => m.polys.map(distance(p, _)).min
    case (m: MultiPolygon, p: Point) => distance(p, m)
    case (p: Point, m: MultiPoint) => m.points.map(distance(p, _)).min
    case (m: MultiPoint, p: Point) => distance(p, m)
    case (l1: LineString, l2: LineString) => distLineLine(l1.coords, l2.coords)
    case (g1, g2) =>
      throw new IllegalArgumentException(
        s"st_distance(${g1.typeName}, ${g2.typeName}) not supported in v1")
  }

  private def distPointLine(px: Double, py: Double, cs: Array[Double]): Double = {
    val n = cs.length / 2
    if (n == 0) return Double.NaN
    if (n == 1) return math.hypot(px - cs(0), py - cs(1))
    var best = Double.MaxValue
    var i = 1
    while (i < n) {
      val d = distToSegmentSq(px, py, cs(2 * (i - 1)), cs(2 * (i - 1) + 1), cs(2 * i), cs(2 * i + 1))
      if (d < best) best = d
      i += 1
    }
    math.sqrt(best)
  }

  private def segsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                            cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double): Double =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) true
    else o1 == 0 && o2 == 0 && o3 == 0 && o4 == 0 && // collinear overlap
      math.max(math.min(ax, bx), math.min(cx, dx)) <= math.min(math.max(ax, bx), math.max(cx, dx)) &&
      math.max(math.min(ay, by), math.min(cy, dy)) <= math.min(math.max(ay, by), math.max(cy, dy))
  }

  private def distLineLine(a: Array[Double], b: Array[Double]): Double = {
    val na = a.length / 2; val nb = b.length / 2
    var best = Double.MaxValue
    var i = 1
    while (i < na) {
      var j = 1
      while (j < nb) {
        if (segsIntersect(a(2*(i-1)), a(2*(i-1)+1), a(2*i), a(2*i+1),
                          b(2*(j-1)), b(2*(j-1)+1), b(2*j), b(2*j+1))) return 0.0
        var d = distToSegmentSq(a(2*i), a(2*i+1), b(2*(j-1)), b(2*(j-1)+1), b(2*j), b(2*j+1))
        if (d < best) best = d
        d = distToSegmentSq(a(2*(i-1)), a(2*(i-1)+1), b(2*(j-1)), b(2*(j-1)+1), b(2*j), b(2*j+1))
        if (d < best) best = d
        d = distToSegmentSq(b(2*j), b(2*j+1), a(2*(i-1)), a(2*(i-1)+1), a(2*i), a(2*i+1))
        if (d < best) best = d
        d = distToSegmentSq(b(2*(j-1)), b(2*(j-1)+1), a(2*(i-1)), a(2*(i-1)+1), a(2*i), a(2*i+1))
        if (d < best) best = d
        j += 1
      }
      i += 1
    }
    math.sqrt(best)
  }

  // ------------------------------------------------------ geom-geom predicates

  /** Envelope-intersects pretest — the reference's first phase of Intersects
    * (/root/reference/ogr/ogrgeometry.cpp:575-589) and FilterGeometry
    * (/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:4004-4031). */
  def envIntersects(a: Geom, b: Geom): Boolean = {
    val ea = a.envelope; val eb = b.envelope
    !ea.isEmpty && !eb.isEmpty && ea.intersects(eb)
  }

  /** Exact Intersects over the linear subset: envelope reject, then
    * dimension-dispatched exact test (point membership, segment-segment
    * crossing, containment). Reference: OGRGeometry::Intersects
    * (/root/reference/ogr/ogrgeometry.cpp:575-614) — our exact test is native
    * (no envelope≡intersect GEOS-less fallback). */
  def intersects(a: Geom, b: Geom): Boolean = {
    if (!envIntersects(a, b)) return false
    (a, b) match {
      case (s: Surface, g) => intersects(s.toMulti, g)
      case (g, s: Surface) => intersects(g, s.toMulti)
      case (p: Point, g) => intersectsPoint(g, p.x, p.y)
      case (g, p: Point) => intersectsPoint(g, p.x, p.y)
      case (m: MultiPoint, g) => m.points.exists(p => intersectsPoint(g, p.x, p.y))
      case (g, m: MultiPoint) => m.points.exists(p => intersectsPoint(g, p.x, p.y))
      case (c: GeometryCollection, g) => c.geoms.exists(intersects(_, g))
      case (g, c: GeometryCollection) => c.geoms.exists(intersects(g, _))
      case (m: MultiLineString, g) => m.lines.exists(intersects(_, g))
      case (g, m: MultiLineString) => m.lines.exists(intersects(g, _))
      case (m: MultiPolygon, g) => m.polys.exists(intersects(_, g))
      case (g, m: MultiPolygon) => m.polys.exists(intersects(g, _))
      case (l1: LineString, l2: LineString) => anySegIntersect(l1.coords, l2.coords)
      case (l: LineString, p: Polygon) => lineIntersectsPolygon(l, p)
      case (p: Polygon, l: LineString) => lineIntersectsPolygon(l, p)
      case (p1: Polygon, p2: Polygon) => polygonIntersectsPolygon(p1, p2)
      case _ => false
    }
  }

  private def anySegIntersect(a: Array[Double], b: Array[Double]): Boolean = {
    val na = a.length / 2; val nb = b.length / 2
    var i = 1
    while (i < na) {
      var j = 1
      while (j < nb) {
        if (segsIntersect(a(2*(i-1)), a(2*(i-1)+1), a(2*i), a(2*i+1),
                          b(2*(j-1)), b(2*(j-1)+1), b(2*j), b(2*j+1))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  private def lineIntersectsPolygon(l: LineString, p: Polygon): Boolean = {
    if (l.isEmpty || p.isEmpty) return false
    if (p.rings.exists(r => anySegIntersect(l.coords, r))) return true
    // fully inside (or fully inside a hole — then first vertex is not on surface)
    polygonIntersectsPoint(p, l.coords(0), l.coords(1))
  }

  private def polygonIntersectsPolygon(a: Polygon, b: Polygon): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (a.rings.exists(ra => b.rings.exists(rb => anySegIntersect(ra, rb)))) return true
    // one contains the other
    polygonIntersectsPoint(a, b.rings(0)(0), b.rings(0)(1)) ||
      polygonIntersectsPoint(b, a.rings(0)(0), a.rings(0)(1))
  }

  /** Contains over the linear subset (polygon containers only):
    * every vertex of b on the surface of a, and no boundary crossing. */
  def contains(a: Geom, b: Geom): Boolean = (a, b) match {
    case (s: Surface, o) => contains(s.toMulti, o)
    case (o, s: Surface) => contains(o, s.toMulti)
    case (_, p: Point) => containsPoint(a, p.x, p.y)
    case (_, m: MultiPoint) => !m.isEmpty && m.points.forall(p => containsPoint(a, p.x, p.y))
    case (pa: Polygon, l: LineString) =>
      !l.isEmpty && allVerticesOnSurface(pa, l.coords) && !pa.rings.exists(r => segsCross(l.coords, r))
    case (pa: Polygon, pb: Polygon) =>
      !pb.isEmpty && pb.rings.forall(r => allVerticesOnSurface(pa, r)) &&
        !pa.rings.exists(ra => pb.rings.exists(rb => segsCross(rb, ra)))
    case (ma: MultiPolygon, g) => ma.polys.exists(contains(_, g))
    case (pa: Polygon, mb: MultiPolygon) => mb.polys.forall(contains(pa, _))
    case _ => false
  }

  private def allVerticesOnSurface(p: Polygon, cs: Array[Double]): Boolean = {
    var i = 0
    while (i < cs.length) {
      if (!polygonIntersectsPoint(p, cs(i), cs(i + 1))) return false
      i += 2
    }
    true
  }

  /** True if any segment of a PROPERLY crosses any segment of b (shared
    * endpoints / touching don't count). Used by contains(). */
  private def segsCross(a: Array[Double], b: Array[Double]): Boolean = {
    def orient(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double): Double =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val na = a.length / 2; val nb = b.length / 2
    var i = 1
    while (i < na) {
      var j = 1
      while (j < nb) {
        val o1 = orient(a(2*(i-1)), a(2*(i-1)+1), a(2*i), a(2*i+1), b(2*(j-1)), b(2*(j-1)+1))
        val o2 = orient(a(2*(i-1)), a(2*(i-1)+1), a(2*i), a(2*i+1), b(2*j), b(2*j+1))
        val o3 = orient(b(2*(j-1)), b(2*(j-1)+1), b(2*j), b(2*j+1), a(2*(i-1)), a(2*(i-1)+1))
        val o4 = orient(b(2*(j-1)), b(2*(j-1)+1), b(2*j), b(2*j+1), a(2*i), a(2*i+1))
        if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
            ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  // ------------------------------------------------------ coordinate mapping

  /** Apply f to every coordinate pair (the reference's in-place geometry
    * transform shape, /root/reference/ogr/ogrgeometry.cpp:698-765). */
  def mapCoords(g: Geom, f: (Double, Double) => (Double, Double)): Geom = {
    def mapArr(cs: Array[Double]): Array[Double] = {
      val out = new Array[Double](cs.length)
      var i = 0
      while (i < cs.length) {
        val (x, y) = f(cs(i), cs(i + 1))
        out(i) = x; out(i + 1) = y
        i += 2
      }
      out
    }
    g match {
      case p: Point => if (p.isEmpty) p else { val (x, y) = f(p.x, p.y); Point(x, y) }
      case m: MultiPoint => MultiPoint(m.points.map(p => mapCoords(p, f).asInstanceOf[Point]))
      case l: LineString => LineString(mapArr(l.coords))
      case m: MultiLineString => MultiLineString(m.lines.map(l => LineString(mapArr(l.coords))))
      case p: Polygon => Polygon(p.rings.map(mapArr))
      case m: MultiPolygon => MultiPolygon(m.polys.map(p => mapCoords(p, f).asInstanceOf[Polygon]))
      case c: GeometryCollection => GeometryCollection(c.geoms.map(mapCoords(_, f)))
      case t: Triangle => Triangle(mapArr(t.ring))
      case s: PolyhedralSurface =>
        PolyhedralSurface(s.patches.map(p => Polygon(p.rings.map(mapArr))))
      case t: Tin => Tin(t.patches.map(p => Triangle(mapArr(p.ring))))
    }
  }

  /** WGS84 lon/lat → EPSG:3857. Reference: the warp transform chain
    * (/root/reference/alg/gdaltransformer.cpp:1345) restricted to the
    * 4326↔3857 pair (full PROJ out of scope, SURVEY.md §2.D). */
  def to3857(g: Geom): Geom = mapCoords(g, (x, y) => (Mercator.lonToX(x), Mercator.latToY(y)))
  def to4326(g: Geom): Geom = mapCoords(g, (x, y) => (Mercator.xToLon(x), Mercator.yToLat(y)))

  def swapXY(g: Geom): Geom = mapCoords(g, (x, y) => (y, x))

  /** Split multi-geometries into parts (explode-collections,
    * /root/reference/apps/gdalalg_vector_explode.h:29). */
  /** Promote to the multi variant (set-geom-type promote-to-multi,
    * /root/reference/apps/gdalalg_vector_set_geom_type.cpp via
    * OGRGeometryFactory::forceTo, ogrgeometryfactory.cpp:3536). Surfaces
    * cast to their facet MultiPolygon (CastToMultiPolygon). */
  def forceMulti(g: Geom): Geom = g match {
    case p: Point => MultiPoint(Array(p))
    case l: LineString => MultiLineString(Array(l))
    case p: Polygon => MultiPolygon(Array(p))
    case s: Surface => s.toMulti
    case other => other
  }

  /** Total vertex count (closure vertices included), the ST_NPoints /
    * OGR_GEOM_POINT_COUNT semantics. */
  def npoints(g: Geom): Int = g match {
    case p: Point => if (p.isEmpty) 0 else 1
    case l: LineString => l.numPoints
    case p: Polygon => p.rings.map(_.length / 2).sum
    case m: MultiPoint => m.points.count(!_.isEmpty)
    case m: MultiLineString => m.lines.map(_.numPoints).sum
    case m: MultiPolygon => m.polys.map(p => p.rings.map(_.length / 2).sum).sum
    case c: GeometryCollection => c.geoms.map(npoints).sum
    case s: Surface => npoints(s.toMulti)
  }

  def dump(g: Geom): Array[Geom] = g match {
    case m: MultiPoint => m.points.toArray[Geom]
    case m: MultiLineString => m.lines.toArray[Geom]
    case m: MultiPolygon => m.polys.toArray[Geom]
    case c: GeometryCollection => c.geoms.flatMap(dump)
    case s: PolyhedralSurface => s.patches.toArray[Geom]
    case t: Tin => t.patches.map(_.asPolygon).toArray[Geom]
    case single => Array(single)
  }

  /** Basic validity: rings closed, >= 4 points, finite coords. Reference
    * surface: OGRGeometry::IsValid (/root/reference/ogr/ogrgeometry.cpp:2284);
    * v1 checks structural validity (self-intersection check is v2). */
  def isValid(g: Geom): Boolean = g match {
    case p: Point => !p.isEmpty && java.lang.Double.isFinite(p.x) && java.lang.Double.isFinite(p.y)
    case m: MultiPoint => m.points.forall(isValid)
    case l: LineString => l.numPoints >= 2 && l.coords.forall(java.lang.Double.isFinite)
    case m: MultiLineString => m.lines.forall(isValid)
    case p: Polygon =>
      p.rings.nonEmpty && p.rings.forall { r =>
        r.length >= 8 && r(0) == r(r.length - 2) && r(1) == r(r.length - 1) &&
          r.forall(java.lang.Double.isFinite)
      }
    case m: MultiPolygon => m.polys.nonEmpty && m.polys.forall(isValid)
    case c: GeometryCollection => c.geoms.forall(isValid)
    case t: Triangle => // exactly 4 points, closed, finite (OGRTriangle)
      t.ring.length == 8 && t.ring(0) == t.ring(6) && t.ring(1) == t.ring(7) &&
        t.ring.forall(java.lang.Double.isFinite)
    case s: PolyhedralSurface => s.patches.nonEmpty && s.patches.forall(isValid)
    case t: Tin => t.patches.nonEmpty && t.patches.forall(isValid)
  }

  private final val Deg2Rad = math.Pi / 180.0

  /** Great-circle distance, spherical law of cosines with clamped acos —
    * the exact formula of OGR_GreatCircle_Distance
    * (/root/reference/ogr/ogr_geo_utils.cpp:33-46). This is the kNN
    * refinement metric. Radius in the same unit as the result.
    */
  def greatCircle(latA: Double, lonA: Double, latB: Double, lonB: Double, radius: Double): Double = {
    val cosP = math.cos((lonB - lonA) * Deg2Rad)
    val la = latA * Deg2Rad
    val lb = latB * Deg2Rad
    val cosAngle = math.sin(la) * math.sin(lb) + math.cos(la) * math.cos(lb) * cosP
    val x = if (cosAngle > 1.0) 1.0 else if (cosAngle < -1.0) -1.0 else cosAngle
    math.acos(x) * radius
  }

  /** WGS84 semi-major axis — the sphere radius of the WebMercator grid. */
  final val EarthRadius = 6378137.0

  def greatCircle(latA: Double, lonA: Double, latB: Double, lonB: Double): Double =
    greatCircle(latA, lonA, latB, lonB, EarthRadius)

  // -------------------------------------------------------- measures & ops

  /** Unsigned ring area (shoelace / 2). Reference: OGRLinearRing::get_Area. */
  def ringArea(cs: Array[Double]): Double = math.abs(signedRingArea(cs))

  def signedRingArea(cs: Array[Double]): Double = {
    val n = cs.length / 2
    if (n < 3) return 0.0
    var sum = 0.0
    var i = 0
    while (i < n - 1) {
      sum += cs(2 * i) * cs(2 * i + 3) - cs(2 * i + 2) * cs(2 * i + 1)
      i += 1
    }
    sum / 2.0
  }

  def area(g: Geom): Double = g match {
    case p: Polygon =>
      if (p.isEmpty) 0.0
      else ringArea(p.rings(0)) - p.rings.drop(1).map(ringArea).sum
    case m: MultiPolygon => m.polys.map(area).sum
    case c: GeometryCollection => c.geoms.map(area).sum
    case s: Surface => area(s.toMulti) // facet-sum (OGRPolyhedralSurface::get_Area)
    case _ => 0.0
  }

  def lineLength(cs: Array[Double]): Double = {
    val n = cs.length / 2
    var sum = 0.0
    var i = 1
    while (i < n) {
      sum += math.hypot(cs(2 * i) - cs(2 * (i - 1)), cs(2 * i + 1) - cs(2 * (i - 1) + 1))
      i += 1
    }
    sum
  }

  def length(g: Geom): Double = g match {
    case l: LineString => lineLength(l.coords)
    case m: MultiLineString => m.lines.map(l => lineLength(l.coords)).sum
    case p: Polygon => p.rings.map(lineLength).sum
    case m: MultiPolygon => m.polys.map(length).sum
    case c: GeometryCollection => c.geoms.map(length).sum
    case s: Surface => length(s.toMulti)
    case _ => 0.0
  }

  /** Centroid (area-weighted for polygons, length-weighted for lines,
    * mean for points). Reference: OGRGeometry::Centroid
    * (/root/reference/ogr/ogrgeometry.cpp:4825). */
  def centroid(g: Geom): Point = g match {
    case s: Surface => centroid(s.toMulti)
    case p: Point => p
    case m: MultiPoint =>
      if (m.isEmpty) Point.Empty
      else Point(m.points.map(_.x).sum / m.points.length, m.points.map(_.y).sum / m.points.length)
    case l: LineString => lineCentroid(Array(l.coords))
    case m: MultiLineString => lineCentroid(m.lines.map(_.coords))
    case p: Polygon => polyCentroid(Array(p))
    case m: MultiPolygon => polyCentroid(m.polys)
    case c: GeometryCollection =>
      val pts = c.geoms.map(centroid).filterNot(_.isEmpty)
      if (pts.isEmpty) Point.Empty
      else Point(pts.map(_.x).sum / pts.length, pts.map(_.y).sum / pts.length)
  }

  private def lineCentroid(lines: Array[Array[Double]]): Point = {
    var sx = 0.0; var sy = 0.0; var sl = 0.0
    lines.foreach { cs =>
      val n = cs.length / 2
      var i = 1
      while (i < n) {
        val len = math.hypot(cs(2*i) - cs(2*(i-1)), cs(2*i+1) - cs(2*(i-1)+1))
        sx += len * (cs(2*i) + cs(2*(i-1))) / 2
        sy += len * (cs(2*i+1) + cs(2*(i-1)+1)) / 2
        sl += len
        i += 1
      }
    }
    if (sl == 0) Point.Empty else Point(sx / sl, sy / sl)
  }

  private def polyCentroid(polys: Array[Polygon]): Point = {
    var sa = 0.0; var sx = 0.0; var sy = 0.0
    polys.foreach { p =>
      p.rings.zipWithIndex.foreach { case (cs, ri) =>
        val aSigned = signedRingArea(cs)
        val sign = if (ri == 0) 1.0 else -1.0
        val a = sign * math.abs(aSigned)
        val n = cs.length / 2
        var cx = 0.0; var cy = 0.0
        var i = 0
        while (i < n - 1) {
          val cross = cs(2*i) * cs(2*i+3) - cs(2*i+2) * cs(2*i+1)
          cx += (cs(2*i) + cs(2*i+2)) * cross
          cy += (cs(2*i+1) + cs(2*i+3)) * cross
          i += 1
        }
        if (aSigned != 0) {
          // cx,cy are relative to signed area; normalize then weight
          val px = cx / (6 * aSigned)
          val py = cy / (6 * aSigned)
          sx += a * px; sy += a * py; sa += a
        }
      }
    }
    if (sa == 0) Point.Empty else Point(sx / sa, sy / sa)
  }

  /** Douglas-Peucker simplification. Reference: OGRGeometry::Simplify
    * (/root/reference/ogr/ogrgeometry.cpp:6526) semantics at tolerance t. */
  def simplifyLine(cs: Array[Double], tol: Double): Array[Double] = {
    val n = cs.length / 2
    if (n <= 2) return cs
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val tol2 = tol * tol
    def rec(a: Int, b: Int): Unit = {
      if (b <= a + 1) return
      var best = -1; var bestD = tol2
      var i = a + 1
      while (i < b) {
        val d = distToSegmentSq(cs(2*i), cs(2*i+1), cs(2*a), cs(2*a+1), cs(2*b), cs(2*b+1))
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      if (best >= 0) { keep(best) = true; rec(a, best); rec(best, b) }
    }
    rec(0, n - 1)
    val out = new ArrayBuffer[Double]()
    var i = 0
    while (i < n) { if (keep(i)) { out += cs(2*i); out += cs(2*i+1) }; i += 1 }
    out.toArray
  }

  def simplify(g: Geom, tol: Double): Geom = g match {
    case l: LineString => LineString(simplifyLine(l.coords, tol))
    case m: MultiLineString => MultiLineString(m.lines.map(l => LineString(simplifyLine(l.coords, tol))))
    case p: Polygon => Polygon(p.rings.map(r => simplifyLine(r, tol)).filter(_.length >= 8))
    case m: MultiPolygon => MultiPolygon(m.polys.map(p => simplify(p, tol).asInstanceOf[Polygon]))
    case s: Surface => simplify(s.toMulti, tol)
    case other => other
  }

  /** Densify so no segment exceeds maxLen. Reference: OGRGeometry::segmentize
    * (/root/reference/ogr/ogr_geometry.h). */
  def segmentizeLine(cs: Array[Double], maxLen: Double): Array[Double] = {
    val n = cs.length / 2
    if (n < 2 || maxLen <= 0) return cs
    val out = new ArrayBuffer[Double]()
    out += cs(0); out += cs(1)
    var i = 1
    while (i < n) {
      val ax = cs(2*(i-1)); val ay = cs(2*(i-1)+1)
      val bx = cs(2*i); val by = cs(2*i+1)
      val len = math.hypot(bx - ax, by - ay)
      if (len > maxLen) {
        val parts = math.ceil(len / maxLen).toInt
        var k = 1
        while (k < parts) {
          out += ax + (bx - ax) * k / parts
          out += ay + (by - ay) * k / parts
          k += 1
        }
      }
      out += bx; out += by
      i += 1
    }
    out.toArray
  }

  def segmentize(g: Geom, maxLen: Double): Geom = g match {
    case l: LineString => LineString(segmentizeLine(l.coords, maxLen))
    case m: MultiLineString => MultiLineString(m.lines.map(l => LineString(segmentizeLine(l.coords, maxLen))))
    case p: Polygon => Polygon(p.rings.map(segmentizeLine(_, maxLen)))
    case m: MultiPolygon => MultiPolygon(m.polys.map(p => segmentize(p, maxLen).asInstanceOf[Polygon]))
    case other => other
  }

  /** Monotone-chain convex hull. Reference: OGRGeometry::ConvexHull
    * (/root/reference/ogr/ogrgeometry.cpp:4449). Returns a closed ring polygon. */
  def convexHull(g: Geom): Geom = {
    val pts = collectPoints(g).distinct.sortBy(p => (p._1, p._2))
    if (pts.length < 3) {
      if (pts.isEmpty) Polygon(Array.empty)
      else if (pts.length == 1) Point(pts(0)._1, pts(0)._2)
      else LineString(pts.flatMap(p => Array(p._1, p._2)).toArray)
    } else {
      def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
        (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
      val hull = new ArrayBuffer[(Double, Double)]()
      for (p <- pts) {
        while (hull.length >= 2 && cross(hull(hull.length - 2), hull(hull.length - 1), p) <= 0)
          hull.remove(hull.length - 1)
        hull += p
      }
      val lower = hull.length + 1
      for (p <- pts.reverse) {
        while (hull.length >= lower && cross(hull(hull.length - 2), hull(hull.length - 1), p) <= 0)
          hull.remove(hull.length - 1)
        hull += p
      }
      hull.remove(hull.length - 1)
      val ring = (hull :+ hull.head).flatMap(p => Array(p._1, p._2)).toArray
      Polygon(Array(ring))
    }
  }

  private def collectPoints(g: Geom): ArrayBuffer[(Double, Double)] = {
    val out = new ArrayBuffer[(Double, Double)]()
    def add(cs: Array[Double]): Unit = {
      var i = 0; while (i < cs.length) { out += ((cs(i), cs(i + 1))); i += 2 }
    }
    g match {
      case p: Point => if (!p.isEmpty) out += ((p.x, p.y))
      case m: MultiPoint => m.points.foreach(p => if (!p.isEmpty) out += ((p.x, p.y)))
      case l: LineString => add(l.coords)
      case m: MultiLineString => m.lines.foreach(l => add(l.coords))
      case p: Polygon => p.rings.foreach(add)
      case m: MultiPolygon => m.polys.foreach(_.rings.foreach(add))
      case c: GeometryCollection => c.geoms.foreach(g2 => out ++= collectPoints(g2))
      case s: Surface => out ++= collectPoints(s.toMulti)
    }
    out
  }

  /** Sutherland-Hodgman clip of a polygon by a rectangle — the tile-clipping
    * core (reference analog: OGRGeometry::Intersection with a rectangle
    * cutter, /root/reference/ogr/ogrgeometry.cpp:5318; v1 scope per SURVEY §2.D). */
  def clipRingToRect(ring: Array[Double], e: Envelope): Array[Double] = {
    var cur = ring
    // clip against each of the 4 half-planes
    var side = 0
    while (side < 4 && cur.length >= 2) {
      val out = new ArrayBuffer[Double]()
      def inside(x: Double, y: Double): Boolean = side match {
        case 0 => x >= e.minX
        case 1 => x <= e.maxX
        case 2 => y >= e.minY
        case 3 => y <= e.maxY
      }
      def intersect(ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = side match {
        case 0 => (e.minX, ay + (by - ay) * (e.minX - ax) / (bx - ax))
        case 1 => (e.maxX, ay + (by - ay) * (e.maxX - ax) / (bx - ax))
        case 2 => (ax + (bx - ax) * (e.minY - ay) / (by - ay), e.minY)
        case 3 => (ax + (bx - ax) * (e.maxY - ay) / (by - ay), e.maxY)
      }
      val n = cur.length / 2
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val ax = cur(2 * i); val ay = cur(2 * i + 1)
        val bx = cur(2 * j); val by = cur(2 * j + 1)
        val ia = inside(ax, ay); val ib = inside(bx, by)
        if (ia && ib) { out += bx; out += by }
        else if (ia && !ib) { val (cx, cy) = intersect(ax, ay, bx, by); out += cx; out += cy }
        else if (!ia && ib) {
          val (cx, cy) = intersect(ax, ay, bx, by); out += cx; out += cy; out += bx; out += by
        }
        i += 1
      }
      cur = out.toArray
      side += 1
    }
    if (cur.length < 6) Array.empty
    else {
      // close the ring
      if (cur(0) != cur(cur.length - 2) || cur(1) != cur(cur.length - 1))
        cur ++ Array(cur(0), cur(1))
      else cur
    }
  }

  def clipToRect(g: Geom, e: Envelope): Geom = g match {
    case p: Point => if (e.contains(p.x, p.y)) p else Point.Empty
    case m: MultiPoint => MultiPoint(m.points.filter(p => e.contains(p.x, p.y)))
    case p: Polygon =>
      // open rings for S-H (drop closing vertex), re-close after
      val clipped = p.rings.map { r =>
        val open = if (r.length >= 4 && r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
          r.dropRight(2) else r
        clipRingToRect(open, e)
      }.filter(_.nonEmpty)
      Polygon(clipped)
    case m: MultiPolygon =>
      MultiPolygon(m.polys.map(p => clipToRect(p, e).asInstanceOf[Polygon]).filterNot(_.isEmpty))
    case other => other // line clipping is a v2 item
  }
}
