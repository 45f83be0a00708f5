package graft.geom

/** `gdal vector check-geometry` kernel
  * (/root/reference/apps/gdalalg_vector_check_geometry.cpp:140-270):
  * per-feature validity detail — a GEOS-IsValidOp-style reason string and
  * an error location point, null/None for valid input. The reason strings
  * are the GEOS TopologyValidationError vocabulary the reference surfaces
  * verbatim through `error`/`error_location` fields.
  *
  * This is an independent implementation over the engine's Geom ADT:
  * structural checks first (ring closure, point counts, finite coords),
  * then ring self-intersection, cross-ring intersection, hole placement
  * and shell nesting. Per-feature cost is O(segments²) within one
  * feature — independent of dataset size, so the operator maps
  * embarrassingly at any scale. */
object CheckGeometry {

  /** None = valid. Some((reason, x, y)) with the GEOS vocabulary. */
  def validityDetail(g: Geom): Option[(String, Double, Double)] = g match {
    case p: Point =>
      if (java.lang.Double.isFinite(p.x) && java.lang.Double.isFinite(p.y)) None
      else Some(("Invalid Coordinate", 0.0, 0.0))
    case m: MultiPoint => m.points.iterator.flatMap(validityDetail).nextOption()
    case l: LineString =>
      if (l.coords.exists(c => !java.lang.Double.isFinite(c)))
        Some(("Invalid Coordinate", l.coords(0), l.coords(1)))
      else if (l.numPoints < 2)
        Some(("Too few points in geometry component",
          if (l.coords.nonEmpty) l.coords(0) else 0.0,
          if (l.coords.nonEmpty) l.coords(1) else 0.0))
      else None
    case m: MultiLineString => m.lines.iterator.flatMap(validityDetail).nextOption()
    case p: Polygon => checkPolygon(p.rings)
    case m: MultiPolygon =>
      val per = m.polys.iterator.flatMap(pp => checkPolygon(pp.rings)).nextOption()
      per.orElse(nestedShells(m))
    case c: GeometryCollection => c.geoms.iterator.flatMap(validityDetail).nextOption()
    case s: Surface => validityDetail(s.toMulti)
  }

  private def checkPolygon(rings: Array[Array[Double]]): Option[(String, Double, Double)] = {
    if (rings.isEmpty) return None // empty polygon is valid
    // structural, in GEOS check order: coordinates → closure → point count
    var ri = 0
    while (ri < rings.length) {
      val r = rings(ri)
      if (r.exists(c => !java.lang.Double.isFinite(c)))
        return Some(("Invalid Coordinate", r(0), r(1)))
      if (r.length < 2 || r(0) != r(r.length - 2) || r(1) != r(r.length - 1))
        return Some(("Ring is not closed", r(0), r(1)))
      // closed ring needs >= 4 points (incl. closure)
      if (r.length / 2 < 4)
        return Some(("Too few points in geometry component", r(0), r(1)))
      ri += 1
    }
    // ring self-intersection (within one ring)
    ri = 0
    while (ri < rings.length) {
      ringSelfIntersection(rings(ri)) match {
        case Some((x, y)) => return Some(("Ring Self-intersection", x, y))
        case None =>
      }
      ri += 1
    }
    // cross-ring intersection (shell×hole, hole×hole)
    ri = 0
    while (ri < rings.length) {
      var rj = ri + 1
      while (rj < rings.length) {
        crossRingIntersection(rings(ri), rings(rj)) match {
          case Some((x, y)) => return Some(("Self-intersection", x, y))
          case None =>
        }
        rj += 1
      }
      ri += 1
    }
    // hole placement: first hole vertex must fall inside the shell
    val shell = rings(0)
    ri = 1
    while (ri < rings.length) {
      val h = rings(ri)
      val hx = h(0); val hy = h(1)
      if (!GeoOps.isPointInRing(shell, hx, hy, testEnvelope = true) &&
          !GeoOps.isPointOnRingBoundary(shell, hx, hy, testEnvelope = true))
        return Some(("Hole lies outside shell", hx, hy))
      ri += 1
    }
    // nested holes
    ri = 1
    while (ri < rings.length) {
      var rj = 1
      while (rj < rings.length) {
        if (ri != rj) {
          val h = rings(ri)
          if (GeoOps.isPointInRing(rings(rj), h(0), h(1), testEnvelope = true))
            return Some(("Holes are nested", h(0), h(1)))
        }
        rj += 1
      }
      ri += 1
    }
    None
  }

  private def nestedShells(m: MultiPolygon): Option[(String, Double, Double)] = {
    var i = 0
    while (i < m.polys.length) {
      var j = 0
      while (j < m.polys.length) {
        if (i != j && m.polys(i).rings.nonEmpty && m.polys(j).rings.nonEmpty) {
          val s = m.polys(i).rings(0)
          if (GeoOps.isPointInRing(m.polys(j).rings(0), s(0), s(1), testEnvelope = true))
            return Some(("Nested shells", s(0), s(1)))
        }
        j += 1
      }
      i += 1
    }
    None
  }

  /** First self-intersection of one ring: any two non-adjacent segments
    * that cross or touch. Adjacent segments (sharing exactly their common
    * vertex) and the closure pair are legal. */
  private def ringSelfIntersection(r: Array[Double]): Option[(Double, Double)] = {
    val n = r.length / 2 - 1 // segment count
    var i = 0
    while (i < n) {
      var j = i + 2
      while (j < n) {
        // the closure pair (first, last) is adjacent too
        if (!(i == 0 && j == n - 1)) {
          val p = segmentIntersection(
            r(2 * i), r(2 * i + 1), r(2 * i + 2), r(2 * i + 3),
            r(2 * j), r(2 * j + 1), r(2 * j + 2), r(2 * j + 3))
          if (p.isDefined) return p
        }
        j += 1
      }
      i += 1
    }
    None
  }

  /** First intersection point between segments of two different rings.
    * GEOS permits a single tangent point between rings; this check
    * reports ANY contact (stricter — documented deviation, COVERAGE.md),
    * which is exact for the common crossing/overlap defects. */
  private def crossRingIntersection(a: Array[Double], b: Array[Double]): Option[(Double, Double)] = {
    val na = a.length / 2 - 1; val nb = b.length / 2 - 1
    var i = 0
    while (i < na) {
      var j = 0
      while (j < nb) {
        val p = segmentIntersection(
          a(2 * i), a(2 * i + 1), a(2 * i + 2), a(2 * i + 3),
          b(2 * j), b(2 * j + 1), b(2 * j + 2), b(2 * j + 3))
        if (p.isDefined) return p
        j += 1
      }
      i += 1
    }
    None
  }

  /** Closed-segment intersection point, endpoints included; collinear
    * overlaps report the first overlapping endpoint. */
  private def segmentIntersection(ax: Double, ay: Double, bx: Double, by: Double,
                                  cx: Double, cy: Double, dx: Double, dy: Double): Option[(Double, Double)] = {
    val rx = bx - ax; val ry = by - ay
    val sx = dx - cx; val sy = dy - cy
    val den = rx * sy - ry * sx
    val qpx = cx - ax; val qpy = cy - ay
    if (den == 0.0) {
      // parallel; collinear iff (c-a) × r == 0
      if (qpx * ry - qpy * rx != 0.0) None
      else {
        // project onto r, check 1-D overlap
        val rr = rx * rx + ry * ry
        if (rr == 0.0) {
          if (ax == cx && ay == cy) Some((ax, ay)) else None
        } else {
          val t0 = (qpx * rx + qpy * ry) / rr
          val t1 = ((dx - ax) * rx + (dy - ay) * ry) / rr
          val lo = math.max(0.0, math.min(t0, t1))
          val hi = math.min(1.0, math.max(t0, t1))
          if (lo > hi) None
          else Some((ax + lo * rx, ay + lo * ry))
        }
      }
    } else {
      val t = (qpx * sy - qpy * sx) / den
      val u = (qpx * ry - qpy * rx) / den
      if (t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0)
        Some((ax + t * rx, ay + t * ry))
      else None
    }
  }
}
