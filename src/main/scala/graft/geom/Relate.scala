package graft.geom

import scala.collection.mutable.ArrayBuffer

/** DE-9IM spatial predicates for the linear subset (reference:
  * OGRGeometry::Within/Touches/Crosses/Overlaps/Equals,
  * /root/reference/ogr/ogrgeometry.cpp:6009-6409, which delegate to GEOS).
  * Re-derived from the DE-9IM matrix definitions per dimension pair:
  *  - areal/areal via boolean-op areas (Martinez–Rueda sweep)
  *  - line/areal via exact segment subdivision + midpoint location
  *    (interior / boundary / exterior length decomposition)
  *  - line/line via pairwise segment intersection dimension analysis
  *  - point vs any via point location (interior / boundary / exterior)
  * Exact double arithmetic throughout — same robustness class as the
  * overlay core. */
object Relate {

  private final val Interior = 0
  private final val Boundary = 1
  private final val Exterior = 2

  private def dimOf(g: Geom): Int = g match {
    case _: Point | _: MultiPoint => 0
    case _: LineString | _: MultiLineString => 1
    case _: Polygon | _: MultiPolygon => 2
    case _: Surface => 2 // facet surfaces relate as their MultiPolygon cast
    case GeometryCollection(gs) => if (gs.isEmpty) -1 else gs.map(dimOf).max
    case _ => -1
  }

  private def points(g: Geom): Array[Point] = g match {
    case p: Point => Array(p)
    case MultiPoint(ps) => ps
    case GeometryCollection(gs) => gs.flatMap(points)
    case _ => Array.empty
  }

  private def lines(g: Geom): Array[Array[Double]] = g match {
    case LineString(cs) => Array(cs)
    case MultiLineString(ls) => ls.map(_.coords)
    case GeometryCollection(gs) => gs.flatMap(lines)
    case _ => Array.empty
  }

  private def rings(g: Geom): Array[Array[Double]] = g match {
    case p: Polygon => p.rings
    case MultiPolygon(ps) => ps.flatMap(_.rings)
    case GeometryCollection(gs) => gs.flatMap(rings)
    case s: Surface => s.toMulti.polys.flatMap(_.rings)
    case _ => Array.empty
  }

  // ---- point location --------------------------------------------------

  /** Interior / Boundary / Exterior of an areal geometry (even-odd). */
  def locateInAreal(g: Geom, x: Double, y: Double): Int = {
    val rs = rings(g)
    var i = 0
    while (i < rs.length) {
      if (GeoOps.isPointOnRingBoundary(rs(i), x, y, testEnvelope = true)) return Boundary
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < rs.length) {
      if (GeoOps.isPointInRing(rs(i), x, y, testEnvelope = true)) cnt += 1
      i += 1
    }
    if (cnt % 2 == 1) Interior else Exterior
  }

  /** Interior / Boundary (endpoint) / Exterior of a lineal geometry. */
  def locateOnLineal(g: Geom, x: Double, y: Double): Int = {
    val ls = lines(g)
    var res = Exterior
    var i = 0
    while (i < ls.length) {
      val cs = ls(i)
      val n = cs.length
      if (n >= 4) {
        val isEnd = (x == cs(0) && y == cs(1)) || (x == cs(n - 2) && y == cs(n - 1))
        var onSeg = false
        var j = 0
        while (j + 3 < n && !onSeg) {
          if (onSegment(cs(j), cs(j + 1), cs(j + 2), cs(j + 3), x, y)) onSeg = true
          j += 2
        }
        if (onSeg) {
          if (isEnd) { if (res == Exterior) res = Boundary }
          else return Interior
        }
      }
      i += 1
    }
    res
  }

  @inline private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
                                px: Double, py: Double): Boolean = {
    val cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    if (cross != 0.0) return false
    px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)
  }

  // ---- line vs areal decomposition ------------------------------------

  /** Split every line segment at areal-boundary crossings; returns
    * (interiorLen, boundaryLen, exteriorLen, anyContactPoint). */
  private def lineArealSplit(l: Geom, a: Geom): (Double, Double, Double, Boolean) = {
    val rs = rings(a)
    var li = 0.0; var lb = 0.0; var le = 0.0
    var contact = false
    lines(l).foreach { cs =>
      var i = 0
      while (i + 3 < cs.length) {
        val ax = cs(i); val ay = cs(i + 1); val bx = cs(i + 2); val by = cs(i + 3)
        val ts = new ArrayBuffer[Double]()
        ts += 0.0; ts += 1.0
        rs.foreach { r =>
          var j = 0
          while (j + 3 < r.length) {
            collectParams(ax, ay, bx, by, r(j), r(j + 1), r(j + 2), r(j + 3), ts)
            j += 2
          }
        }
        val st = ts.distinct.sorted
        var k = 0
        while (k + 1 < st.length) {
          val t0 = st(k); val t1 = st(k + 1)
          if (t1 > t0) {
            val mx = ax + (bx - ax) * (t0 + t1) / 2.0
            val my = ay + (by - ay) * (t0 + t1) / 2.0
            val len = math.sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) * (t1 - t0)
            locateInAreal(a, mx, my) match {
              case Interior => li += len; contact = true
              case Boundary => lb += len; contact = true
              case _        => le += len
            }
          }
          k += 1
        }
        // 0-dim contact at a split point (e.g. grazing a vertex)
        if (!contact) {
          var k2 = 0
          while (k2 < st.length && !contact) {
            val px = ax + (bx - ax) * st(k2); val py = ay + (by - ay) * st(k2)
            if (locateInAreal(a, px, py) != Exterior) contact = true
            k2 += 1
          }
        }
        i += 2
      }
    }
    (li, lb, le, contact)
  }

  /** Add intersection parameters of segment (a..b) with segment (c..d)
    * to `ts` (params on a..b). Handles point crossings and collinear
    * overlap endpoints. */
  private def collectParams(ax: Double, ay: Double, bx: Double, by: Double,
                            cx: Double, cy: Double, dx0: Double, dy0: Double,
                            ts: ArrayBuffer[Double]): Unit = {
    val vax = bx - ax; val vay = by - ay
    val vbx = dx0 - cx; val vby = dy0 - cy
    val ex = cx - ax; val ey = cy - ay
    val kross = vax * vby - vay * vbx
    if (kross != 0.0) {
      val s = (ex * vby - ey * vbx) / kross
      if (s < 0.0 || s > 1.0) return
      val t = (ex * vay - ey * vax) / kross
      if (t < 0.0 || t > 1.0) return
      ts += s
    } else {
      if (ex * vay - ey * vax != 0.0) return // parallel, not collinear
      val den = vax * vax + vay * vay
      if (den == 0.0) return
      val s0 = (ex * vax + ey * vay) / den
      val s1 = ((dx0 - ax) * vax + (dy0 - ay) * vay) / den
      val lo = math.max(0.0, math.min(s0, s1)); val hi = math.min(1.0, math.max(s0, s1))
      if (lo <= hi) { ts += lo; ts += hi }
    }
  }

  // ---- line vs line ----------------------------------------------------

  /** (hasInteriorInteriorPoint, hasInteriorInteriorLength, anyIntersection) */
  private def lineLineAnalysis(a: Geom, b: Geom): (Boolean, Boolean, Boolean) = {
    var ii0 = false; var ii1 = false; var any = false
    val la = lines(a); val lb = lines(b)
    la.foreach { ca =>
      var i = 0
      while (i + 3 < ca.length) {
        lb.foreach { cb =>
          var j = 0
          while (j + 3 < cb.length) {
            val ts = new ArrayBuffer[Double]()
            collectParams(ca(i), ca(i + 1), ca(i + 2), ca(i + 3),
              cb(j), cb(j + 1), cb(j + 2), cb(j + 3), ts)
            if (ts.nonEmpty) {
              any = true
              if (ts.length >= 2 && math.abs(ts(1) - ts(0)) > 0.0) ii1 = true
              ts.foreach { t =>
                val px = ca(i) + (ca(i + 2) - ca(i)) * t
                val py = ca(i + 1) + (ca(i + 3) - ca(i + 1)) * t
                if (locateOnLineal(a, px, py) == Interior &&
                    locateOnLineal(b, px, py) == Interior) ii0 = true
              }
            }
            j += 2
          }
        }
        i += 2
      }
    }
    (ii0, ii1, any)
  }

  /** Every point of lineal a lies on lineal b (coverage by collinear
    * overlap intervals). */
  private def lineCoveredByLine(a: Geom, b: Geom): Boolean = {
    val lb = lines(b)
    lines(a).forall { ca =>
      var i = 0
      var ok = true
      while (i + 3 < ca.length && ok) {
        val iv = new ArrayBuffer[(Double, Double)]()
        lb.foreach { cb =>
          var j = 0
          while (j + 3 < cb.length) {
            val ts = new ArrayBuffer[Double]()
            collectParams(ca(i), ca(i + 1), ca(i + 2), ca(i + 3),
              cb(j), cb(j + 1), cb(j + 2), cb(j + 3), ts)
            if (ts.length >= 2) iv += ((math.min(ts(0), ts(1)), math.max(ts(0), ts(1))))
            j += 2
          }
        }
        val sorted = iv.sortBy(_._1)
        var cover = 0.0
        var k = 0
        var gap = false
        while (k < sorted.length && !gap) {
          if (sorted(k)._1 > cover) gap = true
          else cover = math.max(cover, sorted(k)._2)
          k += 1
        }
        ok = !gap && cover >= 1.0
        i += 2
      }
      ok
    }
  }

  // ---- areal vs areal --------------------------------------------------

  private def arealArea(g: Geom): Double = GeoOps.area(g)

  // ---- public predicates ----------------------------------------------

  def intersects(a: Geom, b: Geom): Boolean = GeoOps.intersects(a, b)
  def disjoint(a: Geom, b: Geom): Boolean = !intersects(a, b)

  def within(a: Geom, b: Geom): Boolean = (dimOf(a), dimOf(b)) match {
    case (0, 0) =>
      val pb = points(b)
      val pa = points(a)
      pa.nonEmpty && pa.forall(p => pb.exists(q => q.x == p.x && q.y == p.y))
    case (0, 1) =>
      val pa = points(a)
      pa.nonEmpty && pa.forall(p => locateOnLineal(b, p.x, p.y) != Exterior) &&
        pa.exists(p => locateOnLineal(b, p.x, p.y) == Interior)
    case (0, 2) =>
      val pa = points(a)
      pa.nonEmpty && pa.forall(p => locateInAreal(b, p.x, p.y) != Exterior) &&
        pa.exists(p => locateInAreal(b, p.x, p.y) == Interior)
    case (1, 1) =>
      GeoOps.length(a) > 0 && lineCoveredByLine(a, b)
    case (1, 2) =>
      val (li, _, le, _) = lineArealSplit(a, b)
      le == 0.0 && li > 0.0
    case (2, 2) =>
      arealArea(BoolOps.difference(a, b)) < 1e-12 &&
        arealArea(BoolOps.intersection(a, b)) > 0.0
    case _ => false // higher-dim inside lower-dim impossible
  }

  def contains(a: Geom, b: Geom): Boolean = within(b, a)

  def touches(a: Geom, b: Geom): Boolean = (dimOf(a), dimOf(b)) match {
    case (0, 0) => false // point interiors are the points; any contact is I∩I
    case (0, 1) =>
      val pa = points(a)
      pa.exists(p => locateOnLineal(b, p.x, p.y) == Boundary) &&
        !pa.exists(p => locateOnLineal(b, p.x, p.y) == Interior)
    case (0, 2) =>
      val pa = points(a)
      pa.exists(p => locateInAreal(b, p.x, p.y) == Boundary) &&
        !pa.exists(p => locateInAreal(b, p.x, p.y) == Interior)
    case (1, 0) | (2, 0) => touches(b, a)
    case (1, 1) =>
      val (ii0, ii1, any) = lineLineAnalysis(a, b)
      any && !ii0 && !ii1
    case (1, 2) =>
      val (li, lb0, le, contact) = lineArealSplit(a, b)
      (lb0 > 0.0 || contact) && li == 0.0 && (lb0 + le > 0.0 || le == 0.0)
    case (2, 1) => touches(b, a)
    case (2, 2) =>
      intersects(a, b) && arealArea(BoolOps.intersection(a, b)) < 1e-12
    case _ => false
  }

  def crosses(a: Geom, b: Geom): Boolean = (dimOf(a), dimOf(b)) match {
    case (0, 1) | (0, 2) =>
      // multipoint: some inside the interior, some outside
      val pa = points(a)
      val loc = pa.map(p => if (dimOf(b) == 1) locateOnLineal(b, p.x, p.y)
                            else locateInAreal(b, p.x, p.y))
      loc.contains(Interior) && loc.contains(Exterior)
    case (1, 0) | (2, 0) => crosses(b, a)
    case (1, 1) =>
      val (ii0, ii1, _) = lineLineAnalysis(a, b)
      ii0 && !ii1
    case (1, 2) =>
      val (li, _, le, _) = lineArealSplit(a, b)
      li > 0.0 && le > 0.0
    case (2, 1) => crosses(b, a)
    case _ => false // areal/areal never crosses
  }

  def overlaps(a: Geom, b: Geom): Boolean = (dimOf(a), dimOf(b)) match {
    case (0, 0) =>
      val pa = points(a); val pb = points(b)
      def on(p: Point, ps: Array[Point]) = ps.exists(q => q.x == p.x && q.y == p.y)
      pa.exists(p => on(p, pb)) && pa.exists(p => !on(p, pb)) && pb.exists(q => !on(q, pa))
    case (1, 1) =>
      val (_, ii1, _) = lineLineAnalysis(a, b)
      ii1 && !lineCoveredByLine(a, b) && !lineCoveredByLine(b, a)
    case (2, 2) =>
      arealArea(BoolOps.intersection(a, b)) > 0.0 &&
        arealArea(BoolOps.difference(a, b)) > 1e-12 &&
        arealArea(BoolOps.difference(b, a)) > 1e-12
    case _ => false // overlaps requires equal dimensions
  }

  def equalsG(a: Geom, b: Geom): Boolean = (dimOf(a), dimOf(b)) match {
    case (0, 0) => within(a, b) && within(b, a)
    case (1, 1) => lineCoveredByLine(a, b) && lineCoveredByLine(b, a)
    case (2, 2) =>
      arealArea(BoolOps.symDifference(a, b)) < 1e-12 && arealArea(a) > 0.0
    case _ => false
  }
}
