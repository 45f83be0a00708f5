package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Antimeridian (±180°) geometry wrapping — the WRAPDATELINE=YES path of
  * OGRGeometryFactory::transformWithOptions
  * (/root/reference/ogr/ogrgeometryfactory.cpp:4430-4620):
  *
  *  - points: longitude normalized into [-180, 180]
  *    (WrapPointDateLine, :3401-3412);
  *  - linestrings: the big-longitude-gap heuristic
  *    (CutGeometryOnDateLineAndAddToMulti, :3417-3596) then an exact
  *    vertex walk splitting each crossing segment at ±180 with an
  *    interpolated crossing vertex on both sides
  *    (SplitLineStringAtDateline, :3137-3249);
  *  - polygons: east-side coordinates shifted +360 to unwrap the ring
  *    (FixPolygonCoordinatesAtDateLine, :3255-3308), then the shifted
  *    polygon is clipped against the two world rectangles and the
  *    eastern piece translated back by −360 (the reference delegates the
  *    clip to GEOS Intersection; here it is the engine's Martinez–Rueda
  *    [[BoolOps.intersection]]);
  *  - multi geometries recurse per member.
  *
  * The default longitude-gap threshold is DATELINEOFFSET=10 (:4598).
  * 2-D only (the engine's Geom model).
  */
object Dateline {

  /** WrapPointDateLine: normalize a longitude into [-180, 180]. */
  def wrapLon(x: Double): Double =
    if (x > 180) ((x + 180) % 360) - 180
    else if (x < -180) -(((-x + 180) % 360) - 180)
    else x

  /** Cut a geometry at the dateline; pieces are collected into the
    * matching multi type (mixed results into a GeometryCollection). */
  def cut(g: Geom, datelineOffset: Double = 10.0): Geom = {
    val pieces = new ArrayBuffer[Geom]()
    cutInto(pieces, g, datelineOffset)
    val ps = pieces.toArray
    if (ps.forall(_.isInstanceOf[LineString]))
      MultiLineString(ps.map(_.asInstanceOf[LineString]))
    else if (ps.forall(_.isInstanceOf[Polygon]))
      MultiPolygon(ps.map(_.asInstanceOf[Polygon]))
    else if (ps.forall(_.isInstanceOf[Point]))
      MultiPoint(ps.map(_.asInstanceOf[Point]))
    else GeometryCollection(ps)
  }

  private def envelopeOf(coords: Array[Double]): (Double, Double) = {
    var mn = Double.MaxValue; var mx = -Double.MaxValue
    var i = 0
    while (i < coords.length) {
      if (coords(i) < mn) mn = coords(i)
      if (coords(i) > mx) mx = coords(i)
      i += 2
    }
    (mn, mx)
  }

  private def cutInto(out: ArrayBuffer[Geom], g: Geom, off: Double): Unit = g match {
    case Point(x, y) => out += Point(wrapLon(x), y)
    case MultiPoint(ps) => ps.foreach(p => cutInto(out, p, off))
    case MultiLineString(ls) => ls.foreach(l => cutInto(out, l, off))
    case MultiPolygon(ps) => ps.foreach(p => cutInto(out, p, off))
    case GeometryCollection(gs) => gs.foreach(s => cutInto(out, s, off))
    case ls: LineString => cutSimple(out, Left(ls), off)
    case p: Polygon => cutSimple(out, Right(p), off)
    case other => out += other
  }

  /** The wkbPolygon/wkbLineString arm of CutGeometryOnDateLineAndAddToMulti. */
  private def cutSimple(out: ArrayBuffer[Geom], g: Either[LineString, Polygon],
                        off: Double): Unit = {
    val leftBorder = 180 - off
    val rightBorder = -180 + off
    val diffSpace = 360 - off
    val orig: Geom = g.fold(identity, identity)
    val ring = g.fold(_.coords, _.rings(0))
    val (minX, maxX) = envelopeOf(ring)
    val aroundMinus180 = minX < -180.0
    val xOffset = if (aroundMinus180) 360.0 else 0.0
    var wrap = false
    var split = false
    var fixed: Polygon = null
    if (minX < -180 || maxX > 180 ||
        (minX + xOffset > leftBorder && maxX + xOffset > 180)) {
      wrap = true
    } else {
      // detect big longitude gaps on the (exterior) ring
      var maxSmallDiff = 0.0
      var hasBigDiff = false
      var i = 2
      while (i + 1 < ring.length) {
        val prevX = ring(i - 2) + xOffset
        val x = ring(i) + xOffset
        val d = math.abs(x - prevX)
        if (d > diffSpace &&
            ((x > leftBorder && prevX < rightBorder) ||
              (prevX > leftBorder && x < rightBorder))) {
          // poles excepted: a 360 jump at ±90 latitude is not a crossing
          val eps = 1e-5
          if (!(math.abs(d - 360) < eps && math.abs(math.abs(ring(i + 1)) - 90) < eps))
            hasBigDiff = true
        } else if (d > maxSmallDiff) maxSmallDiff = d
        i += 2
      }
      if (hasBigDiff && maxSmallDiff < off) {
        g match {
          case Left(_) => split = true
          case Right(p) =>
            fixed = fixPolygonCoordinates(p, off)
            val (fmn, fmx) = envelopeOf(fixed.rings(0))
            wrap = fmn != fmx
        }
      }
    }
    if (split) {
      splitLineString(out, g.left.toOption.get.coords, off, xOffset)
    } else if (wrap) {
      val shift2 = if (!aroundMinus180) -360.0 else 360.0
      val (lo2, hi2) = if (!aroundMinus180) (180.0, 360.0) else (-360.0, -180.0)
      g match {
        case Left(ls) =>
          // the reference clips linework via GEOS Intersection against the
          // two world rectangles; for lines that is an x-interval clip
          val ps1 = clipLineToX(ls.coords, -180.0, 180.0)
          val ps2 = clipLineToX(ls.coords, lo2, hi2).map { c =>
            val d = c.clone(); var i = 0
            while (i < d.length) { d(i) += shift2; i += 2 }
            d
          }
          if (ps1.nonEmpty || ps2.nonEmpty) {
            ps1.foreach(c => out += LineString(c))
            ps2.foreach(c => out += LineString(c))
          } else out += orig
        case Right(_) =>
          val work: Geom = if (fixed != null) fixed else orig
          val p1 = BoolOps.intersection(work, rect(-180, 180))
          val p2 = BoolOps.intersection(work, rect(lo2, hi2))
          val polys1 = flattenPolys(p1)
          val polys2 = flattenPolys(p2).map(shiftLon(_, shift2))
          if (polys1.nonEmpty || polys2.nonEmpty) {
            polys1.foreach(out += _)
            polys2.foreach(out += _)
          } else out += orig
      }
    } else out += orig
  }

  /** Clip a polyline to a longitude interval [x0, x1]: segment-wise walk,
    * boundary crossings interpolated at t = (xb − xA)/(xB − xA) — the
    * linework analog of the reference's rectangle Intersection. */
  private def clipLineToX(coords: Array[Double], x0: Double, x1: Double): Seq[Array[Double]] = {
    val n = coords.length / 2
    val pieces = new ArrayBuffer[Array[Double]]()
    var cur = new ArrayBuffer[Double]()
    def flush(): Unit = {
      if (cur.length >= 4) pieces += cur.toArray
      cur = new ArrayBuffer[Double]()
    }
    def interp(xa: Double, ya: Double, xb: Double, yb: Double, xc: Double): Double = {
      val t = (xc - xa) / (xb - xa)
      ya + t * (yb - ya)
    }
    var i = 0
    while (i < n - 1) {
      val xa = coords(2 * i); val ya = coords(2 * i + 1)
      val xb = coords(2 * i + 2); val yb = coords(2 * i + 3)
      val aIn = xa >= x0 && xa <= x1
      val bIn = xb >= x0 && xb <= x1
      if (aIn && bIn) {
        if (cur.isEmpty) { cur += xa; cur += ya }
        cur += xb; cur += yb
      } else if (aIn) {
        if (cur.isEmpty) { cur += xa; cur += ya }
        val xc = if (xb < x0) x0 else x1
        cur += xc; cur += interp(xa, ya, xb, yb, xc)
        flush()
      } else if (bIn) {
        val xc = if (xa < x0) x0 else x1
        cur += xc; cur += interp(xa, ya, xb, yb, xc)
        cur += xb; cur += yb
      } else if ((xa < x0 && xb > x1) || (xa > x1 && xb < x0)) {
        // spans the whole interval
        val (xe, xf) = if (xa < xb) (x0, x1) else (x1, x0)
        cur += xe; cur += interp(xa, ya, xb, yb, xe)
        cur += xf; cur += interp(xa, ya, xb, yb, xf)
        flush()
      }
      i += 1
    }
    flush()
    pieces.toSeq
  }

  private def rect(x0: Double, x1: Double): Polygon =
    Polygon(Array(Array(x0, -90, x1, -90, x1, 90, x0, 90, x0, -90)))

  private def flattenPolys(g: Geom): Seq[Polygon] = g match {
    case p: Polygon if p.rings.nonEmpty && p.rings(0).length >= 8 => Seq(p)
    case MultiPolygon(ps) => ps.toSeq.filter(p => p.rings.nonEmpty && p.rings(0).length >= 8)
    case GeometryCollection(gs) => gs.toSeq.flatMap(flattenPolys)
    case _ => Seq.empty
  }

  private def shiftLon(p: Polygon, d: Double): Polygon =
    Polygon(p.rings.map { r =>
      val c = r.clone()
      var i = 0
      while (i < c.length) { c(i) += d; i += 2 }
      c
    })

  /** FixPolygonCoordinatesAtDateLine port: walk each ring shifting the
    * east-side vertices +360 (with the go-east carry and the backwards
    * fix-up when the ring recrosses west). */
  def fixPolygonCoordinates(p: Polygon, off: Double): Polygon = {
    val leftBorder = 180 - off
    val rightBorder = -180 + off
    val diffSpace = 360 - off
    Polygon(p.rings.map { r0 =>
      val r = r0.clone()
      var goEast = false
      var i = 2
      while (i + 1 < r.length) {
        var x = r(i)
        val prevX = r(i - 2)
        val d = math.abs(x - prevX)
        if (d > diffSpace) {
          if ((prevX > leftBorder && x < rightBorder) || (x < 0 && goEast)) {
            x += 360
            goEast = true
            r(i) = x
          } else if (prevX < rightBorder && x > leftBorder) {
            var j = i - 2
            while (j >= 0) {
              if (r(j) < 0) r(j) = r(j) + 360
              j -= 2
            }
            goEast = false
          } else goEast = false
        }
        i += 2
      }
      r
    })
  }

  /** SplitLineStringAtDateline port: every vertex walk emits into the
    * current piece; a crossing segment gets an interpolated vertex at +180
    * on one side and −180 opening the next piece (the exact-±180 vertex
    * special cases preserved). */
  def splitLineString(out: ArrayBuffer[Geom], coords: Array[Double],
                      off: Double, xOffset: Double): Unit = {
    val leftBorder = 180 - off
    val rightBorder = -180 + off
    val diffSpace = 360 - off
    val n = coords.length / 2
    var cur = new ArrayBuffer[Double]()
    val pieces = new ArrayBuffer[ArrayBuffer[Double]]()
    pieces += cur
    var i = 0
    while (i < n) {
      val dfX = coords(2 * i) + xOffset
      var emitted = false
      if (i > 0 && math.abs(dfX - (coords(2 * (i - 1)) + xOffset)) > diffSpace) {
        var x1 = coords(2 * (i - 1)) + xOffset
        var y1 = coords(2 * (i - 1) + 1)
        var x2 = coords(2 * i) + xOffset
        var y2 = coords(2 * i + 1)
        if (x1 > -180 && x1 < rightBorder && x2 == 180 && i + 1 < n &&
            coords(2 * (i + 1)) + xOffset > -180 &&
            coords(2 * (i + 1)) + xOffset < rightBorder) {
          // exact +180 vertex between two west-side vertices: emit -180 twin
          cur += -180.0; cur += coords(2 * i + 1)
          i += 1
          cur += coords(2 * i) + xOffset; cur += coords(2 * i + 1)
          emitted = true
        } else if (x1 > leftBorder && x1 < 180 && x2 == -180 && i + 1 < n &&
            coords(2 * (i + 1)) + xOffset > leftBorder &&
            coords(2 * (i + 1)) + xOffset < 180) {
          cur += 180.0; cur += coords(2 * i + 1)
          i += 1
          cur += coords(2 * i) + xOffset; cur += coords(2 * i + 1)
          emitted = true
        } else {
          if (x1 < rightBorder && x2 > leftBorder) {
            val tx = x1; x1 = x2; x2 = tx
            val ty = y1; y1 = y2; y2 = ty
          }
          if (x1 > leftBorder && x2 < rightBorder) x2 += 360
          if (x1 <= 180 && x2 >= 180 && x1 < x2) {
            val ratio = (180 - x1) / (x2 - x1)
            val yc = ratio * y2 + (1 - ratio) * y1
            val newX =
              if (coords(2 * (i - 1)) + xOffset > leftBorder) 180.0 else -180.0
            if (cur.isEmpty ||
                cur(cur.length - 2) != newX || cur(cur.length - 1) != yc) {
              cur += newX; cur += yc
            }
            cur = new ArrayBuffer[Double]()
            pieces += cur
            cur += (if (coords(2 * (i - 1)) + xOffset > leftBorder) -180.0 else 180.0)
            cur += yc
          } else {
            cur = new ArrayBuffer[Double]()
            pieces += cur
          }
        }
      }
      if (!emitted) { cur += dfX; cur += coords(2 * i + 1) }
      i += 1
    }
    pieces.foreach(p => out += LineString(p.toArray))
  }
}
