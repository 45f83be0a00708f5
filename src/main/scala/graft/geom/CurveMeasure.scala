package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Curve-exact (non-linearized) length and area for circular-arc geometry.
  *
  * The rest of the engine linearizes CIRCULARSTRING at WKT parse time (the
  * OGR default-4°-stroke behavior, see [[Arc]]); these measures instead
  * operate on the raw arc control points, the way the reference measures
  * native curve geometries:
  *
  *  - arc parameters: OGRGeometryFactory::GetCurveParameters
  *    (/root/reference/ogr/ogrgeometryfactory.cpp:5809-5899) — circle
  *    special case for coincident endpoints, scale-normalized circumcenter,
  *    monotone alpha ordering by determinant sign;
  *  - exact length: OGRCircularString::get_Length
  *    (/root/reference/ogr/ogrcircularstring.cpp:195-224) — |α2−α0|·R per
  *    3-point arc, euclidean chord fallback for degenerate triples;
  *  - exact area: OGRCircularString::get_Area
  *    (/root/reference/ogr/ogrcircularstring.cpp:874-904) — π·R² for the
  *    3/5-point full circle (IsFullCircle, :783-832), convex shortcut =
  *    control-polygon Green's-theorem area (OGRSimpleCurve::get_LinearArea,
  *    /root/reference/ogr/ogrlinestring.cpp:2989-3012) plus circular
  *    segments (get_AreaOfCurveSegments, ogrcircularstring.cpp:836-866,
  *    0.5·R²·|Δα−sin Δα| per half-arc), else linearize-and-shoelace;
  *  - compound rings: OGRCompoundCurve::get_Area
  *    (/root/reference/ogr/ogrcompoundcurve.cpp:864-894);
  *  - polygons: OGRCurvePolygon::get_Area (exterior minus interiors,
  *    /root/reference/ogr/ogrcurvepolygon.cpp);
  *  - convexity: OGRCurve::IsConvex (/root/reference/ogr/ogrcurve.cpp:
  *    296-323) — no counter-clockwise turn over the raw point sequence.
  *
  * 2-D only (the gate generator emits 2-D WKT); Z/M curve WKT is rejected
  * (→ null at the expression layer) rather than mis-measured.
  */
object CurveMeasure {

  /** One curve section: packed (x,y)* control points. Arc sections hold the
    * raw CIRCULARSTRING triples; line sections are straight vertex chains. */
  sealed trait Seg { def pts: Array[Double] }
  final case class ArcSeg(pts: Array[Double]) extends Seg
  final case class LineSeg(pts: Array[Double]) extends Seg

  sealed trait CurveGeom
  /** CIRCULARSTRING / LINESTRING / COMPOUNDCURVE as a section list. */
  final case class CurveLine(segs: Seq[Seg]) extends CurveGeom
  /** CURVEPOLYGON: rings, each a section list (exterior first). */
  final case class CurvePoly(rings: Seq[Seq[Seg]]) extends CurveGeom
  /** MULTICURVE: member curves. */
  final case class MultiCurve(members: Seq[Seq[Seg]]) extends CurveGeom

  /** GetCurveParameters (ogrgeometryfactory.cpp:5809): (R, cx, cy, α0, α1,
    * α2) of the arc through three points, or None when collinear/NaN. */
  def curveParameters(x0: Double, y0: Double, x1: Double, y1: Double,
                      x2: Double, y2: Double): Option[(Double, Double, Double, Double, Double, Double)] = {
    if (x0.isNaN || y0.isNaN || x1.isNaN || y1.isNaN || x2.isNaN || y2.isNaN)
      return None
    // Full circle: coincident endpoints around a distinct middle point.
    if (x0 == x2 && y0 == y2) {
      if (x0 != x1 || y0 != y1) {
        val cx = (x0 + x1) / 2
        val cy = (y0 + y1) / 2
        val r = math.sqrt((cx - x0) * (cx - x0) + (cy - y0) * (cy - y0))
        val a0 = math.atan2(y0 - cy, x0 - cx)
        return Some((r, cx, cy, a0, a0 + math.Pi, a0 + 2 * math.Pi))
      }
      return None
    }
    var dx01 = x1 - x0; var dy01 = y1 - y0
    var dx12 = x2 - x1; var dy12 = y2 - y1
    var scale = math.abs(dx01)
    if (math.abs(dy01) > scale) scale = math.abs(dy01)
    if (math.abs(dx12) > scale) scale = math.abs(dx12)
    if (math.abs(dy12) > scale) scale = math.abs(dy12)
    val inv = 1.0 / scale
    dx01 *= inv; dy01 *= inv; dx12 *= inv; dy12 *= inv
    val det = dx01 * dy12 - dx12 * dy01
    if (math.abs(det) < 1.0e-8 || det.isNaN) return None
    val x01m = (x0 + x1) * inv; val x12m = (x1 + x2) * inv
    val y01m = (y0 + y1) * inv; val y12m = (y1 + y2) * inv
    val c01 = dx01 * x01m + dy01 * y01m
    val c12 = dx12 * x12m + dy12 * y12m
    val cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    val cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    var a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    var a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    var a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    val r = math.sqrt((cx - x0) * (cx - x0) + (cy - y0) * (cy - y0))
    if (det < 0) { // clockwise: make alphas non-increasing
      if (a1 > a0) a1 -= 2 * math.Pi
      if (a2 > a1) a2 -= 2 * math.Pi
    } else {
      if (a1 < a0) a1 += 2 * math.Pi
      if (a2 < a1) a2 += 2 * math.Pi
    }
    Some((r, cx, cy, a0, a1, a2))
  }

  private def dist(x0: Double, y0: Double, x1: Double, y1: Double): Double =
    math.sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))

  /** get_Length of one section (ogrcircularstring.cpp:195 for arcs). */
  def segLength(seg: Seg): Double = seg match {
    case LineSeg(p) =>
      var s = 0.0; var i = 0
      while (i + 3 < p.length) { s += dist(p(i), p(i + 1), p(i + 2), p(i + 3)); i += 2 }
      s
    case ArcSeg(p) =>
      var s = 0.0; var i = 0
      while (i + 5 < p.length) {
        curveParameters(p(i), p(i + 1), p(i + 2), p(i + 3), p(i + 4), p(i + 5)) match {
          case Some((r, _, _, a0, _, a2)) => s += math.abs(a2 - a0) * r
          case None => s += dist(p(i), p(i + 1), p(i + 4), p(i + 5))
        }
        i += 4
      }
      s
  }

  /** get_AreaOfCurveSegments (ogrcircularstring.cpp:836): circular-segment
    * area between each arc and its control chord, 0.5·R²·|Δα−sinΔα| summed
    * over the two half-arcs of every triple. Lines contribute 0. */
  def areaOfCurveSegments(seg: Seg): Double = seg match {
    case LineSeg(_) => 0.0
    case ArcSeg(p) =>
      var s = 0.0; var i = 0
      while (i + 5 < p.length) {
        curveParameters(p(i), p(i + 1), p(i + 2), p(i + 3), p(i + 4), p(i + 5)) match {
          case Some((r, _, _, a0, a1, a2)) =>
            val d01 = a1 - a0
            val d12 = a2 - a1
            s += 0.5 * r * r * math.abs(d01 - math.sin(d01) + d12 - math.sin(d12))
          case None => ()
        }
        i += 4
      }
      s
  }

  /** Concatenated raw point sequence of a ring with shared joints deduped
    * (OGRCompoundCurve point-iterator semantics). */
  def ringPoints(segs: Seq[Seg]): Array[Double] = {
    val out = new ArrayBuffer[Double]()
    for (seg <- segs) {
      val p = seg.pts
      var i = 0
      if (out.nonEmpty && p.length >= 2 &&
          out(out.length - 2) == p(0) && out(out.length - 1) == p(1)) i = 2
      while (i < p.length) { out += p(i); i += 1 }
    }
    out.toArray
  }

  private def isClosed(pts: Array[Double]): Boolean =
    pts.length >= 4 && pts(0) == pts(pts.length - 2) && pts(1) == pts(pts.length - 1)

  /** OGRCurve::IsConvex (ogrcurve.cpp:296): no positive cross product over
    * the sliding point triple — i.e. the ring never turns counter-clockwise. */
  def isConvex(pts: Array[Double]): Boolean = {
    var i = 0
    while (i + 5 < pts.length) {
      val cross = (pts(i + 2) - pts(i)) * (pts(i + 5) - pts(i + 3)) -
        (pts(i + 3) - pts(i + 1)) * (pts(i + 4) - pts(i + 2))
      if (cross > 0) return false
      i += 2
    }
    true
  }

  /** OGRSimpleCurve::get_LinearArea (ogrlinestring.cpp:2989): Green's
    * theorem over the stored points (last duplicates first). */
  def linearArea(pts: Array[Double]): Double = {
    val n = pts.length / 2
    if (n < 2 || !isClosed(pts)) return 0.0
    var sum = pts(0) * (pts(3) - pts(2 * (n - 1) + 1))
    var i = 1
    while (i < n - 1) {
      sum += pts(2 * i) * (pts(2 * (i + 1) + 1) - pts(2 * (i - 1) + 1))
      i += 1
    }
    sum += pts(2 * (n - 1)) * (pts(1) - pts(2 * (n - 2) + 1))
    0.5 * math.abs(sum)
  }

  /** IsFullCircle (ogrcircularstring.cpp:783): a closed 3-point arc, or two
    * closed arcs with matching center/radius swept the same way. Returns
    * the squared radius. */
  def fullCircleSquareR(p: Array[Double]): Option[Double] = {
    val n = p.length / 2
    if (!isClosed(p)) return None
    if (n == 3) {
      val cx = (p(0) + p(2)) / 2
      val cy = (p(1) + p(3)) / 2
      return Some((p(2) - cx) * (p(2) - cx) + (p(3) - cy) * (p(3) - cy))
    }
    if (n == 5) {
      (curveParameters(p(0), p(1), p(2), p(3), p(4), p(5)),
        curveParameters(p(4), p(5), p(6), p(7), p(8), p(9))) match {
        case (Some((r1, cx1, cy1, a01, _, a21)), Some((r2, cx2, cy2, a02, _, a22)))
            if math.abs(r1 - r2) < 1e-10 && math.abs(cx1 - cx2) < 1e-10 &&
              math.abs(cy1 - cy2) < 1e-10 && (a21 - a01) * (a22 - a02) > 0 =>
          return Some(r1 * r1)
        case _ => ()
      }
    }
    None
  }

  /** Linearize a ring's sections (arcs at the OGR 4° default) and take the
    * shoelace area — the reference's CurveToLine fallback. */
  private def linearizedArea(segs: Seq[Seg]): Double = {
    val lin = segs.map {
      case ArcSeg(p) => LineSeg(Arc.linearize(p))
      case l: LineSeg => l
    }
    linearArea(ringPoints(lin))
  }

  /** Ring area: OGRCircularString::get_Area for a lone arc section
    * (full-circle / convex / fallback), OGRCompoundCurve::get_Area
    * otherwise. Open rings measure 0 (reference get_Area guards). */
  def ringArea(segs: Seq[Seg]): Double = {
    val pts = ringPoints(segs)
    if (!isClosed(pts)) return 0.0
    segs match {
      case Seq(ArcSeg(p)) =>
        fullCircleSquareR(p) match {
          case Some(sq) => return math.Pi * sq
          case None => ()
        }
      case _ => ()
    }
    if (isConvex(pts)) {
      var a = linearArea(pts)
      for (seg <- segs) a += areaOfCurveSegments(seg)
      a
    } else linearizedArea(segs)
  }

  def lengthOf(segs: Seq[Seg]): Double = {
    var s = 0.0
    for (seg <- segs) s += segLength(seg)
    s
  }

  /** Exact length of a curve WKT (CURVEPOLYGON → ring perimeters summed,
    * MULTICURVE → member sum). None on unparseable / non-curve input. */
  def curveLength(wkt: String): Option[Double] = parse(wkt).map {
    case CurveLine(segs) => lengthOf(segs)
    case CurvePoly(rings) => rings.map(lengthOf).sum
    case MultiCurve(ms) => ms.map(lengthOf).sum
  }

  /** Exact area of a curve WKT: CURVEPOLYGON exterior minus interiors;
    * closed lone curves measure their enclosed area (reference get_Area on
    * the curve itself); MULTICURVE sums members. */
  def curveArea(wkt: String): Option[Double] = parse(wkt).map {
    case CurveLine(segs) => ringArea(segs)
    case CurvePoly(rings) =>
      if (rings.isEmpty) 0.0
      else rings.tail.foldLeft(ringArea(rings.head))((a, r) => a - ringArea(r))
    case MultiCurve(ms) => ms.map(ringArea).sum
  }

  // ------------------------------------------------------------- parser

  /** Parse curve WKT keeping arc control points raw (contrast Wkt.scala,
    * which linearizes arcs on read). 2-D only. */
  def parse(wkt: String): Option[CurveGeom] =
    try Some(new P(wkt).top()) catch { case _: Exception => None }

  private final class P(s: String) {
    private var pos = 0
    private def fail(m: String): Nothing = throw new IllegalArgumentException(m)
    private def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def word(): String = {
      skipWs(); val st = pos
      while (pos < s.length && (s.charAt(pos).isLetter || s.charAt(pos) == '_')) pos += 1
      if (pos == st) fail(s"expected word at $st")
      s.substring(st, pos).toUpperCase
    }
    private def peek(): Char = { skipWs(); if (pos < s.length) s.charAt(pos) else '\u0000' }
    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c' at $pos")
      pos += 1
    }
    private def number(): Double = {
      skipWs(); val st = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == st) fail(s"expected number at $st")
      java.lang.Double.parseDouble(s.substring(st, pos))
    }
    private def coordSeq(): Array[Double] = {
      expect('(')
      val out = new ArrayBuffer[Double]()
      var more = true
      while (more) {
        out += number(); out += number()
        if (peek() == ',') { pos += 1 } else more = false
      }
      expect(')')
      out.toArray
    }
    private def segment(): Seg = peek() match {
      case '(' => LineSeg(coordSeq())
      case _ => word() match {
        case "CIRCULARSTRING" => ArcSeg(coordSeq())
        case "LINESTRING" => LineSeg(coordSeq())
        case w => fail(s"unsupported section $w")
      }
    }
    private def sectionList(): Seq[Seg] = {
      expect('(')
      val out = new ArrayBuffer[Seg]()
      var more = true
      while (more) {
        out += segment()
        if (peek() == ',') { pos += 1 } else more = false
      }
      expect(')')
      out.toSeq
    }
    /** One ring / member curve: bare sequence, CIRCULARSTRING, or COMPOUNDCURVE. */
    private def ring(): Seq[Seg] = peek() match {
      case '(' => Seq(LineSeg(coordSeq()))
      case _ => word() match {
        case "CIRCULARSTRING" => Seq(ArcSeg(coordSeq()))
        case "LINESTRING" => Seq(LineSeg(coordSeq()))
        case "COMPOUNDCURVE" => sectionList()
        case w => fail(s"unsupported ring $w")
      }
    }
    private def ringList(): Seq[Seq[Seg]] = {
      expect('(')
      val out = new ArrayBuffer[Seq[Seg]]()
      var more = true
      while (more) {
        out += ring()
        if (peek() == ',') { pos += 1 } else more = false
      }
      expect(')')
      out.toSeq
    }
    def top(): CurveGeom = {
      val g = word() match {
        case "CIRCULARSTRING" => CurveLine(Seq(ArcSeg(coordSeq())))
        case "LINESTRING" => CurveLine(Seq(LineSeg(coordSeq())))
        case "COMPOUNDCURVE" => CurveLine(sectionList())
        case "CURVEPOLYGON" => CurvePoly(ringList())
        case "MULTICURVE" => MultiCurve(ringList())
        case w => fail(s"unsupported type $w")
      }
      skipWs()
      if (pos != s.length) fail(s"trailing input at $pos")
      g
    }
  }
}
