package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.CurveMeasure

/** Curve-exact (non-linearized) measures vs closed forms.
  * Reference semantics: OGRCircularString::get_Length/get_Area
  * (ogrcircularstring.cpp:195,874), GetCurveParameters
  * (ogrgeometryfactory.cpp:5809), OGRCompoundCurve::get_Area
  * (ogrcompoundcurve.cpp:864). */
class CurveMeasureSpec extends AnyFunSuite {

  private val Pi = math.Pi
  private def len(w: String): Double = CurveMeasure.curveLength(w).get
  private def area(w: String): Double = CurveMeasure.curveArea(w).get

  test("semicircle arc length is exactly pi*r") {
    for (r <- Seq(1.0, 1.5, 2.0, 4.0)) {
      val w = s"CIRCULARSTRING (${-r} 0, 0 $r, $r 0)"
      assert(math.abs(len(w) - Pi * r) < 1e-12 * r, w)
    }
    // power-of-two radii are bit-exact through the scale normalization
    assert(len("CIRCULARSTRING (-2 0, 0 2, 2 0)") == Pi * 2)
  }

  test("3-point full circle: length 2*pi*r, area pi*r^2 (IsFullCircle)") {
    val w = "CIRCULARSTRING (-3 0, 3 0, -3 0)"
    assert(len(w) == 2 * Pi * 3)
    assert(area(w) == Pi * 9.0)
  }

  test("5-point full circle detected when both arcs share center/radius/sweep") {
    val w = "CIRCULARSTRING (-2 0, 0 2, 2 0, 0 -2, -2 0)"
    assert(area(w) == Pi * 4.0)
    assert(math.abs(len(w) - 2 * Pi * 2) < 1e-12)
  }

  test("clockwise half-disc CURVEPOLYGON area is exactly pi*r^2/2 (convex path)") {
    for (r <- Seq(1.0, 2.0, 4.0)) {
      val w = s"CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (${-r} 0, 0 $r, $r 0), ($r 0, ${-r} 0)))"
      assert(math.abs(area(w) - Pi * r * r / 2) < 1e-12 * r * r, w)
    }
  }

  test("CURVEPOLYGON with full-circle hole subtracts exactly") {
    val w = "CURVEPOLYGON (CIRCULARSTRING (-4 0, 4 0, -4 0), CIRCULARSTRING (-2 0, 2 0, -2 0))"
    assert(area(w) == Pi * 16.0 - Pi * 4.0)
  }

  test("collinear triple degrades to the chord (reference fallback)") {
    val w = "CIRCULARSTRING (0 0, 1 0, 2 0)"
    assert(len(w) == 2.0)
  }

  test("MULTICURVE length sums members; line sections are euclidean") {
    val w = "MULTICURVE (CIRCULARSTRING (-1 0, 0 1, 1 0), (1 0, 1 3))"
    assert(math.abs(len(w) - (Pi + 3.0)) < 1e-12)
  }

  test("non-convex ring falls back to 4-degree linearization (approximate)") {
    // counter-clockwise semicircle ring: IsConvex sees a CCW turn
    val r = 2.0
    val w = s"CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING ($r 0, 0 $r, ${-r} 0), (${-r} 0, $r 0)))"
    val a = area(w)
    val exact = Pi * r * r / 2
    assert(a < exact && a > exact * 0.999, s"got $a vs $exact")
  }

  test("unparseable / non-curve input is None") {
    assert(CurveMeasure.curveLength("POLYGON ((0 0, 1 0, 1 1, 0 0))").isEmpty)
    assert(CurveMeasure.curveLength("CIRCULARSTRING Z (0 0 0, 1 1 1, 2 0 0)").isEmpty)
    assert(CurveMeasure.curveArea("not wkt").isEmpty)
  }

  test("open curve measures area 0 (get_Area closed guard)") {
    assert(area("CIRCULARSTRING (-1 0, 0 1, 1 0)") == 0.0)
  }
}
