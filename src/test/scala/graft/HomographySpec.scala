package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{GcpTransform, Homography}
import graft.engine.GcpTransform.Gcp

/** GDALGCPsToHomography / Apply / Compose / Inv semantics
  * (alg/gdal_homography.cpp): fit recovery, inverse round-trip, the
  * no-rotation inverse fast path, the affine fallback under 4 GCPs, and
  * the reference failure conditions. */
class HomographySpec extends AnyFunSuite {

  private val hTrue = Array(10.5, 2.0, 0.25, -3.5, 0.1, 1.5, 1.0, 1e-4, -2e-4)

  private def gcpsFrom(h: Array[Double], n: Int = 4): Seq[Gcp] =
    for (i <- 0 until n; j <- 0 until n) yield {
      val x = i * 100.0; val y = j * 100.0
      val (sx, sy) = Homography.applyH(h, x, y).get
      Gcp(x, y, sx, sy)
    }

  test("fit recovers an exact projective map (projective term included)") {
    val h = Homography.fromGcps(gcpsFrom(hTrue))
    for (x <- Seq(7.0, 133.0, 289.5); y <- Seq(11.0, 151.5, 297.0)) {
      val (ex, ey) = Homography.applyH(hTrue, x, y).get
      val (gx, gy) = Homography.applyH(h, x, y).get
      assert(math.abs(gx - ex) < 1e-9 && math.abs(gy - ey) < 1e-9, s"at ($x,$y)")
    }
  }

  test("invert ∘ apply is identity; no-rotation fast path used for scale+offset") {
    val inv = Homography.invert(hTrue).get
    val (sx, sy) = Homography.applyH(hTrue, 42.0, 17.0).get
    val (bx, by) = Homography.applyH(inv, sx, sy).get
    assert(math.abs(bx - 42.0) < 1e-9 && math.abs(by - 17.0) < 1e-9)
    // no-rotation special case (h2=h4=h7=h8=0): exact simple inverse
    val hs = Array(5.0, 2.0, 0.0, -7.0, 0.0, 4.0, 2.0, 0.0, 0.0)
    val is = Homography.invert(hs).get
    assert(is(2) === 0.0 && is(4) === 0.0 && is(7) === 0.0 && is(8) === 0.0)
    val (fx, fy) = Homography.applyH(hs, 3.0, 9.0).get
    val (rx, ry) = Homography.applyH(is, fx, fy).get
    assert(math.abs(rx - 3.0) < 1e-12 && math.abs(ry - 9.0) < 1e-12)
  }

  test("compose applies h1 then h2") {
    val h2 = Array(1.0, 0.5, 0.0, 2.0, 0.0, 0.25, 1.0, 0.0, 0.0)
    val c = Homography.compose(hTrue, h2)
    val (m1x, m1y) = Homography.applyH(hTrue, 13.0, 29.0).get
    val (ex, ey) = Homography.applyH(h2, m1x, m1y).get
    val (gx, gy) = Homography.applyH(c, 13.0, 29.0).get
    assert(math.abs(gx - ex) < 1e-9 && math.abs(gy - ey) < 1e-9)
  }

  test("under 4 GCPs falls back to the affine fit (gdal_homography.cpp:144)") {
    val aff = Array(3.0, 1.5, -0.25, 7.0, 0.5, 2.0, 1.0, 0.0, 0.0)
    val g3 = Seq(Gcp(0, 0, 3.0, 7.0),
      Gcp(100, 0, 3.0 + 150.0, 7.0 + 50.0),
      Gcp(0, 100, 3.0 - 25.0, 7.0 + 200.0))
    val h = Homography.fromGcps(g3)
    assert(h(7) === 0.0 && h(8) === 0.0 && h(6) === 1.0)
    for (i <- 0 until 6) assert(math.abs(h(i) - aff(i)) < 1e-9, s"h($i)")
  }

  test("reference failure conditions: degenerate extent, non-convex image, |w|<1e-15") {
    // all GCPs on one line → degenerate in a dimension
    intercept[IllegalArgumentException] {
      Homography.fromGcps(Seq(Gcp(0, 5, 0, 0), Gcp(1, 5, 1, 1),
        Gcp(2, 5, 2, 2), Gcp(3, 5, 3, 3)))
    }
    // crossed quadrilateral target → convexity check trips
    intercept[IllegalArgumentException] {
      Homography.fromGcps(Seq(Gcp(0, 0, 0, 0), Gcp(100, 0, 100, 100),
        Gcp(100, 100, 0, 100), Gcp(0, 100, 100, 0)))
    }
    assert(Homography.applyH(Array(1, 1, 1, 1, 1, 1, 0, 0, 0), 5, 5).isEmpty)
  }
}
