package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{GcpTransform, Raster}
import graft.engine.GcpTransform.Gcp

/** GCP polynomial + TPS transformer properties, and warpTransformed's
  * equivalence to warpAffine when the transform IS affine (the general
  * path must reproduce the specialized one bit-for-bit). */
class GcpWarpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // the exact quadratic map the r26 gate also uses
  private def quadX(x: Double, y: Double) =
    120.7133 + 1.731707 * x + 0.0310971 * y + 1.90023e-5 * x * y + 2.70131e-6 * x * x + 1.30117e-6 * y * y
  private def quadY(x: Double, y: Double) =
    57.3177 + 0.0290137 * x + 1.810391 * y + 1.10071e-5 * x * y + 1.70033e-6 * y * y + 3.10057e-6 * x * x

  private val quadGcps = for (i <- 0 until 4; j <- 0 until 4) yield {
    val x = i * 341.0; val y = j * 341.0
    Gcp(x, y, quadX(x, y), quadY(x, y))
  }

  test("order-2 poly fit reproduces a generating quadratic to ~1e-9 px") {
    val m = GcpTransform.fitPoly(quadGcps, order = 2)
    var worst = 0.0
    for (x <- 0 to 1023 by 97; y <- 0 to 1023 by 89) {
      val (sx, sy) = m(x, y)
      worst = math.max(worst,
        math.max(math.abs(sx - quadX(x, y)), math.abs(sy - quadY(x, y))))
    }
    assert(worst < 1e-9, s"worst residual $worst")
  }

  test("order-1 fit of noisy points is the least-squares plane (residual orthogonality)") {
    // points on a plane + symmetric noise: LSQ must split the noise evenly
    val gcps = Seq(
      Gcp(0, 0, 10.0 + 1.0, 5.0), Gcp(0, 0, 10.0 - 1.0, 5.0),
      Gcp(100, 0, 110.0, 5.0), Gcp(0, 100, 10.0, 105.0), Gcp(100, 100, 110.0, 105.0))
    val m = GcpTransform.fitPoly(gcps, order = 1)
    val (sx, _) = m(0, 0)
    assert(math.abs(sx - 10.0) < 1e-9) // mean of the two conflicting GCPs
  }

  test("TPS interpolates its GCPs exactly and reduces to affine on affine GCPs") {
    val curved = quadGcps
    val tps = GcpTransform.fitTps(curved)
    curved.foreach { g =>
      val (sx, sy) = tps(g.px, g.py)
      assert(math.abs(sx - g.sx) < 1e-6 && math.abs(sy - g.sy) < 1e-6,
        s"TPS missed GCP at (${g.px},${g.py})")
    }
    // affine GCPs: RBF weights vanish, transform is affine EVERYWHERE
    val aff = for (i <- 0 until 3; j <- 0 until 3) yield {
      val x = i * 500.0; val y = j * 500.0
      Gcp(x, y, 40.0 + 2.0 * x + 0.1 * y, -7.0 + 0.05 * x + 1.9 * y)
    }
    val tpsAff = GcpTransform.fitTps(aff)
    for (x <- Seq(37.5, 812.25); y <- Seq(111.5, 990.75)) {
      val (sx, sy) = tpsAff(x, y)
      assert(math.abs(sx - (40.0 + 2.0 * x + 0.1 * y)) < 1e-6)
      assert(math.abs(sy - (-7.0 + 0.05 * x + 1.9 * y)) < 1e-6)
    }
  }

  test("warpTransformed(affine fn) == warpAffine, bit-identical, all kernels") {
    val base = Raster.syntheticTiles(spark, 2) { (gx, gy) =>
      ((gx * 7919 + gy * 104729) % 9973).toDouble
    }
    val aff = Raster.WarpAffine(1.3, 0.7, 101.4, 33.9)
    for (kernel <- Seq("near", "bilinear", "cubic")) {
      val want = Raster.warpAffine(base, 2, 2, 2, aff, kernel, 1024, 1024)
        .collect().map(t => ((t.x, t.y), t.pixels)).toMap
      val got = Raster.warpTransformed(base, 2, 2, 2,
        (dx, dy) => ((dx + 0.5) * aff.sx + aff.tx - 0.5, (dy + 0.5) * aff.sy + aff.ty - 0.5),
        kernel, 1024, 1024)
        .collect().map(t => ((t.x, t.y), t.pixels)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, px) =>
        assert(java.util.Arrays.equals(px, want(k)), s"$kernel tile $k differs")
      }
    }
  }
}
