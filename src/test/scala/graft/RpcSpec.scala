package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Rpc

/** RPC00B transformer semantics (alg/gdal_rpc.cpp): term basis and
  * accumulation order, the +0.5 pixel-convention shift, the dateline
  * wrap, the reference-point selection (bounds midpoint vs "daft result"
  * fallback to the offsets), inverse convergence and failure, and the
  * Spark operators' agreement with the scalar core. */
class RpcSpec extends AnyFunSuite {

  private def model(minLong: Double = 43.5, maxLong: Double = 44.5,
                    minLat: Double = -27.4, maxLat: Double = -26.6) = Rpc.Model(
    lineOff = 5500.0, sampOff = 6000.0,
    latOff = -27.0, longOff = 44.0, heightOff = 300.0,
    lineScale = 6000.0, sampScale = 6500.0,
    latScale = 0.4, longScale = 0.5, heightScale = 500.0,
    lineNum = Array(-0.0018, 0.0021, -1.0023, 0.0095, -0.0012, 0.0004,
      -0.0007, 0.0013, 0.0019, -0.0004, 0.00017, -0.00023, 0.00051,
      -0.00012, 0.00033, 0.00072, -0.00008, 0.00019, 0.00027, -0.00005),
    lineDen = Array(1.0, 0.00038, -0.00044, 0.00018, 0.000042, -0.000025,
      0.000033, 0.000028, -0.000019, 0.000011, 5.2e-6, 2.7e-6, -1.9e-6,
      1.1e-6, 2.1e-6, -1.3e-6, 6.0e-7, 1.5e-6, -8.0e-7, 2.5e-7),
    sampNum = Array(0.0025, 1.0012, -0.0031, 0.0124, 0.0018, -0.0006,
      0.0003, 0.0021, -0.0014, 0.0005, 0.00021, 0.00062, -0.00034,
      0.00011, 0.00042, -0.00013, 0.00007, 0.00025, -0.00012, 0.00004),
    sampDen = Array(1.0, 0.00042, -0.00031, 0.00022, 0.000051, -0.000032,
      0.000021, 0.000032, -0.000024, 0.000013, 6.1e-6, 3.2e-6, -2.3e-6,
      1.4e-6, 2.5e-6, -1.6e-6, 7.0e-7, 1.8e-6, -9.0e-7, 3.0e-7),
    minLong = minLong, minLat = minLat, maxLong = maxLong, maxLat = maxLat)

  test("forward matches an independently-associated polynomial evaluation") {
    val m = model()
    // naive single-accumulator evaluation (different association order):
    // must agree to relative 1e-12 — same polynomial, different rounding
    def naive(t: Array[Double], c: Array[Double]): Double =
      (0 until 20).map(i => t(i) * c(i)).sum
    for (lon <- Seq(43.7, 44.0, 44.35); lat <- Seq(-27.25, -27.0, -26.7);
         h <- Seq(100.0, 300.0, 480.0)) {
      val l = (lon - m.longOff) / m.longScale
      val p = (lat - m.latOff) / m.latScale
      val hn = (h - m.heightOff) / m.heightScale
      val t = Rpc.terms(l, p, hn)
      val ex = naive(t, m.sampNum) / naive(t, m.sampDen) * m.sampScale + m.sampOff + 0.5
      val ey = naive(t, m.lineNum) / naive(t, m.lineDen) * m.lineScale + m.lineOff + 0.5
      val (px, ln) = Rpc.forwardPoint(m, lon, lat, h)
      assert(math.abs(px - ex) < 1e-6 && math.abs(ln - ey) < 1e-6, s"at ($lon,$lat,$h)")
    }
  }

  test("terms are the RPC00B basis in RPCComputeTerms order") {
    val t = Rpc.terms(2.0, 3.0, 5.0)
    assert(t.toSeq == Seq(1.0, 2.0, 3.0, 5.0, 6.0, 10.0, 15.0, 4.0, 9.0, 25.0,
      30.0, 8.0, 18.0, 50.0, 12.0, 27.0, 75.0, 20.0, 45.0, 125.0))
  }

  test("dateline wrap: diffLong outside (-270, 270] folds by 360") {
    val m = model().copy(longOff = 179.9, minLong = -180.0, maxLong = 180.0)
    // lon = -179.95 → raw diff -359.85 → wrapped +0.15, i.e. the same
    // point as the out-of-range spelling 180.05 (diff +0.15, no wrap)
    val (pxW, lnW) = Rpc.forwardPoint(m, -179.95, -27.0, 300.0)
    val (pxD, lnD) = Rpc.forwardPoint(m, 180.05, -27.0, 300.0)
    assert(math.abs(pxW - pxD) < 1e-9 && math.abs(lnW - lnD) < 1e-9)
  }

  test("inverse round trip converges within 10 default iterations") {
    val m = model()
    val inv = Rpc.plToLatLongGT(m)
    for (lon <- Seq(43.65, 44.02, 44.39); lat <- Seq(-27.3, -26.99, -26.71);
         h <- Seq(120.0, 300.0, 470.0)) {
      val (px, ln) = Rpc.forwardPoint(m, lon, lat, h)
      val r = Rpc.inversePoint(m, inv, px, ln, h, pixErrThreshold = 1e-9)
      assert(r.isDefined, s"no convergence at ($lon,$lat,$h)")
      val (rl, rp) = r.get
      assert(math.abs(rl - lon) < 1e-10 && math.abs(rp - lat) < 1e-10,
        s"($rl,$rp) vs ($lon,$lat)")
    }
  }

  test("reference point: bounds midpoint normally, offsets on the daft fallback") {
    // default bounds sentinel (-180/180) → offsets are used directly;
    // the affine init must still carry the inverse to convergence
    val mNoBounds = model(minLong = -180.0, maxLong = 180.0,
      minLat = -90.0, maxLat = 90.0)
    val inv = Rpc.plToLatLongGT(mNoBounds)
    val (px, ln) = Rpc.forwardPoint(mNoBounds, 44.1, -27.1, 250.0)
    val r = Rpc.inversePoint(mNoBounds, inv, px, ln, 250.0, pixErrThreshold = 1e-9)
    assert(r.isDefined)
    assert(math.abs(r.get._1 - 44.1) < 1e-10 && math.abs(r.get._2 + 27.1) < 1e-10)
    // bounds midpoint mapping far outside [0, 100000] → offsets fallback
    // (same init as above; must not throw and must converge)
    val mDaft = model(minLong = 160.0, maxLong = 170.0, minLat = 60.0, maxLat = 70.0)
    val invD = Rpc.plToLatLongGT(mDaft)
    val (px2, ln2) = Rpc.forwardPoint(mDaft, 43.9, -26.9, 310.0)
    val r2 = Rpc.inversePoint(mDaft, invD, px2, ln2, 310.0, pixErrThreshold = 1e-9)
    assert(r2.isDefined)
    assert(math.abs(r2.get._1 - 43.9) < 1e-10 && math.abs(r2.get._2 + 26.9) < 1e-10)
  }

  test("inverse reports failure when the iteration budget is exhausted") {
    val m = model()
    val inv = Rpc.plToLatLongGT(m)
    val (px, ln) = Rpc.forwardPoint(m, 44.3, -26.75, 450.0)
    // 1 iteration at an impossible threshold cannot converge
    assert(Rpc.inversePoint(m, inv, px, ln, 450.0,
      pixErrThreshold = 1e-14, maxIterations = 1).isEmpty)
  }

  test("Spark forward and inverse agree with the scalar core") {
    val s = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val m = model()
    val pts = s.range(40).select(
      col("id"),
      (lit(43.62) + col("id").cast("double") * lit(0.019)).as("lon"),
      (lit(-27.3) + col("id").cast("double") * lit(0.0147)).as("lat"),
      (lit(110.0) + col("id").cast("double") * lit(9.0)).as("hgt"))
    val fwd = Rpc.forward(pts, m, col("lon"), col("lat"), col("hgt"))
    val rows = fwd.select("lon", "lat", "hgt", "pixel", "line").collect()
    rows.foreach { r =>
      val (ex, ey) = Rpc.forwardPoint(m, r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(r.getDouble(3) == ex && r.getDouble(4) == ey)
    }
    val plOnly = fwd.select(col("lon").as("lon0"), col("lat").as("lat0"),
      col("hgt"), col("pixel"), col("line"))
    val invd = Rpc.inverse(plOnly, m, col("pixel"), col("line"), col("hgt"),
      pixErrThreshold = 1e-9, maxIterations = 40)
    val chk = invd.select("lon0", "lat0", "lon", "lat").collect()
    assert(chk.length == 40)
    chk.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3))
      assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 1e-10)
      assert(math.abs(r.getDouble(3) - r.getDouble(1)) < 1e-10)
    }
  }
}
