package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{PixelFuncs, Raster, Tile}

/** Pixel-function library beyond the r29-gated subset: every function is
  * checked against its closed form on a small synthetic raster (the gate
  * proves engine/SQL parity for the gated ones; this pins the rest of
  * the pixelfunctions.cpp formula set). */
class PixelFuncsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def synth(f: (Long, Long) => Double) =
    Raster.syntheticTiles(spark, 0, tileSize = 16)((gx, gy) => f(gx, gy))

  private def px(t: Seq[Tile]): Array[Double] = {
    assert(t.length == 1); t.head.pixels
  }

  private val a = synth((gx, gy) => (gx * 3 + gy * 5 + 1).toDouble)  // 1..71
  private val b = synth((gx, gy) => (gx + gy * 2 + 2).toDouble)      // 2..47
  private val c = synth((gx, gy) => ((gx * gy) % 7 + 1).toDouble)    // 1..7

  private def ref(f: (Double, Double, Double) => Double): Array[Double] = {
    val out = new Array[Double](256)
    for (gy <- 0 until 16; gx <- 0 until 16)
      out(gy * 16 + gx) = f(gx * 3 + gy * 5 + 1, gx + gy * 2 + 2, (gx * gy) % 7 + 1)
    out
  }

  private def check(got: Array[Double], want: Array[Double], tol: Double = 0.0): Unit = {
    var i = 0
    while (i < want.length) {
      assert(math.abs(got(i) - want(i)) <= tol, s"pixel $i: ${got(i)} vs ${want(i)}")
      i += 1
    }
  }

  test("scalar funcs: sqrt, abs, exp, pow, inv, round, dB2amp, dB2pow") {
    check(px(PixelFuncs.sqrtF(a).collect()), ref((x, _, _) => math.sqrt(x)))
    check(px(PixelFuncs.absF(Raster.mapPixels(a)(_ - 30.0)).collect()),
      ref((x, _, _) => math.abs(x - 30.0)))
    check(px(PixelFuncs.expF(c, fact = 0.5).collect()),
      ref((_, _, z) => math.pow(math.E, z * 0.5)))
    check(px(PixelFuncs.powF(b, 1.5).collect()), ref((_, y, _) => math.pow(y, 1.5)))
    check(px(PixelFuncs.invF(b, k = 3.0).collect()), ref((_, y, _) => 3.0 / y))
    // std::round semantics: half away from zero (NOT Java half-up)
    check(px(PixelFuncs.roundF(Raster.mapPixels(a)(_ * 0.3 - 5.0)).collect()),
      ref { (x, _, _) =>
        val v = x * 0.3 - 5.0
        if (v < 0) -math.floor(-v + 0.5) else math.floor(v + 0.5)
      })
    check(px(PixelFuncs.dB2Amp(c).collect()), ref((_, _, z) => math.pow(10, z / 20.0)))
    check(px(PixelFuncs.dB2Pow(c).collect()), ref((_, _, z) => math.pow(10, z / 10.0)))
  }

  test("N-ary funcs: sum+k, diff, mul×k, div, min, max, argmin, harmonic, quantile, mode") {
    check(px(PixelFuncs.sumF(Seq(a, b, c), k = 10.0).collect()),
      ref((x, y, z) => 10.0 + x + y + z))
    check(px(PixelFuncs.diffF(a, b).collect()), ref((x, y, _) => x - y))
    check(px(PixelFuncs.mulF(Seq(a, b), k = 2.0).collect()), ref((x, y, _) => 2.0 * x * y))
    check(px(PixelFuncs.divF(a, b).collect()), ref((x, y, _) => x / y))
    check(px(PixelFuncs.minF(Seq(a, b, c)).collect()),
      ref((x, y, z) => math.min(x, math.min(y, z))))
    check(px(PixelFuncs.maxF(Seq(a, b, c)).collect()),
      ref((x, y, z) => math.max(x, math.max(y, z))))
    check(px(PixelFuncs.argminF(Seq(a, b, c)).collect()),
      ref((x, y, z) => if (x <= y && x <= z) 0 else if (y <= z) 1 else 2))
    check(px(PixelFuncs.harmonicMeanF(Seq(a, b, c)).collect()),
      ref((x, y, z) => 3.0 / (1.0 / x + 1.0 / y + 1.0 / z)), tol = 1e-12)
    // quantile 0.25 over 4 bands: pos = 0.75 between sorted [0] and [1]
    val q = PixelFuncs.quantileF(Seq(a, b, c, b), 0.25)
    check(px(q.collect()), ref { (x, y, z) =>
      val s = Array(x, y, z, y).sorted
      s(0) + 0.75 * (s(1) - s(0))
    }, tol = 1e-12)
    // mode over (a,b,b): b wins (count 2)
    check(px(PixelFuncs.modeF(Seq(a, b, b)).collect()),
      ref((x, y, _) => if (x == y) x else y))
  }

  test("interpolate_exp matches the closed form on the bracketing pair") {
    val got = PixelFuncs.interpolateExp(Seq(a, b), t0 = 2.0, dt = 4.0, t = 3.5)
    check(px(got.collect()), ref { (x, y, _) =>
      val r = math.log(y / x) / 4.0
      x * math.exp(r * 1.5)
    }, tol = 1e-12)
  }

  test("complex family: mod/phase/conj/cmul/polar round-trips") {
    val re = synth((gx, gy) => ((gx * 7 + gy * 3) % 21 - 10).toDouble)
    val im = synth((gx, gy) => ((gx * 5 + gy * 11) % 17 - 8).toDouble)
    def f(gx: Long, gy: Long) = (((gx * 7 + gy * 3) % 21 - 10).toDouble,
      ((gx * 5 + gy * 11) % 17 - 8).toDouble)
    // polar(mod, phase) reconstructs (re, im)
    val (rre, rim) = PixelFuncs.polarC(PixelFuncs.modC(re, im), PixelFuncs.phaseC(re, im))
    val gotRe = px(rre.collect().toSeq); val gotIm = px(rim.collect().toSeq)
    for (gy <- 0 until 16; gx <- 0 until 16) {
      val (er, ei) = f(gx, gy)
      assert(math.abs(gotRe(gy * 16 + gx) - er) < 1e-9, s"re ($gx,$gy)")
      assert(math.abs(gotIm(gy * 16 + gx) - ei) < 1e-9, s"im ($gx,$gy)")
    }
    // conj twice is identity; cmul(a, conj(a)) has im == 0, re == |a|²
    val (_, imNeg) = PixelFuncs.conjC(re, im)
    val (_, imBack) = PixelFuncs.conjC(re, imNeg)
    check(px(imBack.collect().toSeq), px(im.collect().toSeq))
    val (cre, cim) = PixelFuncs.cmulC(re, im, re, im)
    val gotCre = px(cre.collect().toSeq)
    for (gy <- 0 until 16; gx <- 0 until 16) {
      val (er, ei) = f(gx, gy)
      assert(gotCre(gy * 16 + gx) === er * er + ei * ei, s"($gx,$gy)")
    }
    check(px(cim.collect().toSeq), Array.fill(256)(0.0))
    // phaseReal: π where negative
    val pr = px(PixelFuncs.phaseReal(re).collect().toSeq)
    for (gy <- 0 until 16; gx <- 0 until 16)
      assert(pr(gy * 16 + gx) === (if (f(gx, gy)._1 < 0) math.Pi else 0.0))
  }

  test("nodata-to-alpha emits the alpha band on the requested band index") {
    val nd = PixelFuncs.noDataToAlpha(c, noData = 3.0, alphaBand = 5)
    val t = nd.collect()
    assert(t.head.band == 5)
    check(px(t), ref((_, _, z) => if (z == 3.0) 0.0 else 255.0))
  }
}
