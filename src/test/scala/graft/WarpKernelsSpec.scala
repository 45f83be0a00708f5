package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Raster, Tile}

/** Warp resampling kernels beyond the driver-gated near/bilinear/cubic/area
  * cases: cubicspline and lanczos (radius-2/3 halo shipping), and the area
  * kernels under FRACTIONAL scale (partial-coverage weights — the gate's
  * exact x2 case has all weights 1). Ground truth is a direct single-array
  * computation over the stitched raster using the same reference formulas
  * (alg/gdalwarpkernel.cpp: GWKBSpline, GWKLanczosSinc, GWKAverageOrMode
  * COMPUTE_WEIGHT). */
object WarpKernelsSpec {
  // top-level so Spark closures don't capture the (non-serializable) suite
  val f: (Long, Long) => Double = (gx, gy) => ((gx * 131 + gy * 311) % 997).toDouble
}

class WarpKernelsSpec extends AnyFunSuite {
  import WarpKernelsSpec.f

  private def spark = SparkTestSession.spark

  private val z = 1; private val ts = 64
  private val g = (1 << z) * ts // 128x128 global

  private def pixG(x: Long, y: Long): Double =
    if (x < 0 || y < 0 || x >= g || y >= g) Double.NaN else f(x, y)

  private def bspline(x: Double): Double = {
    val xp2 = x + 2.0; val xp1 = x + 1.0; val xm1 = x - 1.0
    var v = 0.0
    if (xp2 > 0.0) {
      v = xp2 * xp2 * xp2
      if (xp1 > 0.0) {
        v += -4.0 * xp1 * xp1 * xp1
        if (x > 0.0) {
          v += 6.0 * x * x * x
          if (xm1 > 0.0) v += -4.0 * xm1 * xm1 * xm1
        }
      }
    }
    v
  }

  private def sinc3(x: Double): Double =
    if (x == 0.0) 1.0
    else if (math.abs(x) >= 3.0) 0.0
    else {
      val px = math.Pi * x; val px3 = px / 3.0
      (math.sin(px) / px) * (math.sin(px3) / px3)
    }

  /** Direct separable convolution with normalize-by-weight-sum. */
  private def directConv(sxp: Double, syp: Double, wOf: Double => Array[Double],
                         hw: Int): Double = {
    val bx = math.floor(sxp); val by = math.floor(syp)
    val wx = wOf(sxp - bx); val wy = wOf(syp - by)
    val n = 2 * hw
    var acc = 0.0
    for (j <- 0 until n) {
      var row = 0.0
      for (i <- 0 until n) {
        val v = pixG(bx.toLong + i - (hw - 1), by.toLong + j - (hw - 1))
        if (v.isNaN) return 0.0
        row += wx(i) * v
      }
      acc += wy(j) * row
    }
    var sx0 = 0.0; var sy0 = 0.0
    for (i <- 0 until n) { sx0 += wx(i); sy0 += wy(i) }
    acc / (sx0 * sy0)
  }

  /** Direct area-kernel reduction with GDAL's partial-coverage weights. */
  private def directArea(kernel: String, gxD: Long, gyD: Long,
                         sx: Double, sy: Double, tx: Double, ty: Double): Double = {
    val eps = 1e-10
    val xMin = gxD * sx + tx; val xMax = (gxD + 1) * sx + tx
    val yMin = gyD * sy + ty; val yMax = (gyD + 1) * sy + ty
    if (!(xMax > -eps && xMin < g + eps) || !(yMax > -eps && yMin < g + eps)) return 0.0
    var iXMin = math.max(math.floor(xMin + eps), 0.0).toInt
    var iXMax = math.min(math.ceil(xMax - eps), g.toDouble).toInt
    if (iXMin == iXMax && iXMax < g) iXMax += 1
    var iYMin = math.max(math.floor(yMin + eps), 0.0).toInt
    var iYMax = math.min(math.ceil(yMax - eps), g.toDouble).toInt
    if (iYMin == iYMax && iYMax < g) iYMax += 1
    var tot = 0.0; var totW = 0.0
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    val vals = scala.collection.mutable.ArrayBuffer[Double]()
    var any = false
    for (iy <- iYMin until iYMax; ix <- iXMin until iXMax) {
      val wy0 =
        if (iy == iYMin) { if (iYMin + 1 == iYMax) 1.0 else 1.0 - (yMin - iYMin) }
        else if (iy + 1 == iYMax) 1.0 - (iYMax - yMax)
        else 1.0
      val w =
        if (ix == iXMin) { if (iXMin + 1 == iXMax) wy0 else wy0 * (1.0 - (xMin - iXMin)) }
        else if (ix + 1 == iXMax) wy0 * (1.0 - (iXMax - xMax))
        else wy0
      val v = pixG(ix, iy)
      if (!v.isNaN) {
        any = true
        tot += w * (if (kernel == "rms") v * v else v)
        totW += w
        if (v < mn) mn = v
        if (v > mx) mx = v
        vals += v
      }
    }
    if (!any) 0.0
    else kernel match {
      case "average" => tot / totW
      case "sum"     => tot
      case "rms"     => math.sqrt(tot / totW)
      case "min"     => mn
      case "max"     => mx
      case q =>
        val quant = if (q == "med") 0.5 else if (q == "q1") 0.25 else 0.75
        val arr = vals.toArray; java.util.Arrays.sort(arr)
        arr(math.ceil(quant * arr.length - 1).toInt)
    }
  }

  test("cubicspline + lanczos distributed == direct single-array reference") {
    val s = spark
    val tiles = Raster.syntheticTiles(s, z, tileSize = ts)(f)
    val aff = Raster.WarpAffine(0.7, 0.7, 11.3, 5.9)
    for (kernel <- Seq("cubicspline", "lanczos")) {
      val hw = if (kernel == "lanczos") 3 else 2
      val wOf: Double => Array[Double] =
        if (kernel == "lanczos")
          fr => Array(sinc3(fr + 2.0), sinc3(fr + 1.0), sinc3(fr),
            sinc3(fr - 1.0), sinc3(fr - 2.0), sinc3(fr - 3.0))
        else
          fr => Array(bspline(fr + 1.0), bspline(fr), bspline(fr - 1.0), bspline(fr - 2.0))
      val got = Raster.warpAffine(tiles, z, 2, 2, aff, kernel, g, g, ts).collect()
      assert(got.length == 4, kernel)
      got.foreach { t =>
        for (yy <- 0 until ts; xx <- 0 until ts) {
          val gxD = t.x.toLong * ts + xx; val gyD = t.y.toLong * ts + yy
          val sxp = (gxD + 0.5) * aff.sx + aff.tx - 0.5
          val syp = (gyD + 0.5) * aff.sy + aff.ty - 0.5
          val want = directConv(sxp, syp, wOf, hw)
          val gotV = t.pixels(yy * ts + xx)
          assert(math.abs(gotV - want) < 1e-9,
            s"$kernel dst($gxD,$gyD): got $gotV want $want")
        }
      }
    }
  }

  test("gauss kernel: 3x3/5x5/7x7 binomial by factor, edge shift + truncation == direct reference") {
    val s = spark
    val tiles = Raster.syntheticTiles(s, z, tileSize = ts)(f)
    // independent derivation of the reference matrices (overview.cpp:2032-
    // 2042): outer products of the binomial rows
    def outer(r: Array[Double]): Array[Double] =
      (for (a <- r; b <- r) yield a * b).toArray
    val m3 = outer(Array(1, 2, 1)); val m5 = outer(Array(1, 4, 6, 4, 1))
    val m7 = outer(Array(1, 6, 15, 20, 15, 6, 1))
    def gWin(d0: Double, d1: Double, srcN: Int, dim: Int): (Int, Int, Int) = {
      var off = (0.5 + d0).toInt
      val size = (0.5 + d1).toInt + 1 - off
      off = off + size / 2 - dim / 2
      val off2 = math.min(srcN, off + dim)
      var shift = 0
      if (off < 0) { shift = -off; off = 0 }
      (off, off2, shift)
    }
    def directGauss(gxD: Long, gyD: Long, aff: Raster.WarpAffine, dim: Int,
                    mat: Array[Double]): Double = {
      val (x0, x1, shx) = gWin(gxD * aff.sx + aff.tx, (gxD + 1) * aff.sx + aff.tx, g, dim)
      val (y0, y1, shy) = gWin(gyD * aff.sy + aff.ty, (gyD + 1) * aff.sy + aff.ty, g, dim)
      var tot = 0.0; var cnt = 0.0
      for (iy <- y0 until y1; ix <- x0 until x1) {
        val v = pixG(ix, iy)
        if (!v.isNaN) {
          val w = mat((shy + iy - y0) * dim + (shx + ix - x0))
          tot += v * w; cnt += w
        }
      }
      if (cnt == 0.0) 0.0 else tot / cnt
    }
    // factor 2 -> 3x3; factor 4 with tx=-2 -> 5x5, exercising the low-edge
    // shift (off<0) and the high-edge off2 truncation; factor 6 -> 7x7.
    // tileSize stays the SOURCE tile size (the warp contract: src tiles and
    // the param agree); dst pixels past the source extent are nodata 0 on
    // both sides.
    val cases = Seq(
      (Raster.WarpAffine(2.0, 2.0, 0.0, 0.0), 3, m3),
      (Raster.WarpAffine(4.0, 4.0, -2.0, -2.0), 5, m5),
      (Raster.WarpAffine(6.0, 6.0, 0.0, 0.0), 7, m7))
    for ((aff, dim, mat) <- cases) {
      val got = Raster.warpAffine(tiles, z, 1, 1, aff, "gauss", g, g, ts).collect()
      assert(got.length == 1, s"dim $dim")
      val t = got.head
      for (yy <- 0 until ts; xx <- 0 until ts) {
        val want = directGauss(xx, yy, aff, dim, mat)
        val gotV = t.pixels(yy * ts + xx)
        assert(math.abs(gotV - want) < 1e-9,
          s"gauss ${dim}x$dim dst($xx,$yy): got $gotV want $want")
      }
    }
  }

  test("area kernels with fractional coverage == direct reference") {
    val s = spark
    val tiles = Raster.syntheticTiles(s, z, tileSize = ts)(f)
    val aff = Raster.WarpAffine(1.7, 2.3, 3.4, 1.2) // fractional scale + offset
    for (kernel <- Seq("average", "sum", "rms", "min", "max", "med", "q1", "q3")) {
      val got = Raster.warpAffine(tiles, z, 2, 2, aff, kernel, g, g, ts).collect()
      assert(got.length == 4, kernel)
      got.foreach { t =>
        for (yy <- 0 until ts; xx <- 0 until ts) {
          val gxD = t.x.toLong * ts + xx; val gyD = t.y.toLong * ts + yy
          val want = directArea(kernel, gxD, gyD, aff.sx, aff.sy, aff.tx, aff.ty)
          val gotV = t.pixels(yy * ts + xx)
          assert(math.abs(gotV - want) < 1e-9,
            s"$kernel dst($gxD,$gyD): got $gotV want $want")
        }
      }
    }
  }
}
