package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Focal, Raster, Tile}

/** Halo-exchange focal ops: per-tile distributed results must equal the
  * single-array ground truth computed over the stitched global raster. */
class FocalSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("focal mean + slope with halo == global-array ground truth") {
    val s = spark
    import s.implicits._
    val z = 2; val ts = 8; val n = 1 << z; val g = n * ts
    def f(gx: Long, gy: Long): Double = ((gx * 13 + gy * 31) % 97).toDouble
    val tiles = Raster.syntheticTiles(s, z, tileSize = ts)(f)

    def groundTruth(win: Array[Double] => Double): Array[Double] = {
      val out = new Array[Double](g * g)
      for (y <- 0 until g; x <- 0 until g) {
        out(y * g + x) =
          if (x == 0 || y == 0 || x == g - 1 || y == g - 1) 0.0
          else {
            val w = for (dy <- -1 to 1; dx <- -1 to 1)
              yield f(x + dx, y + dy)
            win(w.toArray)
          }
      }
      out
    }

    for ((name, wf) <- Seq[(String, Array[Double] => Double)](
        ("mean", Focal.meanWindow), ("slope", Focal.slopeWindow),
        ("hillshade", Focal.hillshadeWindow()))) {
      val got = Focal.focal3x3(tiles, wf).collect()
      assert(got.length == n * n, name)
      val truth = groundTruth(wf)
      got.foreach { t =>
        for (y <- 0 until ts; x <- 0 until ts) {
          val gx = t.x * ts + x; val gy = t.y * ts + y
          assert(t.pixels(y * ts + x) == truth(gy * g + gx),
            s"$name tile(${t.x},${t.y}) px($x,$y)")
        }
      }
    }
  }

  test("gdaldem variant kernels: flat-ground and analytic-plane anchors") {
    val flat = Array.fill(9)(100.0)
    // flat ground: full illumination for every standard-formula shade
    val sinAlt = math.sin(45.0 * math.Pi / 180.0)
    assert(math.abs(Focal.hillshadeAlgWindow(zt = true)(flat) - (1.0 + 254.0 * sinAlt)) < 1e-9)
    assert(math.abs(Focal.hillshadeMultiWindow()(flat) - (1.0 + 254.0 * sinAlt)) < 1e-9)
    assert(Focal.hillshadeIgorWindow()(flat) == 255.0) // no shadow on flat
    assert(Focal.slopePercentWindow(flat) == 0.0)
    assert(Focal.slopeZTWindow(flat) == 0.0)
    assert(Focal.aspectZTWindow()(flat) == -9999.0)
    // combined on flat: acos(sin alt) * atan(0) term vanishes -> 255
    assert(math.abs(Focal.hillshadeCombinedWindow()(flat) - (1.0 + 254.0 * 1.0)) < 1e-9)

    // plane z = 2x (rises east): Horn slope% = 100*dz/dx = 200;
    // ZT slope = atan(2) deg; ZT aspect faces west (270 deg azimuth)
    val plane = Array.tabulate(9)(i => 2.0 * (i % 3))
    assert(math.abs(Focal.slopePercentWindow(plane) - 200.0) < 1e-9)
    assert(math.abs(Focal.slopeZTWindow(plane) - math.atan(2.0) * 180.0 / math.Pi) < 1e-9)
    assert(math.abs(Focal.aspectZTWindow()(plane) - 270.0) < 1e-9)
    // trigonometric convention on the same plane: azimuth 270 (west) =
    // trig 180 (atan2(0, -dx>0... downslope -x) -> 180 deg, CCW-from-east)
    assert(math.abs(Focal.aspectTrigWindow()(plane) - 180.0) < 1e-9)
    assert(Focal.aspectTrigWindow()(flat) == -9999.0)

    // corner spike: ZT gradient (edge midpoints only) is flat, Horn is not
    // — the two algorithm variants genuinely diverge
    val spike = Array(10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    assert(math.abs(Focal.hillshadeAlgWindow(zt = true)(spike) -
      (1.0 + 254.0 * sinAlt)) < 1e-9)
    assert(Focal.hillshadeAlgWindow(zt = false)(spike) !=
      Focal.hillshadeAlgWindow(zt = true)(spike))

    // multidirectional stays within the 1..255 codomain on random windows
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val w = Array.fill(9)(rnd.nextDouble() * 1000.0)
      val v = Focal.hillshadeMultiWindow()(w)
      assert(v >= 1.0 - 1e-12 && v <= 255.0 + 1e-12)
      val c = Focal.hillshadeCombinedWindow()(w)
      assert(c >= 1.0 - 1e-12 && c <= 255.0 + 1e-12)
      val ig = Focal.hillshadeIgorWindow()(w)
      assert(ig >= 0.0 && ig <= 255.0 + 1e-12)
    }
  }
}
