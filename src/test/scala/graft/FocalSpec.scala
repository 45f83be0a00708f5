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
}
