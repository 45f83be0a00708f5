package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Viewshed

/** Viewshed window port: analytic fixtures. */
class ViewshedSpec extends AnyFunSuite {

  test("flat terrain: everything visible") {
    val w = 33; val h = 33
    val dem = new Array[Double](w * h)
    val vis = Viewshed.computeWindow(dem, w, h, 16, 16, 2.0)
    assert(vis.forall(_ == 255.0))
  }

  test("downhill cone from observer: everything visible") {
    val w = 33; val h = 33
    val dem = Array.tabulate(w * h) { i =>
      val dx = i % w - 16; val dy = i / w - 16
      -math.sqrt(dx * dx + dy * dy) // monotone down
    }
    val vis = Viewshed.computeWindow(dem, w, h, 16, 16, 2.0)
    assert(vis.forall(_ == 255.0))
  }

  test("wall west of observer mirrors the east-wall closed form") {
    val w = 64; val h = 64
    // wall column 7 left of observer, H=3, eye 5: hidden for dx in [-17,-8]
    val dem = Array.tabulate(w * h)(i => if (i % w == 32 - 7) 3.0 else 0.0)
    val vis = Viewshed.computeWindow(dem, w, h, 32, 32, 5.0)
    for (y <- 0 until h; x <- 0 until w) {
      val dx = x - 32; val dy = y - 32
      if (math.abs(dx) >= math.abs(dy)) {
        val want = if (dx >= -17 && dx <= -8) 0.0 else 255.0
        assert(vis(y * w + x) == want, s"($x,$y) dx=$dx dy=$dy")
      }
    }
  }
}
