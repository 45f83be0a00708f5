package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Raster

/** AVERAGE_MAGPHASE complex overview kernel properties
  * (gcore/overview.cpp:4527-4580 semantics). */
class MagphaseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def level(re: (Long, Long) => Double, im: (Long, Long) => Double) = {
    val r = Raster.syntheticTiles(spark, 1, band = 1, tileSize = 8)(re)
    val i = Raster.syntheticTiles(spark, 1, band = 2, tileSize = 8)(im)
    val out = Raster.pyramidUpMagphase(r.unionByName(i), 1, 2).collect()
    val reT = out.filter(_.band == 1).head
    val imT = out.filter(_.band == 2).head
    (reT, imT)
  }

  test("output magnitude equals the mean input magnitude per 2x2 block") {
    val re = (x: Long, y: Long) => ((x * 3 + y) % 7).toDouble - 3.0
    val im = (x: Long, y: Long) => ((x + y * 5) % 9).toDouble - 4.0
    val (rt, it) = level(re, im)
    for (py <- 0 until 8; px <- 0 until 8) {
      var want = 0.0; var mr = 0.0; var mi = 0.0
      for (dy <- 0 to 1; dx <- 0 to 1) {
        val x = px * 2 + dx; val y = py * 2 + dy
        want += math.hypot(re(x, y), im(x, y))
        mr += re(x, y); mi += im(x, y)
      }
      want /= 4
      // when the componentwise mean is the zero vector the reference skips
      // the rescale (ratio stays 1) and the output is 0 — magnitude is only
      // preserved for non-cancelling blocks
      if (mr != 0.0 || mi != 0.0) {
        val got = math.hypot(rt.pixels(py * 8 + px), it.pixels(py * 8 + px))
        assert(math.abs(got - want) < 1e-5, s"($px,$py): $got vs $want")
      }
    }
  }

  test("output phase equals the phase of the componentwise mean") {
    val re = (x: Long, y: Long) => (x % 5).toDouble + 1.0
    val im = (x: Long, y: Long) => (y % 4).toDouble + 2.0
    val (rt, it) = level(re, im)
    for (py <- 0 until 8; px <- 0 until 8) {
      var mr = 0.0; var mi = 0.0
      for (dy <- 0 to 1; dx <- 0 to 1) {
        mr += re(px * 2 + dx, py * 2 + dy); mi += im(px * 2 + dx, py * 2 + dy)
      }
      val want = math.atan2(mi, mr)
      val got = math.atan2(it.pixels(py * 8 + px), rt.pixels(py * 8 + px))
      assert(math.abs(got - want) < 1e-6, s"($px,$py)")
    }
  }

  test("constant complex field is preserved exactly") {
    val (rt, it) = level((_, _) => 3.0, (_, _) => -4.0)
    assert(rt.pixels.forall(_ == 3.0))
    assert(it.pixels.forall(_ == -4.0))
  }

  test("opposite-phase cancellation keeps zero vector with ratio 1 (reference m==0 guard)") {
    // +1/-1 checkerboard in re, zero im: componentwise mean is 0, so the
    // rescale is skipped and the output is 0 — not NaN
    val (rt, it) = level((x, _) => if (x % 2 == 0) 1.0 else -1.0, (_, _) => 0.0)
    assert(rt.pixels.forall(v => v == 0.0 && !v.isNaN))
    assert(it.pixels.forall(_ == 0.0))
  }
}
