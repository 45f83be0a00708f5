package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.ApproxTransform

/** GDALApproxTransform subdivision properties (gdaltransformer.cpp:4080-4429). */
class ApproxTransformSpec extends AnyFunSuite {

  private val base = (x: Double, y: Double) =>
    (x + 40.0 * math.sin(x / 64.0), y + x * x / 4096.0)

  private def row(n: Int, y: Double = 10.0) =
    (Array.tabulate(n)(_.toDouble), Array.fill(n)(y))

  test("approximation error stays near the threshold on a smooth transform") {
    val (xs, ys) = row(512)
    val (ox, oy) = ApproxTransform.transformRow(base, 0.05, xs, ys)
    var maxErr = 0.0
    for (i <- 0 until 512) {
      val (ex, ey) = base(xs(i), ys(i))
      maxErr = math.max(maxErr, math.abs(ox(i) - ex) + math.abs(oy(i) - ey))
    }
    // the reference bounds the error at segment MIDDLES; on smooth input the
    // pointwise error stays the same order as the threshold
    assert(maxErr < 0.05 * 4, s"max pointwise error $maxErr")
    assert(maxErr > 0.0) // it actually interpolated somewhere
  }

  test("a linear transform is interpolated in one leaf, errors exactly zero at anchors") {
    val lin = (x: Double, y: Double) => (2.0 * x + 1.0, y - 3.0)
    val (xs, ys) = row(128)
    val (ox, oy) = ApproxTransform.transformRow(lin, 0.01, xs, ys)
    for (i <- 0 until 128) {
      assert(math.abs(ox(i) - (2.0 * i + 1.0)) < 1e-9)
      assert(oy(i) == 7.0)
    }
  }

  test("short rows (<=5 points) and zero threshold degrade to exact per-point evaluation") {
    val (xs5, ys5) = row(5)
    val (ox5, oy5) = ApproxTransform.transformRow(base, 0.05, xs5, ys5)
    for (i <- 0 until 5) {
      val (ex, ey) = base(xs5(i), ys5(i))
      assert(ox5(i) == ex && oy5(i) == ey)
    }
    val (xs, ys) = row(64)
    val (ox, oy) = ApproxTransform.transformRow(base, 0.0, xs, ys)
    for (i <- 0 until 64) {
      val (ex, ey) = base(xs(i), ys(i))
      assert(ox(i) == ex && oy(i) == ey)
    }
  }

  test("non-scanline input (varying y) degrades to exact evaluation") {
    val xs = Array.tabulate(64)(_.toDouble)
    val ys = Array.tabulate(64)(i => i * 0.5)
    val (ox, oy) = ApproxTransform.transformRow(base, 0.05, xs, ys)
    for (i <- 0 until 64) {
      val (ex, ey) = base(xs(i), ys(i))
      assert(ox(i) == ex && oy(i) == ey)
    }
  }

  test("subdivision bottoms out in exact leaves whose anchors equal the base transform") {
    // a violently nonlinear transform forces subdivision to the <=5 floor
    val wild = (x: Double, y: Double) => (x + 100.0 * math.sin(x), y)
    val (xs, ys) = row(64)
    val (ox, _) = ApproxTransform.transformRow(wild, 0.001, xs, ys)
    var exactCount = 0
    for (i <- 0 until 64) {
      val (ex, _) = wild(xs(i), ys(i))
      if (ox(i) == ex) exactCount += 1
    }
    assert(exactCount > 32, s"only $exactCount exact points")
  }
}
