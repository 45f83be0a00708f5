package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Quantiles
import graft.functions.GeoKernel

/** Exact radix-selection quantile properties (engine for d28): the
  * order-preserving bit map's monotonicity and inverse, and exactKth
  * against a driver-side sort on adversarial doubles (negatives, zeros,
  * duplicates, subnormals, extreme magnitudes). */
class QuantilesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("usort bit map is strictly monotone and invertible") {
    val vs = Seq(Double.NegativeInfinity, -1e300, -123.456, -1e-310, -0.0,
      0.0, 4.9e-324, 1e-310, 0.5, 1.0, 123.456, 1e300, Double.PositiveInfinity)
    val us = vs.map(GeoKernel.doubleUsortBits)
    us.sliding(2).zip(vs.sliding(2)).foreach { case (Seq(a, b), Seq(x, y)) =>
      if (x == y) assert(a == b, s"$x/$y") // ±0 collide by design
      else assert(java.lang.Long.compareUnsigned(a, b) < 0, s"$x -> $y")
    }
    vs.filterNot(v => v == 0.0 && 1 / v < 0) // -0.0 inverts to +0.0
      .foreach(v => assert(Quantiles.fromUsortBits(GeoKernel.doubleUsortBits(v)) == v))
  }

  test("exactKth matches a driver-side sort on adversarial data") {
    import spark.implicits._
    val vs: Seq[Double] = (0 until 500).map { i =>
      ((i * 2654435761L) % 1000).toDouble - 500.0 + (i % 7) * 0.125
    } ++ Seq(-1e300, 1e300, 0.0, 0.0, -42.0, -42.0, 4.9e-324)
    val df = vs.toDF("value")
    val sorted = vs.sorted
    for (k <- Seq(1, 2, 17, 253, vs.length / 2, vs.length - 1, vs.length)) {
      assert(Quantiles.exactKth(df, "value", k.toLong) == sorted(k - 1), s"k=$k")
    }
  }

  test("k out of range refuses loudly") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0).toDF("value")
    val e = intercept[IllegalArgumentException] {
      Quantiles.exactKth(df, "value", 4L)
    }
    assert(e.getMessage.contains("exceeds"))
  }
}
