package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{InterpAtPoint, Raster}

/** GDALInterpolateAtPoint edge semantics (alg/gdal_interpolateatpoint.cpp):
  * border drag, tiny-raster algorithm downgrade, the nearest edge tolerance,
  * and scalar-core vs distributed-path agreement including at borders. */
object InterpAtPointSpec {
  def f(x: Long, y: Long): Double = ((x * 5 + y * 3) % 41).toDouble
}

class InterpAtPointSpec extends AnyFunSuite {
  import InterpAtPointSpec.f

  private lazy val spark = SparkTestSession.spark

  private def readF(rw: Int, rh: Int)(x: Int, y: Int): Option[Double] =
    if (x < 0 || y < 0 || x >= rw || y >= rh) None else Some(f(x, y))

  test("kernels match the reference formulas at anchor points") {
    assert(InterpAtPoint.cubicKernel(0.0) === 1.0)
    assert(InterpAtPoint.cubicKernel(1.0) === 0.0)
    assert(InterpAtPoint.cubicKernel(2.0) === 0.0)
    assert(math.abs(InterpAtPoint.cubicKernel(0.5) - 0.5625) < 1e-15)
    assert(math.abs(InterpAtPoint.cubicSplineKernel(0.0) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(InterpAtPoint.cubicSplineKernel(1.0) - 1.0 / 6.0) < 1e-15)
    assert(InterpAtPoint.cubicSplineKernel(2.0) === 0.0)
    assert(InterpAtPoint.cubicSplineKernel(2.5) === 0.0)
  }

  test("bilinear at a pixel center returns that pixel; midpoint averages") {
    val r = InterpAtPoint.interpolateScalar(3.5, 2.5, 16, 16, "bilinear",
      None, readF(16, 16))
    assert(r === Some(f(3, 2)))
    val m = InterpAtPoint.interpolateScalar(4.0, 2.5, 16, 16, "bilinear",
      None, readF(16, 16))
    assert(m === Some((f(3, 2) + f(4, 2)) / 2))
  }

  test("nearest edge tolerance: exactly size (+1e-6) steps 0.25 inward") {
    val r = InterpAtPoint.interpolateScalar(16.0, 15.5, 16, 16, "nearest",
      None, readF(16, 16))
    assert(r === Some(f(15, 15)))
    // past the tolerance → out of bounds
    assert(InterpAtPoint.interpolateScalar(16.1, 15.5, 16, 16, "nearest",
      None, readF(16, 16)).isEmpty)
    // bilinear has NO such tolerance: x=16 is in [0,size] so it's accepted,
    // with the window dragged at the border
    assert(InterpAtPoint.interpolateScalar(16.0, 8.0, 16, 16, "bilinear",
      None, readF(16, 16)).isDefined)
  }

  test("tiny-raster downgrade: cubic→bilinear under 4px, bilinear→nearest under 2px") {
    val c = InterpAtPoint.interpolateScalar(1.3, 1.3, 3, 3, "cubic",
      None, readF(3, 3))
    val b = InterpAtPoint.interpolateScalar(1.3, 1.3, 3, 3, "bilinear",
      None, readF(3, 3))
    assert(c === b) // downgraded to the same computation
    val b1 = InterpAtPoint.interpolateScalar(0.6, 0.6, 1, 1, "bilinear",
      None, readF(1, 1))
    assert(b1 === Some(f(0, 0))) // → nearest
  }

  test("border drag replicates edge samples (corner query equals corner pixel for bilinear)") {
    // at (0.1, 0.1) the bilinear window starts at (-1,-1): the reference
    // reads at (0,0) and drags — all four samples become f(0,0)
    val r = InterpAtPoint.interpolateScalar(0.1, 0.1, 16, 16, "bilinear",
      None, readF(16, 16))
    assert(r === Some(f(0, 0)))
  }

  test("distributed path agrees with the scalar core everywhere, including borders") {
    import spark.implicits._
    val dem = Raster.syntheticTiles(spark, 1, tileSize = 8)(f) // 16x16
    val pts = for (i <- 0 until 40) yield
      (i.toLong, (i * 0.41) % 16.6, (i * 0.733) % 16.6) // includes >16 (OOB)
    val qdf = pts.toDF("qid", "x", "y")
    for (alg <- Seq("nearest", "bilinear", "cubic", "cubicspline")) {
      val got = InterpAtPoint.interpolate(dem, qdf, alg, 16, 16, None, 8)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      pts.foreach { case (qid, x, y) =>
        val want = InterpAtPoint.interpolateScalar(x, y, 16, 16, alg, None,
          readF(16, 16))
        assert(got(qid) === want, s"alg=$alg qid=$qid at ($x,$y)")
      }
    }
  }
}
