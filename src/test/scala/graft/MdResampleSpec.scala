package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.MdArray

/** GDALMDArray::GetResampled semantics
  * (gcore/multidim/gdalmultidim_array_resampled.cpp): last-two-dims
  * resample with leading passthrough, kernel correctness vs brute force,
  * reference refusals, pixel-center indexing variables, NaN fill. */
class MdResampleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val idMap = (x: Double, y: Double) => (x, y)

  test("identity-grid near resample passes every leading slice through unchanged") {
    val src = MdArray.create(spark, Array(3L, 16L, 16L), Array(2, 8, 8)) { c =>
      (c(0) * 1000 + c(1) * 16 + c(2)).toDouble
    }
    val gt = (0.0, 1.0, 0.0, 1.0)
    val (out, _, _) = src.resampled(16L, 16L, gt, gt, idMap, idMap, "near")
    val got = out.toTable.collect().map(r =>
      ((r.getAs[Long]("d0"), r.getAs[Long]("d1"), r.getAs[Long]("d2")),
        r.getAs[Double]("v"))).toMap
    for (t <- 0L until 3L; j <- 0L until 16L; i <- 0L until 16L)
      assert(got((t, j, i)) === (t * 1000 + j * 16 + i).toDouble)
  }

  test("bilinear matches a brute-force evaluation on a 2x upsample") {
    val src = MdArray.create(spark, Array(8L, 8L), Array(4, 4)) { c =>
      (c(0) * 7 + c(1) * 3).toDouble
    }
    def f(j: Long, i: Long) = (j * 7 + i * 3).toDouble
    val srcGt = (0.0, 1.0, 0.0, 1.0)
    val dstGt = (0.0, 0.5, 0.0, 0.5)
    val (out, _, _) = src.resampled(16L, 16L, srcGt, dstGt, idMap, idMap, "bilinear")
    val got = out.toTable.collect().map(r =>
      ((r.getAs[Long]("d0"), r.getAs[Long]("d1")), r.getAs[Double]("v"))).toMap
    for (j <- 0 until 16; i <- 0 until 16) {
      val px = (0.0 + (i + 0.5) * 0.5) / 1.0 - 0.5
      val py = (0.0 + (j + 0.5) * 0.5) / 1.0 - 0.5
      val bx = math.floor(px); val by = math.floor(py)
      val fx = px - bx; val fy = py - by
      var acc = 0.0; var w = 0.0
      for (q <- 0 until 4) {
        val ix = bx.toLong + q % 2; val iy = by.toLong + q / 2
        if (ix >= 0 && ix < 8 && iy >= 0 && iy < 8) {
          val ww = (if (q % 2 == 0) 1.0 - fx else fx) *
            (if (q / 2 == 0) 1.0 - fy else fy)
          acc += ww * f(iy, ix); w += ww
        }
      }
      val want = if (w > 0) acc / w else Double.NaN
      val g = got((j.toLong, i.toLong))
      assert(g === want, s"($j,$i)")
    }
  }

  test("out-of-source destination cells are NaN, including whole fill chunks") {
    val src = MdArray.create(spark, Array(8L, 8L), Array(8, 8))(c => 5.0)
    // destination grid twice as wide: right half maps outside the source
    val (out, _, _) = src.resampled(8L, 32L,
      (0.0, 1.0, 0.0, 1.0), (0.0, 1.0, 0.0, 1.0), idMap, idMap, "near")
    val vals = out.toTable.collect().map(r =>
      ((r.getAs[Long]("d0"), r.getAs[Long]("d1")), r.getAs[Double]("v"))).toMap
    assert(vals((0L, 0L)) === 5.0)
    assert(vals((0L, 7L)) === 5.0)
    assert(vals((0L, 8L)).isNaN)
    assert(vals((3L, 31L)).isNaN)
    assert(vals.size === 8 * 32)
  }

  test("indexing variables are pixel-center regularly spaced (reference :747-757)") {
    val src = MdArray.create(spark, Array(4L, 4L), Array(4, 4))(_ => 0.0)
    val (_, varX, varY) = src.resampled(4L, 8L,
      (0.0, 1.0, 0.0, 1.0), (100.0, 2.0, 50.0, -3.0), idMap, idMap, "near")
    val xs = varX.toTable.collect().sortBy(_.getAs[Long]("d0")).map(_.getAs[Double]("v"))
    val ys = varY.toTable.collect().sortBy(_.getAs[Long]("d0")).map(_.getAs[Double]("v"))
    assert(xs.length === 8 && ys.length === 4)
    assert(xs(0) === 100.0 + 2.0 / 2)
    assert(xs(5) === (100.0 + 2.0 / 2) + 5 * 2.0)
    assert(ys(0) === 50.0 + (-3.0) / 2)
    assert(ys(3) === (50.0 + (-3.0) / 2) + 3 * (-3.0))
  }

  test("reference refusals: rank < 2 and unsupported kernel") {
    val r1 = MdArray.create(spark, Array(8L), Array(8))(_ => 0.0)
    val e1 = intercept[IllegalArgumentException] {
      r1.resampled(4L, 4L, (0, 1, 0, 1), (0, 1, 0, 1), idMap, idMap, "near")
    }
    assert(e1.getMessage.contains("2 dimensions or more"))
    val r2 = MdArray.create(spark, Array(8L, 8L), Array(8, 8))(_ => 0.0)
    val e2 = intercept[IllegalArgumentException] {
      r2.resampled(4L, 4L, (0, 1, 0, 1), (0, 1, 0, 1), idMap, idMap, "gauss")
    }
    assert(e2.getMessage.contains("Unsupported resample method"))
  }
}
