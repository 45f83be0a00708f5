package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.MdArray

/** gdal mdim mosaic semantics (apps/gdalalg_mdim_mosaic.cpp analog):
  * last-wins overlap, fill for uncovered chunks, clipping, 3-D rank. */
class MdMosaicSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def cells(a: MdArray): Map[Seq[Long], Double] =
    a.toTable.collect().map { r =>
      (0 until a.dims).map(d => r.getAs[Long](s"d$d")) -> r.getAs[Double]("v")
    }.toMap

  test("3-D mosaic places blocks, later wins, fill elsewhere, clips out-of-range") {
    val a = MdArray.create(spark, Array(2L, 2L, 2L), Array(2, 2, 2))(c => 10.0)
    val b = MdArray.create(spark, Array(2L, 2L, 2L), Array(2, 2, 2))(c => 20.0)
    // b overlaps a's far corner and sticks out of the output on dim 2
    val m = MdArray.mosaic(spark, Seq((a, Array(0L, 0L, 0L)), (b, Array(1L, 1L, 3L))),
      shape = Array(3L, 3L, 4L), chunk = Array(2, 2, 2), fill = -5.0)
    val v = cells(m)
    assert(v(Seq(0L, 0L, 0L)) == 10.0)
    assert(v(Seq(1L, 1L, 1L)) == 10.0)
    assert(v(Seq(1L, 1L, 3L)) == 20.0) // b's in-range slab
    assert(v(Seq(2L, 2L, 3L)) == 20.0)
    assert(v(Seq(2L, 2L, 0L)) == -5.0) // uncovered
    assert(v.size == 36)
    // b's cells at dim-2 index 4/5 were clipped: no coordinate beyond shape
    assert(v.keys.forall(k => k(2) < 4))
  }

  test("fully uncovered output chunks materialize as fill") {
    val a = MdArray.create(spark, Array(2L, 2L), Array(2, 2))(_ => 7.0)
    val m = MdArray.mosaic(spark, Seq((a, Array(0L, 0L))),
      shape = Array(8L, 8L), chunk = Array(2, 2), fill = 0.5)
    val v = cells(m)
    assert(v.size == 64)
    assert(v(Seq(7L, 7L)) == 0.5)
    assert(v(Seq(1L, 1L)) == 7.0)
    assert(v.values.count(_ == 7.0) == 4)
  }
}
