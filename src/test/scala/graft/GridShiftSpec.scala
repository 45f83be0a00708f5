package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geom.GridShift

/** NTv2-style grid-shift interpolation: scalar semantics, the fixed-point
  * inverse, and scalar↔Column agreement (the g52 gate then pins the Column
  * path against the DuckDB twin). */
class GridShiftSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val g = GridShift.syntheticGrid()

  test("at a grid node the shift is exactly the node value") {
    // node (i=5, j=7): lat = -80 + 40 = -40, lon = -180 + 126 = -54
    val (lon, lat) = (-54.0, -40.0)
    val i = 5; val j = 7; val k = i * g.nCols + j
    val (lo2, la2) = GridShift.forward(g, lon, lat)
    assert(la2 === lat + g.latShiftSec(k) / 3600.0)
    assert(lo2 === lon - g.lonShiftSec(k) / 3600.0) // NTv2 west-positive
  }

  test("mid-cell value is the average of the 4 corners (bilinear at u=v=0.5)") {
    val i = 3; val j = 11
    val lat = g.latMin + (i + 0.5) * g.dlat
    val lon = g.lonMin + (j + 0.5) * g.dlon
    def corners(a: Array[Double]) = Seq(
      a(i * g.nCols + j), a(i * g.nCols + j + 1),
      a((i + 1) * g.nCols + j), a((i + 1) * g.nCols + j + 1))
    val (lo2, la2) = GridShift.forward(g, lon, lat)
    assert(math.abs((la2 - lat) * 3600.0 - corners(g.latShiftSec).sum / 4.0) < 1e-9)
    assert(math.abs((lon - lo2) * 3600.0 - corners(g.lonShiftSec).sum / 4.0) < 1e-9)
  }

  test("outside the grid the point passes through unchanged") {
    assert(GridShift.forward(g, 10.0, 83.0) === ((10.0, 83.0)))
    assert(GridShift.forward(g, 10.0, -84.5) === ((10.0, -84.5)))
  }

  test("inverse round-trips forward to sub-millimeter (4 fixed-point rounds)") {
    for (k <- 0 until 200) {
      val lon = -175.0 + 350.0 * ((k * 0.618033988749895) % 1.0)
      val lat = -78.0 + 156.0 * ((k * 0.414213562373095) % 1.0)
      val (flo, fla) = GridShift.forward(g, lon, lat)
      val (blo, bla) = GridShift.inverse(g, flo, fla)
      assert(math.abs(blo - lon) < 1e-8, s"lon k=$k") // ~1mm in degrees
      assert(math.abs(bla - lat) < 1e-8, s"lat k=$k")
    }
  }

  test("Column path agrees bit-for-bit with the scalar path") {
    import spark.implicits._
    val pts = (0 until 500).map { k =>
      (k.toLong, -179.0 + 358.0 * ((k * 0.618033988749895) % 1.0),
        -84.0 + 168.0 * ((k * 0.414213562373095) % 1.0))
    }
    val df = pts.toDF("id", "lon", "lat")
    val (lonC, latC) = GridShift.forwardCols(g, col("lon"), col("lat"))
    val got = df.select(col("id"), lonC.as("lo"), latC.as("la"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    for (((id, lo, la), (_, lonIn, latIn)) <- got.zip(pts)) {
      val (slo, sla) = GridShift.forward(g, lonIn, latIn)
      assert(lo === slo, s"lon id=$id")
      assert(la === sla, s"lat id=$id")
    }
  }
}
