package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Raster, VerticalShift}

/** GDALApplyVerticalShiftGrid edges (alg/gdalapplyverticalshiftgrid.cpp):
  * unit factors, nodata pass-through, the missing-grid-value abort, and the
  * scale contract (DEM side is map-only — broadcast join, no DEM shuffle). */
class VerticalShiftSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("constant grid shifts by the unit-scaled constant; nodata passes through") {
    val dem = Raster.syntheticTiles(spark, 1, tileSize = 8) {
      (gx, gy) => if (gx == 3 && gy == 3) -1.0 else 100.0
    }
    val grid = Raster.syntheticTiles(spark, 1, tileSize = 8)((_, _) => 7.0)
    val out = VerticalShift.applyShift(dem, grid, 16, 16, 16, 16,
        inverse = false, srcUnitToMeter = 2.0, dstUnitToMeter = 0.5,
        nodata = Some(-1.0), demTileSize = 8, gridTileSize = 8)
      .collect()
    // (100*2 + 7)/0.5 = 414 everywhere except the nodata pixel
    out.foreach { t =>
      t.pixels.zipWithIndex.foreach { case (v, i) =>
        val gx = t.x * 8 + i % 8; val gy = t.y * 8 + i / 8
        if (gx == 3 && gy == 3) assert(v === -1.0) else assert(v === 414.0)
      }
    }
    val inv = VerticalShift.applyShift(dem, grid, 16, 16, 16, 16,
        inverse = true, srcUnitToMeter = 2.0, dstUnitToMeter = 0.5,
        nodata = Some(-1.0), demTileSize = 8, gridTileSize = 8)
      .collect()
    inv.foreach(_.pixels.foreach(v => assert(v === 386.0 || v === -1.0)))
  }

  test("a non-finite grid sample aborts (reference 'Missing vertical grid value')") {
    val dem = Raster.syntheticTiles(spark, 1, tileSize = 8)((_, _) => 1.0)
    val grid = Raster.syntheticTiles(spark, 1, tileSize = 8) {
      (gx, _) => if (gx == 5) Double.PositiveInfinity else 0.0
    }
    val ex = intercept[Exception] {
      VerticalShift.applyShift(dem, grid, 16, 16, 16, 16,
        demTileSize = 8, gridTileSize = 8).collect()
    }
    assert(ex.getMessage.contains("Missing vertical grid value") ||
      Option(ex.getCause).exists(_.getMessage.contains("Missing vertical grid value")))
  }

  test("DEM side is map-only: broadcast join, no DEM-side Exchange") {
    val dem = Raster.syntheticTiles(spark, 2, tileSize = 16)((gx, gy) => (gx + gy).toDouble)
    val grid = Raster.syntheticTiles(spark, 0, tileSize = 8)((i, j) => (i - j).toDouble)
    val out = VerticalShift.applyShift(dem, grid, 64, 64, 8, 8,
      demTileSize = 16, gridTileSize = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join:\n$plan")
    // the only Exchange allowed is the broadcast of the (small) grid side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"DEM side must not shuffle:\n$plan")
    assert(out.count() === 16)
  }
}
