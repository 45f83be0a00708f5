package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Raster

/** Partial overview refresh (gdal raster overview refresh analog):
  * the refreshed pyramid is bit-identical to a full recompute, and only
  * the affected parent subtree is recomputed. */
class OverviewRefreshSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("refresh equals full recompute; untouched tiles come from the old level") {
    val sp = spark
    import sp.implicits._
    val f = (gx: Long, gy: Long) => ((gx * 131 + gy * 37) % 251).toDouble
    val oldBase = Raster.syntheticTiles(spark, 2, tileSize = 16)(f)
    val newBase = Raster.syntheticTiles(spark, 2, tileSize = 16) { (gx, gy) =>
      val tx = gx >> 4; val ty = gy >> 4
      if (tx == 0 && ty == 0) f(gx, gy) + 5.0 else f(gx, gy)
    }
    val oldZ1 = Raster.pyramidUp(oldBase)
    val oldZ0 = Raster.pyramidUp(oldZ1)
    val dirty0 = Seq((0, 0)).toDF("dx", "dy")
    val (newZ1, dirty1) = Raster.refreshLevelUp(oldZ1, newBase, dirty0)
    val (newZ0, dirty2) = Raster.refreshLevelUp(oldZ0, newZ1, dirty1)

    // dirty keys propagate: (0,0) at every level
    assert(dirty1.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == Set((0, 0)))
    assert(dirty2.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == Set((0, 0)))

    def asMap(ts: Array[graft.engine.Tile]) =
      ts.map(t => ((t.z, t.x, t.y, t.band), t.pixels.toSeq)).toMap
    val fullZ1 = Raster.pyramidUp(newBase)
    val fullZ0 = Raster.pyramidUp(fullZ1)
    assert(asMap(newZ1.collect()) == asMap(fullZ1.collect()))
    assert(asMap(newZ0.collect()) == asMap(fullZ0.collect()))

    // untouched z1 tiles are the OLD objects' values (reused, not recomputed
    // with the new base — they are equal anyway here, but prove reuse by
    // checking a tile outside the dirty subtree against the old level)
    val oldT = asMap(oldZ1.collect())
    val newT = asMap(newZ1.collect())
    assert(newT((1, 1, 1, 1)) == oldT((1, 1, 1, 1)))
    // and the dirty parent actually changed
    assert(newT((1, 0, 0, 1)) != oldT((1, 0, 0, 1)))
  }
}
