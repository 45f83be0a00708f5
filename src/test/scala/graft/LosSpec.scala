package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Los, Raster}
import graft.engine.Los.LosQuery

/** GDALIsLineOfSightVisible semantics (alg/los.cpp): pre-check precedence,
  * equal-height visibility, out-of-DEM blocking, and the balance-form
  * Bresenham walk on hand-traced cases. */
class LosSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pointsOf(q: LosQuery) =
    Los.traversalPoints(q).filter(_._1 >= 0).map(p => (p._2, p._3))

  test("Bresenham walk matches the reference balance loop on hand-traced tie cases") {
    // dx=2, dy=1: balance starts at 0 → y steps immediately (los.cpp:70-89)
    assert(pointsOf(LosQuery(0, 0, 0, 0, 2, 1, 0)) ===
      Seq((0, 0), (1, 1), (2, 1)))
    // dx=4, dy=2: two tie-steps
    assert(pointsOf(LosQuery(0, 0, 0, 0, 4, 2, 0)) ===
      Seq((0, 0), (1, 1), (2, 1), (3, 2), (4, 2)))
    // steep + negative directions: balance starts at 2*dx-dy = -2 < 0, so
    // the first x-step lands after TWO y-steps (loop trace of los.cpp:91-109)
    assert(pointsOf(LosQuery(0, 3, 4, 0, 2, 0, 0)) ===
      Seq((3, 4), (3, 3), (2, 2), (2, 1), (2, 0)))
    // vertical downward inclusive walk
    assert(pointsOf(LosQuery(0, 5, 3, 0, 5, 1, 0)) ===
      Seq((5, 3), (5, 2), (5, 1)))
    // A==B: pre-checks only
    assert(pointsOf(LosQuery(0, 5, 3, 0, 5, 3, 0)) === Seq.empty)
  }

  // flat DEM at height 10 with a wall of height 100 at x==4
  private def dem = Raster.syntheticTiles(spark, 1, tileSize = 8) {
    (gx, _) => if (gx == 4) 100.0 else 10.0
  }

  test("equal height is visible; wall blocks at the first wall pixel") {
    val qs = Seq(
      LosQuery(1, 0, 2, 10.0, 3, 2, 10.0),  // z == terrain everywhere → visible
      LosQuery(2, 0, 2, 50.0, 8, 2, 50.0),  // crosses the wall below its top
      LosQuery(3, 0, 2, 120.0, 8, 2, 120.0) // above the wall → visible
    ).toDS()
    val got = Los.lineOfSight(dem, qs, 8).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(got(0) === ((1L, true, -1, -1)))
    assert(got(1) === ((2L, false, 4, 2))) // first blocking pixel on the walk
    assert(got(2) === ((3L, true, -1, -1)))
  }

  test("B pre-check wins over an earlier mid-line obstruction (los.cpp order)") {
    // B is below terrain AND the wall blocks mid-line: the reference reports
    // B because its pre-check runs before the walk
    val qs = Seq(LosQuery(4, 0, 2, 50.0, 8, 2, 5.0)).toDS()
    val got = Los.lineOfSight(dem, qs, 8).collect()(0)
    assert(got.getBoolean(1) === false)
    assert((got.getInt(2), got.getInt(3)) === ((8, 2)))
  }

  test("an unreadable (out-of-DEM) pixel blocks — failed elevation read is not visible") {
    // DEM is 16x16 (z=1, ts=8); B at x=30 has no tile → its pre-check fails
    // exactly like GDALRasterIO failing in IsAboveTerrain (los.cpp:129-132)
    val qs = Seq(LosQuery(5, 12, 2, 500.0, 30, 2, 500.0)).toDS()
    val got = Los.lineOfSight(dem, qs, 8).collect()(0)
    assert(got.getBoolean(1) === false)
    assert((got.getInt(2), got.getInt(3)) === ((30, 2)))
  }
}
