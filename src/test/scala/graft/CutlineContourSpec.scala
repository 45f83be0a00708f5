package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Contour, Raster}

/** Round-4 advice fixes: the cutline fully-inside envelope fast path and
  * contour-polygon nodata handling. */
class CutlineContourSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def poly(wkt: String): Array[Byte] =
    graft.geom.Wkb.write(graft.geom.Wkt.parse(wkt))

  test("rectInsidePolygon: corners-in + no boundary crossing") {
    val square = poly("POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))")
    assert(Raster.rectInsidePolygon(square, 10, 10, 20, 20))
    assert(!Raster.rectInsidePolygon(square, 90, 90, 110, 110)) // corner out
    // concave C-shape: tile corners inside the two arms but the notch
    // boundary crosses the rectangle -> NOT inside
    val cShape = poly("POLYGON ((0 0, 100 0, 100 30, 20 30, 20 70, 100 70, 100 100, 0 100, 0 0))")
    assert(!Raster.rectInsidePolygon(cShape, 5, 20, 95, 80))
    assert(Raster.rectInsidePolygon(cShape, 2, 2, 15, 95)) // inside the spine
    // hole: rect surrounding the hole has corners in but hole boundary crosses
    val donut = poly(
      "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), (40 40, 60 40, 60 60, 40 60, 40 40))")
    assert(!Raster.rectInsidePolygon(donut, 30, 30, 70, 70))
    assert(Raster.rectInsidePolygon(donut, 5, 5, 30, 30))
  }

  test("cutline fast path is result-identical to the per-pixel path") {
    import spark.implicits._
    val ts = 16
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)((gx, gy) =>
      ((gx * 7 + gy * 13) % 250 + 1).toDouble)
    // diamond over the 64x64 world: some tiles fully inside, some crossed
    val cut = poly("POLYGON ((32 2, 62 32, 32 62, 2 32, 32 2))")
    val out = Raster.cutline(tiles, cut, tileSize = ts).collect()
      .map(t => ((t.x, t.y), t.pixels)).toMap
    // brute per-pixel oracle
    for (((tx, ty), px) <- out; i <- px.indices) {
      val gx = tx * ts + i % ts; val gy = ty * ts + i / ts
      val src = ((gx * 7 + gy * 13) % 250 + 1).toDouble
      val expect =
        if (graft.geom.WkbPip.containsPoint(cut, gx + 0.5, gy + 0.5)) src else 0.0
      assert(px(i) === expect, s"tile ($tx,$ty) px ($gx,$gy)")
    }
  }

  test("contourPolygons: nodata (NaN) pixels produce no polygons") {
    import spark.implicits._
    val ts = 8
    // 16x16 world, left half elevation 5, right half NaN (nodata)
    val tiles = Raster.syntheticTiles(spark, 1, tileSize = ts)((gx, _) =>
      if (gx < 8) 5.0 else Double.NaN)
    val polys = Contour.contourPolygons(tiles, interval = 10.0, width = 16).collect()
    assert(polys.length === 1, polys.mkString(","))
    assert(polys.head.getAs[Double]("elev_min") === 0.0)
    assert(polys.head.getAs[Long]("size") === 128L)
  }
}
