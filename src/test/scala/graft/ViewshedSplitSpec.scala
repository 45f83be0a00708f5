package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Raster, Viewshed}

/** Quadrant-split viewshed must be bit-identical to the whole-window run
  * (the dependence argument in Viewshed.viewshedsSplit's doc), across tile
  * sizes and for observers at the center, edges, and corners — the cases
  * where one or two quadrants degenerate. */
class ViewshedSplitSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val dem = ViewshedSplitSpec.dem _

  private def collectMap(ds: org.apache.spark.sql.Dataset[(Long, graft.engine.Tile)])
      : Map[(Long, Int, Int), Seq[Double]] =
    ds.collect().map { case (oid, t) => ((oid, t.x, t.y), t.pixels.toSeq) }.toMap

  private def check(observers: Seq[(Long, Int, Int, Double)], tileSize: Int): Unit = {
    val n = 256 / tileSize
    val tiles = Raster.syntheticTiles(spark, (math.log(n) / math.log(2)).round.toInt,
      tileSize = tileSize)(dem)
    val whole = collectMap(Viewshed.viewsheds(tiles, observers, n, n))
    val split = collectMap(Viewshed.viewshedsSplit(tiles, observers, n, n))
    assert(split.keySet === whole.keySet)
    for (k <- whole.keySet)
      assert(split(k) === whole(k), s"tile $k differs")
  }

  test("center observer identical at two tile sizes (64 and 32)") {
    check(Seq((1L, 128, 128, 5.0)), 64)
    check(Seq((1L, 128, 128, 5.0)), 32)
  }

  test("corner and edge observers (degenerate quadrants)") {
    check(Seq((1L, 0, 0, 5.0), (2L, 255, 255, 2.0)), 64)
    check(Seq((3L, 0, 100, 5.0), (4L, 130, 0, 3.0), (5L, 255, 7, 1.0)), 64)
  }

  test("multiple observers in one pass, off-center") {
    check(Seq((1L, 31, 200, 4.0), (2L, 222, 33, 6.0), (3L, 128, 129, 0.0)), 32)
  }
}

object ViewshedSplitSpec {
  // rough deterministic terrain with ridges so visibility is non-trivial
  def dem(gx: Long, gy: Long): Double =
    ((gx * 7919 + gy * 104729) % 23).toDouble +
      (if (gx % 37 == 0) 40.0 else 0.0) + (if (gy % 29 == 5) 25.0 else 0.0)
}
