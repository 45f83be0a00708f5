package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Raster, TransformGeolocs}
import graft.geom.Datum

/** GDALTransformGeolocations semantics (alg/gdaltransformgeolocs.cpp):
  * unconditional write-back, missing-Z behavior, band-shape validation. */
class TransformGeolocsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def bands(ts: Int = 32) = (
    Raster.syntheticTiles(spark, 1, tileSize = ts)((gx, gy) => (gx * 3 + gy).toDouble),
    Raster.syntheticTiles(spark, 1, tileSize = ts)((gx, gy) => (gx + gy * 5).toDouble),
    Raster.syntheticTiles(spark, 1, tileSize = ts)((gx, gy) => (gx + gy).toDouble))

  test("identity transformer is a lossless round-trip over all three bands") {
    val (xb, yb, zb) = bands()
    val out = TransformGeolocs(xb, yb, Some(zb), (x, y, z) => (x, y, z))
      .collect().sortBy(t => (t.band, t.x, t.y))
    val want = (xb.collect().map(_.copy(band = 1)) ++
      yb.collect().map(_.copy(band = 2)) ++
      zb.collect().map(_.copy(band = 3))).sortBy(t => (t.band, t.x, t.y))
    assert(out.length === want.length)
    out.zip(want).foreach { case (a, b) =>
      assert((a.band, a.x, a.y) === (b.band, b.x, b.y))
      assert(a.pixels.sameElements(b.pixels))
    }
  }

  test("missing Z band feeds z=0 and writes back only X and Y (line 109/121)") {
    val (xb, yb, _) = bands()
    // transformer that mixes z into x so the memset-to-zero path is visible
    val out = TransformGeolocs(xb, yb, None, (x, y, z) => (x + z, y + 2 * z, z + 7))
      .collect()
    assert(out.map(_.band).distinct.sorted === Array(1, 2))
    // z was 0 on every point, so x/y pass through unchanged
    val xs = out.filter(_.band == 1).sortBy(t => (t.x, t.y))
    xb.collect().sortBy(t => (t.x, t.y)).zip(xs).foreach { case (a, b) =>
      assert(a.pixels.sameElements(b.pixels))
    }
  }

  test("failed-transform sentinels are written back unconditionally (lines 115-123)") {
    val (xb, yb, zb) = bands()
    val out = TransformGeolocs(xb, yb, Some(zb), (x, _, _) =>
        if (x % 2 == 0) (Double.MaxValue, Double.MaxValue, 0.0) else (x, x, x))
      .collect().filter(_.band == 1)
    assert(out.exists(_.pixels.contains(Double.MaxValue)))
  }

  test("mismatched band shapes refuse with the reference's error") {
    val (xb, yb, _) = bands()
    val small = Raster.syntheticTiles(spark, 1, tileSize = 16)((_, _) => 0.0)
    val e = intercept[org.apache.spark.SparkException] {
      TransformGeolocs(xb, yb, Some(small), (x, y, z) => (x, y, z)).collect()
    }
    assert(e.getMessage != null)
  }

  test("matches Datum.helmert pointwise on a spot grid") {
    val (xb, yb, zb) = bands()
    val out = TransformGeolocs(xb, yb, Some(zb),
        (x, y, z) => Datum.helmert(x, y, z, 10, 20, 30, 0.1, 0.2, 0.3, 1.5))
      .collect()
    val x0 = out.find(t => t.band == 1 && t.x == 0 && t.y == 0).get.pixels(0)
    val (ex, _, _) = Datum.helmert(0.0, 0.0, 0.0, 10, 20, 30, 0.1, 0.2, 0.3, 1.5)
    assert(x0 === ex)
  }
}
