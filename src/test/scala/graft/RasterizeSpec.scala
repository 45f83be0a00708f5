package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Rasterize, Tile}
import graft.geom.{Polygon, Wkb}

/** gdal_rasterize polygon burn: parity holes, ADD single-burn-per-feature
  * (horizontal edges + boundary/fill overlap), ALL_TOUCHED supercover, and
  * tiling invariance (the distributed result cannot depend on tile size). */
class RasterizeSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def ring(pts: (Double, Double)*): Array[Double] =
    pts.flatMap { case (x, y) => Seq(x, y) }.toArray

  private def df(feats: (Long, Polygon, Double)*) = {
    val s = spark
    import s.implicits._
    feats.map { case (fid, p, b) => (fid, Wkb.write(p), b) }
      .toDF("fid", "wkb", "burn")
  }

  /** Stitch tiles at zoom z into one global array (zero-filled). */
  private def stitch(tiles: Array[Tile], z: Int, ts: Int): Array[Double] = {
    val g = (1 << z) * ts
    val out = new Array[Double](g * g)
    tiles.foreach { t =>
      for (y <- 0 until t.h; x <- 0 until t.w)
        out((t.y * ts + y) * g + t.x * ts + x) = t.pixels(y * t.w + x)
    }
    out
  }

  test("hole is left unburned (even-odd parity across rings)") {
    val p = Polygon(Array(
      ring((10.2, 10.3), (200.4, 10.3), (200.4, 200.7), (10.2, 200.7), (10.2, 10.3)),
      ring((50.1, 50.2), (150.3, 50.2), (150.3, 150.4), (50.1, 150.4), (50.1, 50.2))))
    val tiles = Rasterize.burnPolygons(df((0L, p, 7.0)), z = 0).collect()
    val a = stitch(tiles, 0, 256)
    assert(a(100 * 256 + 30) == 7.0)  // annulus
    assert(a(100 * 256 + 100) == 0.0) // hole
    assert(a(5 * 256 + 5) == 0.0)     // outside
  }

  test("ADD burns each feature once per pixel despite horizontal edges; overlaps sum") {
    // axis-aligned rectangle = top + bottom horizontal edges (the
    // reference's polyInts2 double-burn hazard)
    val r1 = Polygon(Array(ring((10.2, 10.3), (100.4, 10.3), (100.4, 100.7), (10.2, 100.7), (10.2, 10.3))))
    val r2 = Polygon(Array(ring((50.2, 50.3), (140.4, 50.3), (140.4, 140.7), (50.2, 140.7), (50.2, 50.3))))
    val tiles = Rasterize.burnPolygons(df((0L, r1, 3.0), (1L, r2, 5.0)), z = 0, add = true).collect()
    val a = stitch(tiles, 0, 256)
    assert(a(30 * 256 + 30) == 3.0)   // r1 only — exactly one burn
    assert(a(120 * 256 + 120) == 5.0) // r2 only
    assert(a(70 * 256 + 70) == 8.0)   // overlap sums across features
    assert(a(10 * 256 + 30) == 3.0 || a(10 * 256 + 30) == 0.0) // edge row: burned at most once
    assert(!a.exists(v => v != 0.0 && v != 3.0 && v != 5.0 && v != 8.0))
  }

  test("REPLACE: later fid wins on overlap regardless of burn magnitude") {
    val r1 = Polygon(Array(ring((10.2, 10.3), (100.4, 10.3), (100.4, 100.7), (10.2, 100.7), (10.2, 10.3))))
    val r2 = Polygon(Array(ring((50.2, 50.3), (140.4, 50.3), (140.4, 140.7), (50.2, 140.7), (50.2, 50.3))))
    val a = stitch(Rasterize.burnPolygons(df((0L, r1, 9.0), (1L, r2, 2.0)), z = 0).collect(), 0, 256)
    assert(a(70 * 256 + 70) == 2.0) // overlap: fid 1 burned last
    assert(a(30 * 256 + 30) == 9.0)
  }

  test("tiling invariance: 32-px and 256-px tiles stitch to the same raster") {
    val tri = Polygon(Array(ring((20.37, 33.81), (470.02, 120.55), (150.66, 460.23), (20.37, 33.81))))
    val feats = df((0L, tri, 4.0), (1L, tri, 2.5))
    for (at <- Seq(false, true); add <- Seq(false, true)) {
      val big = stitch(Rasterize.burnPolygons(feats, z = 1, add = add, allTouched = at).collect(), 1, 256)
      val small = stitch(
        Rasterize.burnPolygons(feats, z = 4, add = add, allTouched = at, tileSize = 32).collect(), 4, 32)
      assert(java.util.Arrays.equals(big, small), s"allTouched=$at add=$add")
    }
  }

  test("line burn: exact Bresenham anchors, vertex burned once in ADD, tiling invariant") {
    val s = spark
    import s.implicits._
    def ldf(feats: (Long, graft.geom.Geom, Double)*) =
      feats.map { case (fid, g, b) => (fid, Wkb.write(g), b) }.toDF("fid", "wkb", "burn")
    import graft.geom.LineString
    // horizontal: (2.3,5.7)->(9.8,5.2) burns y=5, x=2..9
    val h = stitch(Rasterize.burnLines(ldf((0L, LineString(Array(2.3, 5.7, 9.8, 5.2)), 1.0)), 0).collect(), 0, 256)
    for (x <- 2 to 9) assert(h(5 * 256 + x) == 1.0, s"x=$x")
    assert(h.count(_ != 0.0) == 8)
    // perfect diagonal: (0.5,0.5)->(7.5,7.5) burns (k,k) k=0..7
    val d = stitch(Rasterize.burnLines(ldf((0L, LineString(Array(0.5, 0.5, 7.5, 7.5)), 1.0)), 0).collect(), 0, 256)
    for (k <- 0 to 7) assert(d(k * 256 + k) == 1.0, s"k=$k")
    assert(d.count(_ != 0.0) == 8)
    // ADD over a 2-segment polyline: the shared vertex pixel burns ONCE
    val poly2 = LineString(Array(1.2, 1.3, 9.7, 1.3, 9.7, 9.8))
    val a = stitch(Rasterize.burnLines(ldf((0L, poly2, 3.0)), 0, add = true).collect(), 0, 256)
    assert(a(1 * 256 + 9) == 3.0) // vertex pixel (9,1): single burn
    assert(!a.exists(v => v != 0.0 && v != 3.0))
    // tiling invariance incl. all-touched
    val long = LineString(Array(3.17, 12.9, 460.4, 330.6, 120.2, 480.9))
    for (at <- Seq(false, true); add <- Seq(false, true)) {
      val big = stitch(Rasterize.burnLines(ldf((0L, long, 2.0)), 1, add = add, allTouched = at).collect(), 1, 256)
      val small = stitch(Rasterize.burnLines(ldf((0L, long, 2.0)), 4, add = add, allTouched = at, tileSize = 32).collect(), 4, 32)
      assert(java.util.Arrays.equals(big, small), s"at=$at add=$add")
    }
  }

  test("ALL_TOUCHED is a superset of the center-fill and covers a sub-pixel sliver") {
    // sliver thinner than a pixel: center-rule burns (almost) nothing,
    // all-touched must still trace it
    val sliver = Polygon(Array(ring((5.3, 5.2), (200.8, 90.4), (200.8, 90.55), (5.3, 5.35), (5.3, 5.2))))
    val fill = stitch(Rasterize.burnPolygons(df((0L, sliver, 1.0)), z = 0).collect(), 0, 256)
    val at = stitch(Rasterize.burnPolygons(df((0L, sliver, 1.0)), z = 0, allTouched = true).collect(), 0, 256)
    val nFill = fill.count(_ != 0.0); val nAt = at.count(_ != 0.0)
    assert(nAt > nFill, s"fill=$nFill at=$nAt")
    assert(nAt >= 196) // the segment spans ~196 columns; supercover >= one px per column
    for (i <- fill.indices if fill(i) != 0.0) assert(at(i) != 0.0, s"px $i")
    // every burned cell is actually near the segment (corridor check)
    for (i <- at.indices if at(i) != 0.0) {
      val x = i % 256 + 0.5; val y = i / 256 + 0.5
      val t = ((x - 5.3) * (200.8 - 5.3) + (y - 5.2) * (90.4 - 5.2)) /
        ((200.8 - 5.3) * (200.8 - 5.3) + (90.4 - 5.2) * (90.4 - 5.2))
      val tc = math.max(0.0, math.min(1.0, t))
      val px0 = 5.3 + tc * (200.8 - 5.3); val py0 = 5.2 + tc * (90.4 - 5.2)
      val dist = math.hypot(x - px0, y - py0)
      assert(dist < 2.0, s"px(${x.toInt},${y.toInt}) dist=$dist")
    }
  }
}
