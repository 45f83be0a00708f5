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

  test("cell modes (-cm edge/diagonal/min/max): split==whole per mode, visibility ordering") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 120, 140, 5.0))
    def visCount(mode: Int): Long = {
      val split = collectMap(viewshedsSplit(tiles, obs, n, n, mode = mode))
      // split == whole-window for every mode
      val w = 256
      val demArr = Array.tabulate(w * w)(i => ViewshedSplitSpec.dem(i % w, i / w))
      val whole = computeWindow(demArr, w, w, 120, 140, 5.0, mode = mode)
      for (((_, tx, ty), px) <- split; i <- px.indices) {
        val g = whole((ty * ts + i / ts) * w + tx * ts + i % ts)
        assert(px(i) === g, s"mode $mode tile ($tx,$ty) idx $i")
      }
      split.values.map(_.count(_ == 255.0).toLong).sum
    }
    val cEdge = visCount(ModeEdge)
    val cDiag = visCount(ModeDiagonal)
    val cMin = visCount(ModeMin)
    val cMax = visCount(ModeMax)
    // min takes the lower required height -> sees at least as much as any;
    // max the higher -> at most as much (monotone propagation)
    assert(cMin >= cEdge && cMin >= cDiag, s"min=$cMin edge=$cEdge diag=$cDiag")
    assert(cMax <= cEdge && cMax <= cDiag, s"max=$cMax edge=$cEdge diag=$cDiag")
    // modes genuinely differ on rough terrain
    assert(Set(cEdge, cDiag, cMin, cMax).size >= 2)
  }

  test("-md max distance: bounded == unbounded post-masked; far tiles pruned") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 40, 50, 5.0))
    val md = 70.0; val oor = -9.0
    val bounded = collectMap(viewshedsSplit(tiles, obs, n, n,
      maxDistance = md, outOfRangeVal = oor))
    val unbounded = collectMap(viewshedsSplit(tiles, obs, n, n))
    // tiles whose bbox is entirely outside the disc bbox are not emitted
    assert(!bounded.contains((1L, 3, 3)), "far corner tile must be pruned")
    assert(bounded.size < unbounded.size)
    for (((oid, tx, ty), px) <- bounded; i <- px.indices) {
      val gx = tx * ts + i % ts; val gy = ty * ts + i / ts
      val dx = (gx - 40).toDouble; val dy = (gy - 50).toDouble
      val expect =
        if (dx * dx + dy * dy > md * md) oor
        else unbounded((oid, tx, ty))(i)
      assert(px(i) === expect, s"tile ($tx,$ty) px ($gx,$gy)")
    }
    // unemitted tiles are fully out of range
    for (((_, tx, ty), _) <- unbounded if !bounded.contains((1L, tx, ty));
         py <- 0 until ts; pxi <- 0 until ts) {
      val dx = (tx * ts + pxi - 40).toDouble; val dy = (ty * ts + py - 50).toDouble
      assert(dx * dx + dy * dy > md * md, s"tile ($tx,$ty) wrongly pruned")
    }
  }

  test("-mind min distance: inner ring masked, outer values untouched") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 128, 128, 5.0))
    val ringed = collectMap(viewshedsSplit(tiles, obs, n, n,
      maxDistance = 100.0, minDistance = 20.0, outOfRangeVal = -7.0))
    val full = collectMap(viewshedsSplit(tiles, obs, n, n))
    for (((oid, tx, ty), px) <- ringed; i <- px.indices) {
      val dx = (tx * ts + i % ts - 128).toDouble
      val dy = (ty * ts + i / ts - 128).toDouble
      val d2 = dx * dx + dy * dy
      val expect = if (d2 > 100.0 * 100.0 || d2 < 20.0 * 20.0) -7.0
                   else full((oid, tx, ty))(i)
      assert(px(i) === expect, s"($tx,$ty) idx $i")
    }
  }

  test("-sa/-ea sector mask: clockwise-from-north arc, wrap-around, observer kept") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 128, 128, 5.0))
    val full = collectMap(viewshedsSplit(tiles, obs, n, n))
    // NE quadrant arc: 0° (north) to 90° (east), and a wrap arc 315°→45°
    for ((sa, ea) <- Seq((0.0, 90.0), (315.0, 45.0))) {
      val sect = collectMap(viewshedsSplit(tiles, obs, n, n,
        startAngleDeg = sa, endAngleDeg = ea, outOfRangeVal = -3.0))
      for (((oid, tx, ty), px) <- sect; i <- px.indices) {
        val dx = (tx * ts + i % ts - 128).toDouble
        val dy = (ty * ts + i / ts - 128).toDouble
        // compass azimuth of the pixel ray (0 = north = -y, clockwise)
        val az = { val a = math.toDegrees(math.atan2(dx, -dy)); if (a < 0) a + 360 else a }
        val in =
          if (dx == 0 && dy == 0) true // observer pixel kept
          else if (sa < ea) az >= sa && az <= ea
          else az >= sa || az <= ea
        val expect = if (in) full((oid, tx, ty))(i) else -3.0
        assert(px(i) === expect, s"($tx,$ty) idx $i az $az sa $sa ea $ea")
      }
    }
  }

  test("-sa 0 -ea 360: normalized-equal angles disable masking (full circle)") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 128, 128, 5.0))
    val full = collectMap(viewshedsSplit(tiles, obs, n, n))
    // the reference normalizes angles BEFORE its equality short-circuit
    // (viewshed.cpp:474 → viewshed_executor.cpp:706): 0 and 360 normalize
    // to the same radian, so the sector mask must be OFF, not all-masked
    for ((sa, ea) <- Seq((0.0, 360.0), (90.0, 450.0))) {
      val out = collectMap(viewshedsSplit(tiles, obs, n, n,
        startAngleDeg = sa, endAngleDeg = ea, outOfRangeVal = -3.0))
      for (((oid, tx, ty), px) <- out; i <- px.indices)
        assert(px(i) === full((oid, tx, ty))(i), s"($tx,$ty) idx $i sa $sa ea $ea")
    }
  }

  test("-cc curvature: horizon appears on flat terrain, split == whole") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val flat = Raster.syntheticTiles(spark, 2, tileSize = ts)((_, _) => 0.0)
    val adj = 0.002 // curvature drop per pixel² — exaggerated earth
    val split = collectMap(viewshedsSplit(flat, Seq((1L, 128, 128, 5.0)), n, n,
      heightAdjFactor = adj))
    val w = 256
    val whole = computeWindow(new Array[Double](w * w), w, w, 128, 128, 5.0,
      heightAdjFactor = adj)
    for (((_, tx, ty), px) <- split; i <- px.indices)
      assert(px(i) === whole((ty * ts + i / ts) * w + tx * ts + i % ts))
    // along the observer row east: visible up to a horizon, invisible after
    val row = (129 until 256).map(x => whole(128 * w + x))
    val firstInvisible = row.indexWhere(_ == 0.0)
    assert(firstInvisible > 5, s"horizon too close: $firstInvisible")
    assert(row.drop(firstInvisible).forall(_ == 0.0), "visibility must not resume")
    // without curvature the whole flat row is visible
    val flatRow = computeWindow(new Array[Double](w * w), w, w, 128, 128, 5.0)
    assert((129 until 256).forall(x => flatRow(128 * w + x) == 255.0))
    // stronger curvature -> nearer horizon
    val nearer = computeWindow(new Array[Double](w * w), w, w, 128, 128, 5.0,
      heightAdjFactor = adj * 4)
    val fi2 = (129 until 256).map(x => nearer(128 * w + x)).indexWhere(_ == 0.0)
    assert(fi2 < firstInvisible && fi2 > 0, s"$fi2 vs $firstInvisible")
  }

  test("banded == whole at two band widths (pipeline with propagated boundary row)") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 120, 140, 5.0), (2L, 0, 255, 3.0), (3L, 255, 64, 2.0))
    val whole = collectMap(viewsheds(tiles, obs, n, n))
    // two band widths: one not dividing the window (41, many boundary
    // handoffs mid-tile) and one spanning multiple tiles (96)
    for (b <- Seq(41, 96)) {
      val banded = collectMap(viewshedsBanded(tiles, obs, n, n, bandRows = b))
      assert(banded.keySet === whole.keySet, s"bandRows=$b")
      for (k <- whole.keySet)
        assert(banded(k) === whole(k), s"bandRows=$b tile $k differs")
    }
  }

  test("banded with full option surface == split (md+mind+sector+curvature+mode)") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 100, 130, 5.0))
    val split = collectMap(viewshedsSplit(tiles, obs, n, n,
      mode = ModeMin, maxDistance = 90.0, outOfRangeVal = -5.0,
      minDistance = 10.0, startAngleDeg = 300.0, endAngleDeg = 70.0,
      heightAdjFactor = 0.001))
    val banded = collectMap(viewshedsBanded(tiles, obs, n, n, bandRows = 37,
      mode = ModeMin, maxDistance = 90.0, outOfRangeVal = -5.0,
      minDistance = 10.0, startAngleDeg = 300.0, endAngleDeg = 70.0,
      heightAdjFactor = 0.001))
    assert(banded.keySet === split.keySet)
    for (k <- split.keySet) assert(banded(k) === split(k), s"tile $k differs")
  }

  test("banded DEM output mode == whole (propagated adjustment heights)") {
    import graft.engine.Viewshed._
    val n = 4; val ts = 64
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val obs = Seq((1L, 128, 128, 5.0))
    val whole = collectMap(viewsheds(tiles, obs, n, n))
    val w = 256
    val demArr = Array.tabulate(w * w)(i => ViewshedSplitSpec.dem(i % w, i / w))
    val wholeDem = computeWindow(demArr, w, w, 128, 128, 5.0, outputMode = OutDem)
    val banded = collectMap(viewshedsBanded(tiles, obs, n, n, bandRows = 50,
      outputMode = OutDem))
    for (((_, tx, ty), px) <- banded; i <- px.indices)
      assert(px(i) === wholeDem((ty * ts + i / ts) * w + tx * ts + i % ts),
        s"($tx,$ty) idx $i")
  }

  test("cumulative viewshed == brute per-observer sum + floor(255/max) scale") {
    val ts = 64; val n = 256 / ts
    val tiles = Raster.syntheticTiles(spark, 2, tileSize = ts)(ViewshedSplitSpec.dem)
    val spacing = 96; val oz = 5.0
    val got = Viewshed.cumulative(tiles, n, n, ts, spacing, oz).collect()
      .map(t => ((t.x, t.y), t.pixels)).toMap
    // brute: assemble the full DEM, run computeWindow per observer, sum, scale
    val w = 256; val h = 256
    val demArr = Array.tabulate(w * h)(i => ViewshedSplitSpec.dem(i % w, i / w))
    val acc = new Array[Double](w * h)
    for (ox <- 0 until w by spacing; oy <- 0 until h by spacing) {
      val v = Viewshed.computeWindow(demArr, w, h, ox, oy, oz,
        visibleVal = 1.0, invisibleVal = 0.0)
      var i = 0
      while (i < acc.length) { acc(i) += v(i); i += 1 }
    }
    val mx = acc.max
    val expect = acc.map(v => math.floor(255.0 / mx * v))
    for (ty <- 0 until n; tx <- 0 until n; py <- 0 until ts; px <- 0 until ts) {
      val g = got((tx, ty))(py * ts + px)
      val e = expect((ty * ts + py) * w + tx * ts + px)
      assert(g === e, s"tile ($tx,$ty) px ($px,$py)")
    }
  }
}

object ViewshedSplitSpec {
  // rough deterministic terrain with ridges so visibility is non-trivial
  def dem(gx: Long, gy: Long): Double =
    ((gx * 7919 + gy * 104729) % 23).toDouble +
      (if (gx % 37 == 0) 40.0 else 0.0) + (if (gy % 29 == 5) 25.0 else 0.0)
}
