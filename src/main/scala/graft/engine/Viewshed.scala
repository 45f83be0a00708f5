package graft.engine

import org.apache.spark.sql.Dataset

/** Viewshed: per-pixel visibility from an observer (reference:
  * ViewshedExecutor, /root/reference/alg/viewshed/viewshed_executor.cpp —
  * normal output mode, EDGE cell mode (the default), curvature
  * coefficient 0). Exact port of the row-outward propagation:
  * CalcHeightLine (:61), CalcHeightDiagonal (:85), CalcHeightEdge (:94),
  * setOutputNormal (cur = max(cur, blockZ), visible iff
  * cur + targetHeight >= blockZ).
  *
  * The recursion makes every row depend on the whole previous row, so a
  * single viewshed is inherently window-sequential (GDAL parallelizes only
  * within a line). The Spark-native scale axis is MANY OBSERVERS: each
  * observer's bounded window (maxDist) gathers its overlapping tiles in
  * one shuffle, windows run exact-and-independent in parallel
  * (`viewsheds`), which is how a 100-TB fleet computes thousands of
  * tower/antenna viewsheds. */
object Viewshed {

  private def calcHeightLine(n: Int, za: Double): Double = za * n / (n - 1)

  private def calcHeightEdge(i: Int, j: Int, za: Double, zb: Double): Double =
    (za * i + zb * (j - i)) / (j - 1)

  /** Exact single-window viewshed. `dem` row-major w×h; observer at
    * (ox, oy) with eye `observerZ` above the surface. Returns
    * visibleVal/invisibleVal per pixel. */
  def computeWindow(dem: Array[Double], w: Int, h: Int, ox: Int, oy: Int,
                    observerZ: Double, targetHeight: Double = 0.0,
                    visibleVal: Double = 255.0,
                    invisibleVal: Double = 0.0): Array[Double] = {
    val zObs = observerZ + dem(oy * w + ox)
    val result = new Array[Double](w * h)
    // observer-relative heights for the current and previous rows
    def rowRel(y: Int): Array[Double] = {
      val r = new Array[Double](w)
      var x = 0
      while (x < w) { r(x) = dem(y * w + x) - zObs; x += 1 }
      r
    }
    def setOut(cur: Array[Double], res: Array[Double], x: Int, z: Double): Unit = {
      res(x) = if (cur(x) + targetHeight < z) invisibleVal else visibleVal
      if (z > cur(x)) cur(x) = z
    }

    // ---- observer row
    val obsCur = rowRel(oy)
    val obsRes = new Array[Double](w)
    obsRes(ox) = visibleVal
    if (ox + 1 < w) obsRes(ox + 1) = visibleVal
    var x = ox + 2
    while (x < w) {
      setOut(obsCur, obsRes, x, calcHeightLine(x - ox, obsCur(x - 1)))
      x += 1
    }
    if (ox - 1 >= 0) obsRes(ox - 1) = visibleVal
    x = ox - 2
    while (x >= 0) {
      setOut(obsCur, obsRes, x, calcHeightLine(ox - x, obsCur(x + 1)))
      x -= 1
    }
    System.arraycopy(obsRes, 0, result, oy * w, w)

    // ---- rows outward (down: +1, up: -1), each chain seeded by the
    // observer row's final cur
    def sweep(dirY: Int): Unit = {
      var prev = obsCur.clone()
      var ny = 1
      var y = oy + dirY
      while (y >= 0 && y < h) {
        val cur = rowRel(y)
        val res = new Array[Double](w)
        // center column: pure vertical line
        if (ny == 1) res(ox) = visibleVal
        else setOut(cur, res, ox, calcHeightLine(ny, prev(ox)))
        // rightward
        var xx = ox + 1
        while (xx < w) {
          val nx = xx - ox
          val z =
            if (nx == ny) {
              if (ny == 1) cur(xx) // adjacent diagonal: always visible
              else calcHeightLine(ny, prev(xx - 1))
            } else if (nx > ny) calcHeightEdge(ny, nx, prev(xx - 1), cur(xx - 1))
            else calcHeightEdge(nx, ny, prev(xx - 1), prev(xx))
          setOut(cur, res, xx, z)
          xx += 1
        }
        // leftward (mirrored indices)
        xx = ox - 1
        while (xx >= 0) {
          val nx = ox - xx
          val z =
            if (nx == ny) {
              if (ny == 1) cur(xx)
              else calcHeightLine(ny, prev(xx + 1))
            } else if (nx > ny) calcHeightEdge(ny, nx, prev(xx + 1), cur(xx + 1))
            else calcHeightEdge(nx, ny, prev(xx + 1), prev(xx))
          setOut(cur, res, xx, z)
          xx -= 1
        }
        System.arraycopy(res, 0, result, y * w, w)
        prev = cur
        ny += 1
        y += dirY
      }
    }
    sweep(1)
    sweep(-1)
    result
  }

  /** Distributed many-observer viewsheds: each observer gathers the tiles
    * its window overlaps (ONE shuffle; replication = windows per tile),
    * runs the exact window algorithm, and re-emits its window as tiles
    * keyed by observer id. Window is the full extent given here; bound it
    * with maxDist windows in production use. */
  def viewsheds(tiles: Dataset[Tile], observers: Seq[(Long, Int, Int, Double)],
                nTilesX: Int, nTilesY: Int,
                targetHeight: Double = 0.0): Dataset[(Long, Tile)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val obs = spark.sparkContext.broadcast(observers)
    tiles.flatMap(t => obs.value.map(o => (o._1, t)))
      .groupByKey(_._1)
      .flatMapGroups { (oid, it) =>
        val ts = scala.collection.mutable.ArrayBuffer[Tile]()
        it.foreach { case (_, t) => ts += t }
        if (ts.isEmpty) Iterator.empty
        else {
          val tw = ts(0).w; val th = ts(0).h
          val w = nTilesX * tw; val h = nTilesY * th
          val dem = new Array[Double](w * h)
          ts.foreach { t =>
            var yy = 0
            while (yy < th) {
              System.arraycopy(t.pixels, yy * tw, dem,
                (t.y * th + yy) * w + t.x * tw, tw)
              yy += 1
            }
          }
          val (_, ox, oy, oz) = obs.value.find(_._1 == oid).get
          val vis = computeWindow(dem, w, h, ox, oy, oz, targetHeight)
          val z = ts(0).z
          (for (ty <- 0 until nTilesY; tx <- 0 until nTilesX) yield {
            val px = new Array[Double](tw * th)
            var yy = 0
            while (yy < th) {
              System.arraycopy(vis, (ty * th + yy) * w + tx * tw, px, yy * tw, tw)
              yy += 1
            }
            (oid, Tile(z, tx, ty, 1, tw, th, px))
          }).iterator
        }
      }
  }
}
