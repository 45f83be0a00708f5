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

  /** CalcHeightDiagonal (viewshed_executor.cpp:85): plane through the
    * origin and the two predecessor points. */
  private def calcHeightDiagonal(i: Int, j: Int, za: Double, zb: Double): Double =
    (za * i + zb * j) / (i + j - 1)

  /** Cell-mode calculators (-cm edge|diagonal|min|max;
    * viewshed_executor.cpp doEdge/doDiagonal/doMin/doMax :100-132).
    * Arguments mirror the reference: (nX, nY) offsets from the observer,
    * thisPrev = cur row previous column, last = prev row same column,
    * lastPrev = prev row previous column. Diagonal cells (nX == nY) use
    * CalcHeightLine regardless of mode (:949-959). */
  val ModeEdge = 0; val ModeDiagonal = 1; val ModeMin = 2; val ModeMax = 3

  private def zOffDiag(mode: Int, nx: Int, ny: Int, thisPrev: Double,
                       last: Double, lastPrev: Double): Double = {
    def edge: Double =
      if (nx >= ny) calcHeightEdge(ny, nx, lastPrev, thisPrev)
      else calcHeightEdge(nx, ny, lastPrev, last)
    def diag: Double = calcHeightDiagonal(nx, ny, thisPrev, last)
    mode match {
      case 0 => edge
      case 1 => diag
      case 2 => math.min(edge, diag)
      case _ => math.max(edge, diag)
    }
  }

  /** Output modes (-om normal|dem|ground; viewshed_executor.cpp:316-320,
    * setOutputNormal :228-245): Normal emits visible/invisible values; DEM
    * emits the minimum ABSOLUTE height a target must have at each cell to
    * be visible (base = raw DEM, plus any positive required-height excess);
    * Ground emits the minimum height ABOVE GROUND (base = 0). In the
    * non-normal modes targetHeight/visibleVal/invisibleVal are unused,
    * matching the reference. */
  val OutNormal = 0; val OutDem = 1; val OutGround = 2

  /** One result/propagation update at column x of the current row: res
    * gets the output value, cur becomes the propagated max — the loop
    * body of setOutputNormal / the height modes (viewshed_executor.cpp:
    * 228-245, 316-320). */
  private def setOutAt(cur: Array[Double], res: Array[Double], x: Int,
                       z: Double, outputMode: Int, targetHeight: Double,
                       visibleVal: Double, invisibleVal: Double): Unit = {
    if (outputMode == OutNormal)
      res(x) = if (cur(x) + targetHeight < z) invisibleVal else visibleVal
    else {
      val adj = z - cur(x)
      if (adj > 0) res(x) += adj
    }
    if (z > cur(x)) cur(x) = z
  }

  /** Directly-visible seed: Normal mode writes visibleVal; the height
    * modes keep the base (zero adjustment). */
  private def seedAt(res: Array[Double], x: Int, outputMode: Int,
                     visibleVal: Double): Unit =
    if (outputMode == OutNormal) res(x) = visibleVal

  /** Process the OBSERVER row in place: cur = observer-relative heights
    * (mutated to the propagated state), res = result base. */
  private def observerRowInPlace(cur: Array[Double], res: Array[Double],
                                 w: Int, ox: Int, outputMode: Int,
                                 targetHeight: Double, visibleVal: Double,
                                 invisibleVal: Double): Unit = {
    seedAt(res, ox, outputMode, visibleVal)
    if (ox + 1 < w) seedAt(res, ox + 1, outputMode, visibleVal)
    var x = ox + 2
    while (x < w) {
      setOutAt(cur, res, x, calcHeightLine(x - ox, cur(x - 1)),
        outputMode, targetHeight, visibleVal, invisibleVal)
      x += 1
    }
    if (ox - 1 >= 0) seedAt(res, ox - 1, outputMode, visibleVal)
    x = ox - 2
    while (x >= 0) {
      setOutAt(cur, res, x, calcHeightLine(ox - x, cur(x + 1)),
        outputMode, targetHeight, visibleVal, invisibleVal)
      x -= 1
    }
  }

  /** Process one OUTWARD row (row distance ny >= 1 from the observer) in
    * place: cur = this row's observer-relative heights (mutated to the
    * propagated state), res = result base, prev = the PROPAGATED cur of
    * the previous row (ny - 1). This is the whole per-row dependence
    * surface — a row reads nothing else — which is what makes the
    * banded decomposition ([[viewshedsBanded]]) exact: handing `prev`
    * across a band boundary reproduces the sequential sweep bit-for-bit. */
  private def sweepRowInPlace(cur: Array[Double], res: Array[Double],
                              prev: Array[Double], w: Int, ox: Int, ny: Int,
                              mode: Int, outputMode: Int, targetHeight: Double,
                              visibleVal: Double, invisibleVal: Double): Unit = {
    def setOut(x: Int, z: Double): Unit =
      setOutAt(cur, res, x, z, outputMode, targetHeight, visibleVal, invisibleVal)
    // center column: pure vertical line
    if (ny == 1) seedAt(res, ox, outputMode, visibleVal)
    else setOut(ox, calcHeightLine(ny, prev(ox)))
    // rightward
    var xx = ox + 1
    while (xx < w) {
      val nx = xx - ox
      val z =
        if (nx == ny) {
          if (ny == 1) cur(xx) // adjacent diagonal: always visible
          else calcHeightLine(ny, prev(xx - 1))
        } else zOffDiag(mode, nx, ny, cur(xx - 1), prev(xx), prev(xx - 1))
      setOut(xx, z)
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
        } else zOffDiag(mode, nx, ny, cur(xx + 1), prev(xx), prev(xx + 1))
      setOut(xx, z)
      xx -= 1
    }
  }

  /** Exact single-window viewshed. `dem` row-major w×h; observer at
    * (ox, oy) with eye `observerZ` above the surface. Returns
    * visibleVal/invisibleVal per pixel (or min-height rasters — see
    * `outputMode`). `mode` is the -cm cell mode (ModeEdge default, the
    * reference's default). */
  /** `heightAdjFactor` is the earth-curvature drop per squared pixel
    * distance — gdal_viewshed -cc: the reference computes
    * curveCoeff/(2·semiMajor) in georeferenced units
    * (viewshed_executor.cpp:198-216) and subtracts adj·dist² from each
    * cell height before propagation (:403,428); pass
    * curveCoeff/(2·a)·cellSize² here for the same effect in pixel space.
    * 0 (default) disables the adjustment. */
  def computeWindow(dem: Array[Double], w: Int, h: Int, ox: Int, oy: Int,
                    observerZ: Double, targetHeight: Double = 0.0,
                    visibleVal: Double = 255.0,
                    invisibleVal: Double = 0.0,
                    mode: Int = ModeEdge,
                    outputMode: Int = OutNormal,
                    heightAdjFactor: Double = 0.0): Array[Double] = {
    val zObs = observerZ + dem(oy * w + ox)
    val result = new Array[Double](w * h)
    // observer-relative heights for the current and previous rows, with
    // the curvature drop adj·dist² applied pre-propagation (:403)
    def rowRel(y: Int): Array[Double] = {
      val r = new Array[Double](w)
      val dy2 = (y - oy).toDouble * (y - oy)
      var x = 0
      while (x < w) {
        val dx = (x - ox).toDouble
        r(x) = dem(y * w + x) - heightAdjFactor * (dx * dx + dy2) - zObs
        x += 1
      }
      r
    }
    // result-line base: raw DEM in DEM mode (:317), zero otherwise (:319)
    def baseRow(y: Int): Array[Double] =
      if (outputMode == OutDem) Array.tabulate(w)(x => dem(y * w + x))
      else new Array[Double](w)
    // ---- observer row (extracted: observerRowInPlace — the banded path
    // reuses the identical code, so the decompositions are exact by
    // construction, not by coincidence)
    val obsCur = rowRel(oy)
    val obsRes = baseRow(oy)
    observerRowInPlace(obsCur, obsRes, w, ox, outputMode,
      targetHeight, visibleVal, invisibleVal)
    System.arraycopy(obsRes, 0, result, oy * w, w)

    // ---- rows outward (down: +1, up: -1), each chain seeded by the
    // observer row's final cur
    def sweep(dirY: Int): Unit = {
      var prev = obsCur.clone()
      var ny = 1
      var y = oy + dirY
      while (y >= 0 && y < h) {
        val cur = rowRel(y)
        val res = baseRow(y)
        sweepRowInPlace(cur, res, prev, w, ox, ny, mode, outputMode,
          targetHeight, visibleVal, invisibleVal)
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
    * with maxDist windows in production use.
    *
    * One observer = one task here; see [[viewshedsSplit]] for the
    * intra-observer quadrant decomposition (4 tasks per observer, each
    * holding only a quarter of the window). */
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

  /** Post-mask one output value: -md (outside the max-distance disc),
    * -mind (inside the min-distance hole) and -sa/-ea (outside the angular
    * sector) replace the computed value with outOfRangeVal
    * (viewshed_executor.cpp adjustHeight LineLimits / maskLine*). Exact
    * because every recurrence dependency is strictly closer to the
    * observer, so in-range values never read out-of-range cells. */
  private def maskedValue(v: Double, dx: Double, dy: Double,
                          md2: Double, mind2: Double, angleMask: Boolean,
                          saRad: Double, eaRad: Double,
                          outOfRangeVal: Double): Double = {
    val d2 = dx * dx + dy * dy
    val outOfSector = angleMask && d2 > 0.0 && {
      var a = math.atan2(-dy, dx)
      if (a < 0) a += 2.0 * math.Pi
      // rayBetween with swapped endpoints (math angles are CCW)
      val (s0, e0) = (eaRad, saRad)
      if (s0 < e0) !(a >= s0 && a <= e0)
      else if (s0 > e0) !(a >= s0 || a <= e0)
      else true
    }
    if ((md2 > 0.0 && d2 > md2) || d2 < mind2 || outOfSector) outOfRangeVal
    else v
  }

  /** Intra-observer parallel viewsheds: one observer becomes FOUR quadrant
    * tasks instead of one whole-window task.
    *
    * Exactness: this is the reference's own parallel structure taken to its
    * limit — ViewshedExecutor splits each line into left-of-observer /
    * right-of-observer jobs and runs the up/down sweeps as two jobs
    * (viewshed_executor.cpp:1031,1162). The recurrence justifies a full
    * quadrant split: rightward pixels (x > ox) read only prev(x-1), prev(x),
    * cur(x-1) — all with index >= ox — and the up-sweep reads only rows
    * <= oy, so the upper-right quadrant (columns >= ox, rows <= oy) is
    * closed under the dependence relation given the observer row, which
    * each quadrant recomputes locally for its half (one row, O(w)).
    * Mirrored for the other three. Each quadrant therefore equals
    * [[computeWindow]] run on the quadrant sub-DEM with the observer at
    * its corner, and the stitched result is bit-identical to the
    * whole-window run (ViewshedSplitSpec asserts this at two tile sizes
    * and for edge/corner observers).
    *
    * Scale shape: a continental single-observer viewshed is no longer one
    * executor task holding the full window — it is 4 tasks each gathering
    * only its quadrant's tiles (¼ the memory, 4× the parallelism — the
    * same factor the reference's 4-thread pool extracts, but across
    * executors). Two shuffles: quadrant gather (tile replication ≈ 1 per
    * observer, boundary tiles up to 4) and the small output-tile stitch.
    *
    * `maxDistance` (> 0) is gdal_viewshed -md with `outOfRangeVal` (-ov):
    * pixels farther than maxDistance from the observer take outOfRangeVal
    * (viewshed_executor.cpp adjustHeight LineLimits / maskLine*), and —
    * the scale point — the GATHER is pruned to the observer's disc bbox,
    * so a fleet of bounded observers ships each tile only to the
    * observers whose window touches it, never world×observers. Tiles
    * entirely out of range are NOT emitted (callers treat missing tiles
    * as all-outOfRangeVal). Exactness of post-masking: every recurrence
    * dependency is strictly closer to the observer, so in-range values
    * never read out-of-range cells. */
  def viewshedsSplit(tiles: Dataset[Tile], observers: Seq[(Long, Int, Int, Double)],
                     nTilesX: Int, nTilesY: Int,
                     targetHeight: Double = 0.0,
                     visibleVal: Double = 255.0,
                     invisibleVal: Double = 0.0,
                     mode: Int = ModeEdge,
                     outputMode: Int = OutNormal,
                     maxDistance: Double = 0.0,
                     outOfRangeVal: Double = 0.0,
                     heightAdjFactor: Double = 0.0,
                     minDistance: Double = 0.0,
                     startAngleDeg: Double = 0.0,
                     endAngleDeg: Double = 0.0): Dataset[(Long, Tile)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val obs = spark.sparkContext.broadcast(observers)
    val md = maxDistance
    val mdC = if (md > 0.0) math.ceil(md).toInt else Int.MaxValue
    val md2 = md * md
    // -mind: pixels NEARER than minDistance are out of range too
    // (m_dfMinDistance2, viewshed_executor.cpp:379); the gather is
    // unaffected (the inner hole is interior to the window)
    val mind2 = minDistance * minDistance
    // -sa/-ea sector mask: clockwise-from-north degrees normalized to math
    // radians via 90−deg (util.cpp normalizeAngle :25-30); pixels whose ray
    // falls outside [start,end] (rayBetween with swapped endpoints, :174)
    // take outOfRangeVal. Equal NORMALIZED angles disable masking — the
    // reference normalizes first (viewshed.cpp:474) and short-circuits on
    // equality after (viewshed_executor.cpp:706), so -sa 0 -ea 360 (or any
    // pair differing by 360k) means full circle = unmasked, not all-masked.
    // The observer's own pixel is kept (its ray is undefined). Output-mask
    // only — in-sector values are unaffected (same strictly-closer
    // dependence argument as -md post-masking).
    val saRad = { val a = (90.0 - startAngleDeg) % 360.0
      (if (a < 0) a + 360.0 else a) * math.Pi / 180.0 }
    val eaRad = { val a = (90.0 - endAngleDeg) % 360.0
      (if (a < 0) a + 360.0 else a) * math.Pi / 180.0 }
    val angleMask = saRad != eaRad

    // quadrant q gather rect (inclusive, global px): x side 0/2 -> [ox, W-1],
    // 1/3 -> [0, ox]; y side 0/1 -> [0, oy], 2/3 -> [oy, H-1]; with -md,
    // intersected with the observer disc bbox
    val keyed = tiles.flatMap { t =>
      val tx0 = t.x * t.w; val ty0 = t.y * t.h
      val tx1 = tx0 + t.w - 1; val ty1 = ty0 + t.h - 1
      obs.value.iterator.flatMap { case (oid, ox, oy, _) =>
        val inDisc = md <= 0.0 ||
          (tx1 >= ox - mdC && tx0 <= ox + mdC && ty1 >= oy - mdC && ty0 <= oy + mdC)
        (0 until 4).filter { q =>
          val inX = if (q % 2 == 0) tx1 >= ox else tx0 <= ox
          val inY = if (q < 2) ty0 <= oy else ty1 >= oy
          inDisc && inX && inY
        }.map(q => (oid, q, t))
      }
    }

    val partials = keyed.groupByKey(k => (k._1, k._2)).flatMapGroups { (key, it) =>
      val (oid, q) = key
      val ts = it.map(_._3).toArray
      val tw = ts(0).w; val th = ts(0).h; val z = ts(0).z
      val bigW = nTilesX * tw; val bigH = nTilesY * th
      val (_, ox, oy, oz) = obs.value.find(_._1 == oid).get
      // sub-window bounds (inclusive), clamped to the -md disc bbox
      val gx0 = math.max(if (q % 2 == 0) ox else 0, if (md > 0) ox - mdC else 0)
      val gx1 = math.min(if (q % 2 == 0) bigW - 1 else ox,
        if (md > 0) ox + mdC else bigW - 1)
      val gy0 = math.max(if (q < 2) 0 else oy, if (md > 0) oy - mdC else 0)
      val gy1 = math.min(if (q < 2) oy else bigH - 1,
        if (md > 0) oy + mdC else bigH - 1)
      val sw = gx1 - gx0 + 1; val sh = gy1 - gy0 + 1
      val dem = new Array[Double](sw * sh)
      ts.foreach { t =>
        val tgx0 = t.x * tw; val tgy0 = t.y * th
        val ix0 = math.max(gx0, tgx0); val ix1 = math.min(gx1, tgx0 + tw - 1)
        val iy0 = math.max(gy0, tgy0); val iy1 = math.min(gy1, tgy0 + th - 1)
        var gy = iy0
        while (gy <= iy1) {
          System.arraycopy(t.pixels, (gy - tgy0) * tw + (ix0 - tgx0),
            dem, (gy - gy0) * sw + (ix0 - gx0), ix1 - ix0 + 1)
          gy += 1
        }
      }
      val vis = computeWindow(dem, sw, sh, ox - gx0, oy - gy0, oz, targetHeight,
        visibleVal, invisibleVal, mode, outputMode, heightAdjFactor)
      // emission rect: partition of the window (observer row to the upper
      // quadrants, observer column to the right ones), clamped to the disc
      // bbox under -md
      val ex0 = math.max(if (q % 2 == 0) ox else 0, gx0)
      val ex1 = math.min(if (q % 2 == 0) bigW - 1 else ox - 1, gx1)
      val ey0 = math.max(if (q < 2) 0 else oy + 1, gy0)
      val ey1 = math.min(if (q < 2) oy else bigH - 1, gy1)
      if (ex1 < ex0 || ey1 < ey0) Iterator.empty
      else (for (tX <- ex0 / tw to ex1 / tw; tY <- ey0 / th to ey1 / th) yield {
        val px = Array.fill(tw * th)(Double.NaN)
        val ix0 = math.max(ex0, tX * tw); val ix1 = math.min(ex1, tX * tw + tw - 1)
        val iy0 = math.max(ey0, tY * th); val iy1 = math.min(ey1, tY * th + th - 1)
        var gy = iy0
        while (gy <= iy1) {
          if (md <= 0.0 && mind2 == 0.0 && !angleMask)
            System.arraycopy(vis, (gy - gy0) * sw + (ix0 - gx0),
              px, (gy - tY * th) * tw + (ix0 - tX * tw), ix1 - ix0 + 1)
          else {
            var gx = ix0
            while (gx <= ix1) {
              px((gy - tY * th) * tw + (gx - tX * tw)) = maskedValue(
                vis((gy - gy0) * sw + (gx - gx0)), (gx - ox).toDouble,
                (gy - oy).toDouble, md2, mind2, angleMask, saRad, eaRad,
                outOfRangeVal)
              gx += 1
            }
          }
          gy += 1
        }
        (oid, tX, tY, z, tw, th, px)
      }).iterator
    }

    // stitch: <=4 disjoint NaN-marked partials per output tile
    partials.groupByKey(p => (p._1, p._2, p._3))
      .mapGroups { (key, it) =>
        val (oid, tx, ty) = key
        var z = 0; var tw = 0; var th = 0
        var out: Array[Double] = null
        it.foreach { case (_, _, _, pz, pw, ph, px) =>
          if (out == null) { z = pz; tw = pw; th = ph; out = Array.fill(pw * ph)(Double.NaN) }
          var i = 0
          while (i < px.length) {
            if (!java.lang.Double.isNaN(px(i))) out(i) = px(i)
            i += 1
          }
        }
        // with -md, tile corners beyond the disc bbox were never emitted by
        // any quadrant: they are out of range
        if (md > 0.0) {
          var i = 0
          while (i < out.length) {
            if (java.lang.Double.isNaN(out(i))) out(i) = outOfRangeVal
            i += 1
          }
        }
        (oid, Tile(z, tx, ty, 1, tw, th, out))
      }
  }

  /** One banded-stage record: kind 0 = a NaN-marked partial output tile
    * (tx, ty, z, tw, th, px); kind 1 = propagated state for (oid, q) —
    * px = the boundary row's final propagated cur (length = quadrant
    * width), zObs = the absolute observer eye height. */
  private[engine] final case class BandRec(kind: Int, oid: Long, q: Int,
                                           tx: Int, ty: Int, z: Int,
                                           tw: Int, th: Int,
                                           px: Array[Double], zObs: Double)

  /** Banded single-observer viewsheds — the decomposition FINER than
    * [[viewshedsSplit]]'s 4× (round-4 verdict #4): each quadrant is split
    * into latitude bands of `bandRows` rows, processed as a PIPELINE of
    * Spark stages with a propagated boundary row.
    *
    * Exactness: a sweep row reads only the previous row's propagated state
    * (`prev`) plus its own DEM line ([[sweepRowInPlace]] is the whole
    * dependence surface, shared with [[computeWindow]]), so handing the
    * band's final `cur` to the next band reproduces the sequential sweep
    * bit-for-bit. ViewshedSplitSpec asserts identity against the
    * whole-window run at two band widths.
    *
    * Scale shape (the reference's per-line job structure,
    * alg/viewshed/viewshed_executor.cpp:1031-1162, lifted to bands): a
    * continental single-observer run is no longer 4 quadrant-sized tasks —
    * stage g runs every (observer, quadrant)'s band g as a task holding
    * only bandRows×width pixels, so the window no longer has to fit in one
    * executor's memory, and a fleet of observers pipelines: while one
    * observer's band g computes, nothing waits on its band g−1 peers.
    * The boundary state stays DISTRIBUTED — one row of doubles per
    * (observer, quadrant), cogrouped by key into the next stage, never
    * collected to the driver. Costs vs the quadrant split: the gather
    * shuffle replicates a tile into ceil(tileRows/bandRows)+1 bands (pick
    * bandRows ≥ the tile height at scale) and the pipeline runs
    * numBands sequential stages (each materialized: that IS the
    * pipeline barrier the propagated row requires).
    *
    * Options match [[viewshedsSplit]] exactly (same mask helper, same
    * emission partition, same stitch). */
  def viewshedsBanded(tiles: Dataset[Tile], observers: Seq[(Long, Int, Int, Double)],
                      nTilesX: Int, nTilesY: Int, bandRows: Int,
                      targetHeight: Double = 0.0,
                      visibleVal: Double = 255.0,
                      invisibleVal: Double = 0.0,
                      mode: Int = ModeEdge,
                      outputMode: Int = OutNormal,
                      maxDistance: Double = 0.0,
                      outOfRangeVal: Double = 0.0,
                      heightAdjFactor: Double = 0.0,
                      minDistance: Double = 0.0,
                      startAngleDeg: Double = 0.0,
                      endAngleDeg: Double = 0.0): Dataset[(Long, Tile)] = {
    require(bandRows >= 1, s"bandRows must be >= 1, got $bandRows")
    val spark = tiles.sparkSession
    import spark.implicits._
    val obs = spark.sparkContext.broadcast(observers)
    val B = bandRows
    val md = maxDistance
    val mdC = if (md > 0.0) math.ceil(md).toInt else Int.MaxValue
    val md2 = md * md
    val mind2 = minDistance * minDistance
    val saRad = { val a = (90.0 - startAngleDeg) % 360.0
      (if (a < 0) a + 360.0 else a) * math.Pi / 180.0 }
    val eaRad = { val a = (90.0 - endAngleDeg) % 360.0
      (if (a < 0) a + 360.0 else a) * math.Pi / 180.0 }
    val angleMask = saRad != eaRad

    // quadrant geometry, identical to viewshedsSplit (q: 0=UR 1=UL 2=LR
    // 3=LL; x side 0/2 -> [ox, W-1], 1/3 -> [0, ox]; y side 0/1 -> rows
    // <= oy, 2/3 -> rows >= oy; clamped to the -md disc bbox)
    def quadRect(q: Int, ox: Int, oy: Int, bigW: Int, bigH: Int): (Int, Int, Int, Int) = {
      val gx0 = math.max(if (q % 2 == 0) ox else 0, if (md > 0) ox - mdC else 0)
      val gx1 = math.min(if (q % 2 == 0) bigW - 1 else ox,
        if (md > 0) ox + mdC else bigW - 1)
      val gy0 = math.max(if (q < 2) 0 else oy, if (md > 0) oy - mdC else 0)
      val gy1 = math.min(if (q < 2) oy else bigH - 1,
        if (md > 0) oy + mdC else bigH - 1)
      (gx0, gx1, gy0, gy1)
    }
    def dirOf(q: Int): Int = if (q < 2) -1 else 1
    def nyMaxOf(q: Int, oy: Int, gy0: Int, gy1: Int): Int =
      if (q < 2) oy - gy0 else gy1 - oy

    val first = tiles.head()
    val tw0 = first.w; val th0 = first.h
    val bigW = nTilesX * tw0; val bigH = nTilesY * th0
    val numBands = observers.iterator.flatMap { case (_, ox, oy, _) =>
      (0 until 4).map { q =>
        val (_, _, gy0, gy1) = quadRect(q, ox, oy, bigW, bigH)
        nyMaxOf(q, oy, gy0, gy1) / B + 1
      }
    }.max

    // gather keying: tile -> every (oid, q, band) whose row range it
    // touches (replication ≈ ceil(th/B)+1 bands per overlapped quadrant)
    val keyed = tiles.flatMap { t =>
      val tx0 = t.x * t.w; val ty0 = t.y * t.h
      val tx1 = tx0 + t.w - 1; val ty1 = ty0 + t.h - 1
      obs.value.iterator.flatMap { case (oid, ox, oy, _) =>
        (0 until 4).iterator.flatMap { q =>
          val (gx0, gx1, gy0, gy1) = quadRect(q, ox, oy, bigW, bigH)
          if (tx1 < gx0 || tx0 > gx1 || ty1 < gy0 || ty0 > gy1) Iterator.empty
          else {
            val nyLo = if (q < 2) math.max(0, oy - math.min(ty1, gy1))
                       else math.max(0, math.max(ty0, gy0) - oy)
            val nyHi = if (q < 2) oy - math.max(ty0, gy0)
                       else math.min(ty1, gy1) - oy
            (nyLo / B to nyHi / B).iterator.map(g => (oid, q, g, t))
          }
        }
      }
    }.persist()
    keyed.count()

    var state: Dataset[BandRec] = spark.emptyDataset[BandRec]
    val stages = scala.collection.mutable.ArrayBuffer[Dataset[BandRec]]()
    for (g <- 0 until numBands) {
      val bandTiles = keyed.filter(r => r._3 == g)
      val out: Dataset[BandRec] = bandTiles.groupByKey(r => (r._1, r._2))
        .cogroup(state.groupByKey(s => (s.oid, s.q))) { case ((oid, q), tIt, sIt) =>
          val (_, ox, oy, oz) = obs.value.find(_._1 == oid).get
          val (gx0, gx1, gy0, gy1) = quadRect(q, ox, oy, bigW, bigH)
          val nyMax = nyMaxOf(q, oy, gy0, gy1)
          val nyStart = g * B
          if (nyStart > nyMax || gx1 < gx0) Iterator.empty
          else {
            val dir = dirOf(q)
            val nyEnd = math.min(nyStart + B - 1, nyMax)
            val nRows = nyEnd - nyStart + 1
            val sw = gx1 - gx0 + 1
            val oxL = ox - gx0
            // band DEM, row r = distance nyStart + r from the observer
            val dem = new Array[Double](sw * nRows)
            var tw = tw0; var th = th0; var z = 0
            tIt.foreach { case (_, _, _, t) =>
              tw = t.w; th = t.h; z = t.z
              val tgx0 = t.x * tw; val tgy0 = t.y * th
              val ix0 = math.max(gx0, tgx0); val ix1 = math.min(gx1, tgx0 + tw - 1)
              var r = 0
              while (r < nRows) {
                val gy = oy + dir * (nyStart + r)
                if (gy >= tgy0 && gy < tgy0 + th && ix1 >= ix0)
                  System.arraycopy(t.pixels, (gy - tgy0) * tw + (ix0 - tgx0),
                    dem, r * sw + (ix0 - gx0), ix1 - ix0 + 1)
                r += 1
              }
            }
            val st = sIt.toSeq.headOption
            val zObs = st.map(_.zObs).getOrElse(oz + dem(oxL)) // band 0: row 0 IS the observer row
            def rowRel(r: Int): Array[Double] = {
              val a = new Array[Double](sw)
              val ny = (nyStart + r).toDouble
              val dy2 = ny * ny
              var lx = 0
              while (lx < sw) {
                val dx = (gx0 + lx - ox).toDouble
                a(lx) = dem(r * sw + lx) - heightAdjFactor * (dx * dx + dy2) - zObs
                lx += 1
              }
              a
            }
            def baseRow(r: Int): Array[Double] =
              if (outputMode == OutDem) {
                val a = new Array[Double](sw)
                System.arraycopy(dem, r * sw, a, 0, sw); a
              } else new Array[Double](sw)
            val resRows = new Array[Array[Double]](nRows)
            var prev = st.map(_.px).orNull
            var r = 0
            while (r < nRows) {
              val cur = rowRel(r)
              val res = baseRow(r)
              if (nyStart + r == 0)
                observerRowInPlace(cur, res, sw, oxL, outputMode,
                  targetHeight, visibleVal, invisibleVal)
              else
                sweepRowInPlace(cur, res, prev, sw, oxL, nyStart + r, mode,
                  outputMode, targetHeight, visibleVal, invisibleVal)
              resRows(r) = res
              prev = cur
              r += 1
            }
            // emission partition identical to viewshedsSplit: right
            // quadrants own the observer column, upper ones the observer
            // row (band 0's ny=0 row is emitted by q<2 only)
            val ex0 = math.max(if (q % 2 == 0) ox else 0, gx0)
            val ex1 = math.min(if (q % 2 == 0) bigW - 1 else ox - 1, gx1)
            val emitNyLo = if (q < 2) nyStart else math.max(nyStart, 1)
            val partials =
              if (ex1 < ex0 || emitNyLo > nyEnd) Iterator.empty
              else {
                val gyLo = math.min(oy + dir * emitNyLo, oy + dir * nyEnd)
                val gyHi = math.max(oy + dir * emitNyLo, oy + dir * nyEnd)
                (for (tX <- ex0 / tw to ex1 / tw;
                      tY <- gyLo / th to gyHi / th) yield {
                  val px = Array.fill(tw * th)(Double.NaN)
                  val ix0 = math.max(ex0, tX * tw); val ix1 = math.min(ex1, tX * tw + tw - 1)
                  val iy0 = math.max(gyLo, tY * th); val iy1 = math.min(gyHi, tY * th + th - 1)
                  var gy = iy0
                  while (gy <= iy1) {
                    val rr = dir * (gy - oy) - nyStart
                    if (rr >= 0 && rr < nRows && dir * (gy - oy) >= emitNyLo) {
                      val res = resRows(rr)
                      var gx = ix0
                      while (gx <= ix1) {
                        px((gy - tY * th) * tw + (gx - tX * tw)) = maskedValue(
                          res(gx - gx0), (gx - ox).toDouble, (gy - oy).toDouble,
                          md2, mind2, angleMask, saRad, eaRad, outOfRangeVal)
                        gx += 1
                      }
                    }
                    gy += 1
                  }
                  BandRec(0, oid, q, tX, tY, z, tw, th, px, 0.0)
                }).iterator
              }
            val next =
              if (nyEnd < nyMax) Iterator.single(BandRec(1, oid, q, 0, 0, 0, 0, 0, prev, zObs))
              else Iterator.empty
            partials ++ next
          }
        }.persist()
      out.count() // the pipeline barrier: band g is sealed before g+1 reads its boundary
      stages += out
      state = out.filter(_.kind == 1)
    }
    keyed.unpersist()

    // stitch: disjoint NaN-marked partials per output tile, as in
    // viewshedsSplit (<=4 quadrants × the bands overlapping the tile).
    // The union is materialized ONCE here so every per-band stage cache
    // can be released before returning — otherwise numBands full-volume
    // datasets stay pinned in executor storage for the session lifetime
    // (one persisted stitch input replaces numBands persisted stages).
    val partials = stages.reduce(_ union _).filter(_.kind == 0).persist()
    partials.count()
    stages.foreach(_.unpersist(blocking = false))
    partials
      .groupByKey(p => (p.oid, p.tx, p.ty))
      .mapGroups { (key, it) =>
        val (oid, tx, ty) = key
        var z = 0; var tw = 0; var th = 0
        var out: Array[Double] = null
        it.foreach { p =>
          if (out == null) { z = p.z; tw = p.tw; th = p.th; out = Array.fill(p.tw * p.th)(Double.NaN) }
          var i = 0
          while (i < p.px.length) {
            if (!java.lang.Double.isNaN(p.px(i))) out(i) = p.px(i)
            i += 1
          }
        }
        if (md > 0.0) {
          var i = 0
          while (i < out.length) {
            if (java.lang.Double.isNaN(out(i))) out(i) = outOfRangeVal
            i += 1
          }
        }
        (oid, Tile(z, tx, ty, 1, tw, th, out))
      }
  }

  /** Cumulative viewshed (`gdal_viewshed -mode cumulative`; reference:
    * alg/viewshed/cumulative.cpp): observers on a grid every
    * `observerSpacing` pixels starting at (0,0) (:66-68), each runs a
    * NORMAL viewshed with visibleVal=1 (:47-48), the per-pixel counts sum
    * (combiner.cpp:46), and the result is scaled
    * `floor(255/max · count)` where max is the global count maximum
    * (scaleOutput, :201-214; max==0 leaves the zeros).
    *
    * Spark shape: the observer fan-out is [[viewshedsSplit]] (4 quadrant
    * tasks per observer), the count rollup is one groupByKey over output
    * tiles (pixel-wise integer sum — the combiner tree, distributed), and
    * the scale pass needs the global max first: one extra action over the
    * cached counts, the same two-phase structure as the reference's
    * rollup-then-scale. */
  def cumulative(tiles: Dataset[Tile], nTilesX: Int, nTilesY: Int,
                 tileSize: Int, observerSpacing: Int, observerZ: Double,
                 targetHeight: Double = 0.0): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val bigW = nTilesX * tileSize; val bigH = nTilesY * tileSize
    val obs = (for {
      x <- 0 until bigW by observerSpacing
      y <- 0 until bigH by observerSpacing
    } yield (x.toLong * bigH + y, x, y, observerZ)).toSeq
    val vs = viewshedsSplit(tiles, obs, nTilesX, nTilesY, targetHeight,
      visibleVal = 1.0, invisibleVal = 0.0)
    val counts = vs.groupByKey(p => (p._2.x, p._2.y))
      .mapGroups { (key, it) =>
        val (tx, ty) = key
        var z = 0; var tw = 0; var th = 0
        var acc: Array[Double] = null
        it.foreach { case (_, t) =>
          if (acc == null) { z = t.z; tw = t.w; th = t.h; acc = new Array[Double](tw * th) }
          var i = 0
          while (i < acc.length) { acc(i) += t.pixels(i); i += 1 }
        }
        Tile(z, tx, ty, 1, tw, th, acc)
      }.persist()
    val mx = counts.map(t => t.pixels.max).reduce(math.max)
    if (mx == 0.0) counts
    else {
      val factor = 255.0 / mx
      counts.map(t => t.copy(pixels = t.pixels.map(v => math.floor(factor * v))))
    }
  }
}
