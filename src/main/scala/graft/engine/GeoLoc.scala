package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geolocation array (GEOLOCATION metadata domain) description: per-node
  * georeferenced coordinates for a (possibly subsampled) raster, i.e.
  * geoX/geoY sampled at raster position
  * `(node + convOffset) * STEP + OFFSET` (reference:
  * alg/gdalgeoloc.cpp GDALGeoLocTransformInfo).
  *
  * `noDataX` marks invalid nodes (checked on the X array only, as in the
  * reference). `originTopLeftCorner=false` is the common pixel-center
  * convention (georef convention offset 0.5). */
final case class GeoLocGrid(
    w: Int, h: Int, gx: Array[Double], gy: Array[Double],
    pixelOffset: Double, pixelStep: Double,
    lineOffset: Double, lineStep: Double,
    noDataX: Option[Double] = None,
    originTopLeftCorner: Boolean = false,
    oversample: Double = 1.3) {
  require(gx.length == w * h && gy.length == w * h)
}

/** The inverse-transform backmap: a regular geo-space grid holding raster
  * pixel/line values (NaN = invalid), with its geotransform
  * (minX, psx, 0, maxY, 0, -psy) (gdalgeoloc.cpp GenerateBackMap). */
final case class GeoLocBackMap(
    w: Int, h: Int, minX: Double, maxY: Double,
    psx: Double, psy: Double,
    bmx: Array[Double], bmy: Array[Double])

/** One sample's contribution to a backmap node during generation: either
  * the exact inverse-bilinear solution (`exact`, weight sentinel) or a
  * bilinear-weighted scatter term. Top-level for Spark encoder derivation. */
private[graft] final case class GeoLocNodeContribution(
    node: Long, exact: Boolean, order: Long,
    wx: Double, wy: Double, wt: Double)

/** Geolocation-array transformer (reference: alg/gdalgeoloc.cpp) — the
  * GDAL transformer for rasters georeferenced by explicit per-node
  * longitude/latitude arrays (swath satellite products) rather than an
  * affine geotransform.
  *
  * Reference semantics mirrored:
  *  - forward (pixel/line → geoX/geoY): raster coords map into geoloc
  *    array space via (x - OFFSET)/STEP - convOffset, then bilinear
  *    interpolation between the four surrounding nodes with "infinite
  *    extension beyond borders" clamping, the two-attempt right/bottom
  *    edge retreat, nodata-aware degradation to one-axis linear and
  *    point lookups (PixelLineToXY, gdalgeoloc.cpp:392-525);
  *  - inverse (geoX/geoY → pixel/line): coarse lookup in a generated
  *    BACKMAP — a regular geo-grid of pixel/line values — followed by
  *    the max-accuracy refinement: a ring search (radius 3) around the
  *    approximate geoloc cell for the forward quadrilateral containing
  *    the query, then EXACT inverse bilinear interpolation inside it
  *    (GDALGeoLocTransform dst→src, gdalgeoloc.cpp:651-949);
  *  - backmap generation: oversampled walk of geoloc space (step
  *    1/oversample), forward-projecting each sample; the backmap node the
  *    sample lands in gets the EXACT inverse-bilinear solution of the
  *    node's own geo position inside a containing forward cell (weight 1);
  *    samples whose node has no containing cell scatter-average into the
  *    4 surrounding nodes with bilinear weights; holes are filled by the
  *    IDW pass (GDALFillNodata, maxSearchDist 3, the same kernel as
  *    [[Fill.fillNodata]]) and the per-line linear bridge for |Δ| ≤ 2
  *    (GenerateBackMap, gdalgeoloc.cpp:1019-1600);
  *  - inverse bilinear: the exact quadratic method, including the
  *    degenerate rectangle/triangle branch and the t-denominator fallback
  *    from x to y (GDALInverseBilinearInterpolation, gdalgeoloc.cpp:
  *    960-1010).
  *
  * Documented deviations (all determinism-motivated):
  *  - backmap scatter averaging uses order-independent DOUBLE weighted
  *    sums with a single final fold-guard acceptance test (averaged value
  *    must imply a geoloc position within 2 backmap pixels of the node's
  *    geo position) instead of the reference's sequential float32
  *    accumulate-and-check — same intent, parallel-safe;
  *  - backmap values are stored as doubles (the reference quantizes to
  *    float32);
  *  - antimeridian/pole handling (±360 quad folding, the r=5 polar search
  *    radius) is out of scope — grids here are local, far from ±180.
  *
  * Spark shape for 100 TB: the geoloc array is METADATA-scale (a swath
  * grid, not the data). Backmap construction distributes the oversampled
  * sample sweep (the expensive part: ~oversample² × grid nodes forward
  * projections + quad searches) via spark.range → per-sample work →
  * one groupBy(node) agg; the finished backmap is bounded driver state
  * (like the ANN codebooks) broadcast to executors. Both transforms over
  * the BIG table are then map-only UDFs — the document table never
  * shuffles, nothing is collected. */
object GeoLoc {

  private def conv(g: GeoLocGrid): Double = if (g.originTopLeftCorner) 0.0 else 0.5
  @inline private def gxAt(g: GeoLocGrid, i: Int, j: Int): Double = g.gx(j * g.w + i)
  @inline private def gyAt(g: GeoLocGrid, i: Int, j: Int): Double = g.gy(j * g.w + i)
  @inline private def isNd(g: GeoLocGrid, v: Double): Boolean =
    g.noDataX.exists(_ == v)

  /** Forward bilinear node interpolation with the reference's exact
    * two-attempt edge retreat and nodata degradation
    * (PixelLineToXY, gdalgeoloc.cpp:392-525). Coordinates are GEOLOC
    * ARRAY space (node units). */
  private[graft] def pixelLineToXY(g: GeoLocGrid, glP: Double,
                                   glL: Double): Option[(Double, Double)] = {
    var iX = math.min(math.max(0.0, glP), (g.w - 1).toDouble).toInt
    var iY = math.min(math.max(0.0, glL), (g.h - 1).toDouble).toInt
    var attempt = 0
    while (attempt < 2) {
      val g00x = gxAt(g, iX, iY)
      val g00y = gyAt(g, iX, iY)
      if (isNd(g, g00x)) return None
      if (iX + 1 < g.w && iY + 1 < g.h) {
        val g10x = gxAt(g, iX + 1, iY); val g10y = gyAt(g, iX + 1, iY)
        val g01x = gxAt(g, iX, iY + 1); val g01y = gyAt(g, iX, iY + 1)
        val g11x = gxAt(g, iX + 1, iY + 1); val g11y = gyAt(g, iX + 1, iY + 1)
        if (g.noDataX.isEmpty ||
            (!isNd(g, g10x) && !isNd(g, g01x) && !isNd(g, g11x))) {
          val fx = glP - iX; val fy = glL - iY
          val x = (1 - fy) * (g00x + fx * (g10x - g00x)) +
            fy * (g01x + fx * (g11x - g01x))
          val y = (1 - fy) * (g00y + fx * (g10y - g00y)) +
            fy * (g01y + fx * (g11y - g01y))
          return Some((x, y))
        }
      }
      // edge retreats: one more attempt from the adjusted corner
      if (iX == g.w - 1 && iX >= 1 && iY + 1 < g.h) { iX -= 1; attempt += 1 }
      else if (iY == g.h - 1 && iY >= 1 && iX + 1 < g.w) { iY -= 1; attempt += 1 }
      else if (iX == g.w - 1 && iY == g.h - 1 && iX >= 1 && iY >= 1) {
        iX -= 1; iY -= 1; attempt += 1
      } else if (iX + 1 < g.w && !isNd(g, gxAt(g, iX + 1, iY))) {
        val fx = glP - iX
        return Some((g00x + fx * (gxAt(g, iX + 1, iY) - g00x),
          g00y + fx * (gyAt(g, iX + 1, iY) - g00y)))
      } else if (iY + 1 < g.h && !isNd(g, gxAt(g, iX, iY + 1))) {
        val fy = glL - iY
        return Some((g00x + fy * (gxAt(g, iX, iY + 1) - g00x),
          g00y + fy * (gyAt(g, iX, iY + 1) - g00y)))
      } else return Some((g00x, g00y))
    }
    None // unreachable in practice: second attempt always breaks
  }

  /** Exact inverse bilinear (GDALInverseBilinearInterpolation,
    * gdalgeoloc.cpp:960-1010). Quad corners in the reference's naming:
    * 0=(i,j), 1=(i,j+1), 2=(i+1,j), 3=(i+1,j+1). Returns (i+di, j+s). */
  private[graft] def inverseBilinear(x: Double, y: Double,
      x0: Double, y0: Double, x1: Double, y1: Double,
      x2: Double, y2: Double, x3: Double, y3: Double,
      i0: Double, j0: Double): (Double, Double) = {
    val a = (x0 - x) * (y0 - y2) - (y0 - y) * (x0 - x2)
    val b = (((x0 - x) * (y1 - y3) - (y0 - y) * (x1 - x3)) +
      ((x1 - x) * (y0 - y2) - (y1 - y) * (x0 - x2))) / 2
    val c = (x1 - x) * (y1 - y3) - (y1 - y) * (x1 - x3)
    val denom = a - 2 * b + c
    val mag = math.abs(a) + math.abs(b) + math.abs(c)
    val s =
      if (math.abs(denom) <= 1e-12 * mag) a / (a - c)
      else {
        val sq = math.sqrt(b * b - a * c)
        val s1 = ((a - b) + sq) / denom
        val s2 = ((a - b) - sq) / denom
        if (s1 < 0 || s1 > 1) s2 else s1
      }
    var i = i0
    val tDenX = (1 - s) * (x0 - x2) + s * (x1 - x3)
    if (math.abs(tDenX) > 1e-12 * mag) i += ((1 - s) * (x0 - x) + s * (x1 - x)) / tDenX
    else {
      val tDenY = (1 - s) * (y0 - y2) + s * (y1 - y3)
      if (math.abs(tDenY) > 1e-12 * mag) i += ((1 - s) * (y0 - y) + s * (y1 - y)) / tDenY
    }
    (i, j0 + s)
  }

  /** Even-odd point-in-ring over the 4-vertex forward quad (ring order
    * (0,0),(1,0),(1,1),(0,1) as the reference builds it), with an exact
    * on-boundary acceptance (cross = 0 within the segment's bbox). */
  private[graft] def pointInQuad(px: Double, py: Double,
                                 xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    var i = 0; var j = 3
    while (i < 4) {
      val xi = xs(i); val yi = ys(i); val xj = xs(j); val yj = ys(j)
      // boundary: collinear and within segment bbox
      val cross = (xj - xi) * (py - yi) - (yj - yi) * (px - xi)
      if (cross == 0.0 &&
          px >= math.min(xi, xj) && px <= math.max(xi, xj) &&
          py >= math.min(yi, yj) && py <= math.max(yi, yj)) return true
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Integer-coordinate forward: direct node read in-bounds (the int
    * overload fast path, gdalgeoloc.cpp:528-551), falling back to the
    * interpolating/extending double path outside. */
  private[graft] def nodeXY(g: GeoLocGrid, i: Int, j: Int): Option[(Double, Double)] =
    if (i >= 0 && i < g.w && j >= 0 && j < g.h) {
      val vx = gxAt(g, i, j)
      if (isNd(g, vx)) None else Some((vx, gyAt(g, i, j)))
    } else pixelLineToXY(g, i.toDouble, j.toDouble)

  /** Forward quad for geoloc cell (pixel, line); None when any corner is
    * nodata / fails. Corner order matches [[inverseBilinear]]. */
  private def forwardQuad(g: GeoLocGrid, pixel: Int, line: Int)
      : Option[(Double, Double, Double, Double, Double, Double, Double, Double)] =
    for {
      (q0x, q0y) <- nodeXY(g, pixel, line)
      (q2x, q2y) <- nodeXY(g, pixel + 1, line)
      (q1x, q1y) <- nodeXY(g, pixel, line + 1)
      (q3x, q3y) <- nodeXY(g, pixel + 1, line + 1)
    } yield (q0x, q0y, q1x, q1y, q2x, q2y, q3x, q3y)

  /** Containing-quad test + exact inverse bilinear → raster pixel/line
    * value in OUTPUT convention, for a geo point near geoloc cell
    * candidates (pixel+sx, line+sy). */
  private def solveInCell(g: GeoLocGrid, geoX: Double, geoY: Double,
                          pixel: Int, line: Int): Option[(Double, Double)] =
    forwardQuad(g, pixel, line).flatMap {
      case (x0, y0, x1, y1, x2, y2, x3, y3) =>
        val xs = Array(x0, x2, x3, x1); val ys = Array(y0, y2, y3, y1)
        if (pointInQuad(geoX, geoY, xs, ys)) {
          val (pi, pj) = inverseBilinear(geoX, geoY, x0, y0, x1, y1,
            x2, y2, x3, y3, pixel.toDouble, line.toDouble)
          Some(((pi + conv(g)) * g.pixelStep + g.pixelOffset,
            (pj + conv(g)) * g.lineStep + g.lineOffset))
        } else None
    }

  // ----------------------------------------------------------------
  // Backmap generation (distributed sample sweep → bounded driver grid)
  // ----------------------------------------------------------------

  def buildBackMap(spark: SparkSession, g: GeoLocGrid): GeoLocBackMap = {
    import spark.implicits._
    // geo bounds over valid nodes (LoadGeolocFinish UpdateMinMax analog)
    var minX = Double.MaxValue; var maxX = Double.MinValue
    var minY = Double.MaxValue; var maxY = Double.MinValue
    var k = 0
    while (k < g.gx.length) {
      val vx = g.gx(k)
      if (!isNd(g, vx)) {
        val vy = g.gy(k)
        if (vx < minX) minX = vx; if (vx > maxX) maxX = vx
        if (vy < minY) minY = vy; if (vy > maxY) maxY = vy
      }
      k += 1
    }
    // sizing (GenerateBackMap, gdalgeoloc.cpp:1033-1081)
    val targetPixels = g.w.toDouble * g.h * g.oversample
    val ps = math.sqrt((maxX - minX) * (maxY - minY) / targetPixels)
    require(ps > 0.0, "GeoLoc: invalid pixel size for backmap")
    val bMinX = minX - ps / 2.0; val bMaxX = maxX + ps / 2.0
    val bMaxY = maxY + ps / 2.0; val bMinY = minY - ps / 2.0
    var bw = math.ceil((bMaxX - bMinX) / ps).toInt
    var bh = math.ceil((bMaxY - bMinY) / ps).toInt
    val psx = (bMaxX - bMinX) / bw
    val psy = (bMaxY - bMinY) / bh
    bw += 1; bh += 1 // right/bottom edge extension

    val step = 1.0 / g.oversample
    // sample lattice in index form: pos(k) = (k-1)*step while ≤ size+2*step
    def count(size: Int): Int =
      Iterator.from(0).takeWhile(k => (k - 1) * step <= size + 2 * step).size
    val nSx = count(g.w); val nSy = count(g.h)
    val bwL = bw; val bhL = bh
    val gB = spark.sparkContext.broadcast(g)

    val contribs = spark.range(nSx.toLong * nSy)
      .mapPartitions { it =>
        val grid = gB.value
        it.flatMap { s =>
          val kx = (s % nSx).toInt; val ky = (s / nSx).toInt
          val dfX = (kx - 1) * step; val dfY = (ky - 1) * step
          pixelLineToXY(grid, dfX, dfY) match {
            case None => Iterator.empty
            case Some((geoX, geoY)) =>
              val dBMX = (geoX - bMinX) / psx
              val dBMY = (bMaxY - geoY) / psy
              val iBMX = math.floor(dBMX).toInt
              val iBMY = math.floor(dBMY).toInt
              val exact: Option[GeoLocNodeContribution] =
                if (iBMX >= 0 && iBMX < bwL && iBMY >= 0 && iBMY < bhL) {
                  // node's own geo position; search the 4 candidate cells
                  val nodeGeoX = bMinX + iBMX * psx
                  val nodeGeoY = bMaxY - iBMY * psy
                  val nX = math.floor(dfX).toInt; val nY = math.floor(dfY).toInt
                  var found: Option[(Double, Double)] = None
                  var sx = -1
                  while (found.isEmpty && sx <= 0) {
                    var sy = -1
                    while (found.isEmpty && sy <= 0) {
                      found = solveInCell(grid, nodeGeoX, nodeGeoY, nX + sx, nY + sy)
                      sy += 1
                    }
                    sx += 1
                  }
                  found.map { case (px, py) =>
                    GeoLocNodeContribution(iBMY.toLong * bwL + iBMX, exact = true,
                      order = s, wx = px, wy = py, wt = 1.0)
                  }
                } else None
              exact match {
                case Some(e) => Iterator.single(e)
                case None =>
                  // scatter-average into the 4 surrounding nodes
                  if (iBMX < -1 || iBMY < -1 || iBMX > bwL || iBMY > bhL)
                    Iterator.empty
                  else {
                    val fx = dBMX - iBMX; val fy = dBMY - iBMY
                    val vx = (dfX + conv(grid)) * grid.pixelStep + grid.pixelOffset
                    val vy = (dfY + conv(grid)) * grid.lineStep + grid.lineOffset
                    Seq((iBMX, iBMY, (1 - fx) * (1 - fy)),
                      (iBMX + 1, iBMY, fx * (1 - fy)),
                      (iBMX + 1, iBMY + 1, fx * fy),
                      (iBMX, iBMY + 1, (1 - fx) * fy)).iterator
                      .filter { case (x2, y2, w2) =>
                        x2 >= 0 && x2 < bwL && y2 >= 0 && y2 < bhL && w2 > 0 }
                      .map { case (x2, y2, w2) =>
                        GeoLocNodeContribution(y2.toLong * bwL + x2, exact = false,
                          order = s, wx = w2 * vx, wy = w2 * vy, wt = w2) }
                  }
              }
          }
        }
      }

    val folded = contribs
      .groupByKey(_.node)
      .mapGroups { (node, it) =>
        var exBest: GeoLocNodeContribution = null
        var sx = 0.0; var sy2 = 0.0; var sw = 0.0
        it.foreach { c =>
          if (c.exact) {
            if (exBest == null || c.order < exBest.order) exBest = c
          } else { sx += c.wx; sy2 += c.wy; sw += c.wt }
        }
        if (exBest != null) (node, exBest.wx, exBest.wy, 2.0)
        else (node, sx / sw, sy2 / sw, sw)
      }
      .collect()

    val bmx = Array.fill(bw * bh)(Double.NaN)
    val bmy = Array.fill(bw * bh)(Double.NaN)
    folded.foreach { case (node, vx, vy, w) =>
      val iBMX = (node % bw).toInt; val iBMY = (node / bw).toInt
      val accept =
        if (w == 2.0) true
        else {
          // fold guard (UpdateBackmap acceptance, order-independent form):
          // the averaged value must imply a geoloc position within
          // 2 backmap pixels of the node's own geo position
          val glP = (vx - g.pixelOffset) / g.pixelStep - conv(g)
          val glL = (vy - g.lineOffset) / g.lineStep - conv(g)
          val iA = math.min(math.max(0, glP.toInt), g.w - 1)
          val jA = math.min(math.max(0, glL.toInt), g.h - 1)
          val glx = gxAt(g, iA, jA); val gly = gyAt(g, iA, jA)
          !isNd(g, glx) &&
            math.abs(glx - (bMinX + iBMX * psx)) <= 2 * psx &&
            math.abs(gly - (bMaxY - iBMY * psy)) <= 2 * psy
        }
      if (accept) { bmx(node.toInt) = vx; bmy(node.toInt) = vy }
    }

    // hole fill 1: IDW within search distance 3 (GDALFillNodata analog,
    // same kernel as Fill.fillNodata; backmap is bounded driver state)
    def idwFill(a: Array[Double]): Array[Double] = {
      val out = a.clone()
      var y = 0
      while (y < bh) {
        var x = 0
        while (x < bw) {
          if (a(y * bw + x).isNaN) {
            var num = 0.0; var den = 0.0
            var dy = -3
            while (dy <= 3) {
              var dx = -3
              while (dx <= 3) {
                val d2 = dx * dx + dy * dy
                if (d2 > 0 && d2 <= 9) {
                  val xx = x + dx; val yy = y + dy
                  if (xx >= 0 && xx < bw && yy >= 0 && yy < bh) {
                    val v = a(yy * bw + xx)
                    if (!v.isNaN) { num += v / d2; den += 1.0 / d2 }
                  }
                }
                dx += 1
              }
              dy += 1
            }
            if (den > 0) out(y * bw + x) = num / den
          }
          x += 1
        }
        y += 1
      }
      out
    }
    val fx2 = idwFill(bmx); val fy2 = idwFill(bmy)
    // hole fill 2: per-line linear bridge when the straddling values are
    // within 2 pixels on both axes (gdalgeoloc.cpp:1515-1600)
    var y2 = 0
    while (y2 < bh) {
      var lastValid = -1
      var x2 = 0
      while (x2 < bw) {
        val v = fx2(y2 * bw + x2)
        if (!v.isNaN) {
          if (lastValid != -1 && x2 > lastValid + 1 &&
              math.abs(v - fx2(y2 * bw + lastValid)) <= 2 &&
              math.abs(fy2(y2 * bw + x2) - fy2(y2 * bw + lastValid)) <= 2) {
            var xi = lastValid + 1
            while (xi < x2) {
              val alpha = (xi - lastValid).toDouble / (x2 - lastValid)
              fx2(y2 * bw + xi) = (1 - alpha) * fx2(y2 * bw + lastValid) + alpha * v
              fy2(y2 * bw + xi) = (1 - alpha) * fy2(y2 * bw + lastValid) + alpha * fy2(y2 * bw + x2)
              xi += 1
            }
          }
          lastValid = x2
        }
        x2 += 1
      }
      y2 += 1
    }
    GeoLocBackMap(bw, bh, bMinX, bMaxY, psx, psy, fx2, fy2)
  }

  /** Scalar inverse: geo → raster pixel/line via backmap bilinear + the
    * max-accuracy ring-search refinement (gdalgeoloc.cpp:651-949). */
  private[graft] def inverseLookup(g: GeoLocGrid, bm: GeoLocBackMap,
                                   geoX: Double, geoY: Double,
                                   maxAccuracy: Boolean = true): Option[(Double, Double)] = {
    val dBMX = (geoX - bm.minX) / bm.psx
    val dBMY = (bm.maxY - geoY) / bm.psy
    if (!(dBMX >= 0 && dBMY >= 0 && dBMX + 1 < bm.w && dBMY + 1 < bm.h)) return None
    val iBMX = dBMX.toInt; val iBMY = dBMY.toInt
    @inline def bx(x: Int, y: Int) = bm.bmx(y * bm.w + x)
    @inline def by(x: Int, y: Int) = bm.bmy(y * bm.w + x)
    val v00x = bx(iBMX, iBMY); val v00y = by(iBMX, iBMY)
    if (v00x.isNaN) return None
    val v10x = bx(iBMX + 1, iBMY); val v10y = by(iBMX + 1, iBMY)
    val v01x = bx(iBMX, iBMY + 1); val v01y = by(iBMX, iBMY + 1)
    val v11x = bx(iBMX + 1, iBMY + 1); val v11y = by(iBMX + 1, iBMY + 1)
    val fx = dBMX - iBMX; val fy = dBMY - iBMY
    var px =
      if (!v10x.isNaN && !v01x.isNaN && !v11x.isNaN)
        (1 - fy) * (v00x + fx * (v10x - v00x)) + fy * (v01x + fx * (v11x - v01x))
      else if (!v10x.isNaN) v00x + fx * (v10x - v00x)
      else if (!v01x.isNaN) v00x + fy * (v01x - v00x)
      else v00x
    var py =
      if (!v10x.isNaN && !v01x.isNaN && !v11x.isNaN)
        (1 - fy) * (v00y + fx * (v10y - v00y)) + fy * (v01y + fx * (v11y - v01y))
      else if (!v10x.isNaN) v00y + fx * (v10y - v00y)
      else if (!v01x.isNaN) v00y + fy * (v01y - v00y)
      else v00y
    if (!maxAccuracy) return Some((px, py))
    // max-accuracy: ring search (radius 3) for the containing forward cell
    val glP = (px - g.pixelOffset) / g.pixelStep - conv(g)
    val glL = (py - g.lineOffset) / g.lineStep - conv(g)
    val nP = math.floor(glP).toInt; val nL = math.floor(glL).toInt
    var r = 0
    while (r <= 3) {
      var iter = 0
      val iters = if (r == 0) 1 else 8 * r
      while (iter < iters) {
        val sx = if (r == 0) 0
          else if (iter < 2 * r) -r + iter
          else if (iter < 4 * r) r
          else if (iter < 6 * r) r - (iter - 4 * r)
          else -r
        val sy = if (r == 0) 0
          else if (iter < 2 * r) r
          else if (iter < 4 * r) r - (iter - 2 * r)
          else if (iter < 6 * r) -r
          else -r + (iter - 6 * r)
        if (nP < g.w - sx && nL < g.h - sy) {
          val iX = nP + sx; val iY = nL + sy
          if (iX >= -1 && iY >= -1) {
            solveInCell(g, geoX, geoY, iX, iY) match {
              case Some((rx, ry)) => return Some((rx, ry))
              case None =>
            }
          }
        }
        iter += 1
      }
      r += 1
    }
    Some((px, py)) // approximate fallback (reference keeps the backmap value)
  }

  // ----------------------------------------------------------------
  // Spark operators (map-only over the big table)
  // ----------------------------------------------------------------

  /** Forward transform: adds `geo_x`, `geo_y` (null when the geoloc value
    * is nodata). Map-only; the grid ships once per executor. */
  def forward(df: DataFrame, g: GeoLocGrid,
              xCol: org.apache.spark.sql.Column,
              yCol: org.apache.spark.sql.Column): DataFrame = {
    val gB = df.sparkSession.sparkContext.broadcast(g)
    val f = udf((x: Double, y: Double) => {
      val grid = gB.value
      val glP = (x - grid.pixelOffset) / grid.pixelStep - conv(grid)
      val glL = (y - grid.lineOffset) / grid.lineStep - conv(grid)
      pixelLineToXY(grid, glP, glL)
    })
    df.withColumn("_g", f(xCol, yCol))
      .withColumn("geo_x", col("_g._1"))
      .withColumn("geo_y", col("_g._2"))
      .drop("_g")
  }

  /** Inverse transform: adds `pixel`, `line` (null when outside the
    * backmap or on an unfilled hole). Map-only; grid + backmap broadcast. */
  def inverse(df: DataFrame, g: GeoLocGrid, bm: GeoLocBackMap,
              gxCol: org.apache.spark.sql.Column,
              gyCol: org.apache.spark.sql.Column,
              maxAccuracy: Boolean = true): DataFrame = {
    val gB = df.sparkSession.sparkContext.broadcast(g)
    val bmB = df.sparkSession.sparkContext.broadcast(bm)
    val f = udf((x: Double, y: Double) =>
      inverseLookup(gB.value, bmB.value, x, y, maxAccuracy))
    df.withColumn("_pl", f(gxCol, gyCol))
      .withColumn("pixel", col("_pl._1"))
      .withColumn("line", col("_pl._2"))
      .drop("_pl")
  }
}
