package graft.engine

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._

/** GDALApplyVerticalShiftGrid (reference: alg/gdalapplyverticalshiftgrid.cpp)
  * — add (or inverse-subtract) a vertical datum shift surface to a DEM.
  *
  * Reference semantics mirrored:
  *  - the shift grid is resampled to the source geometry (the reference
  *    builds a bilinear warped VRT, gdalapplyverticalshiftgrid.cpp:419-456;
  *    here each DEM pixel center samples the grid with the
  *    GDALInterpolateAtPoint bilinear — same kernel, same border drag);
  *  - per pixel (IReadBlock, lines 230-263): source nodata passes through
  *    unchanged; otherwise out = (src*srcUnitToMeter + grid)/dstUnitToMeter,
  *    or (src*srcUnitToMeter - grid)/dstUnitToMeter when inverse;
  *  - a non-finite grid sample aborts the job ("Missing vertical grid value",
  *    lines 243-249) — we THROW, never silently propagate.
  *  - deviation (improvement): arithmetic in double, not the reference's
  *    float32 working buffers — consistent with every raster op here.
  *
  * Spark shape for 100 TB: the grid (the small side — geoid grids are MBs)
  * is exploded per covering DEM-tile key, aggregated into per-key windows,
  * and BROADCAST-joined to the DEM: the DEM scan is map-only, never shuffled
  * or replicated; only grid windows travel. */
object VerticalShift {

  def applyShift(dem: Dataset[Tile], grid: Dataset[Tile],
                 demW: Int, demH: Int, gridW: Int, gridH: Int,
                 inverse: Boolean = false, srcUnitToMeter: Double = 1.0,
                 dstUnitToMeter: Double = 1.0, nodata: Option[Double] = None,
                 demTileSize: Int = Raster.TileSize,
                 gridTileSize: Int = Raster.TileSize): Dataset[Tile] = {
    val spark = dem.sparkSession
    import spark.implicits._
    val rx = gridW.toDouble / demW
    val ry = gridH.toDouble / demH
    val dts = demTileSize; val gts = gridTileSize
    val demTX = (demW + dts - 1) / dts; val demTY = (demH + dts - 1) / dts
    val nd = nodata; val inv = inverse
    val sU = srcUnitToMeter; val dU = dstUnitToMeter
    val (gw, gh) = (gridW, gridH)

    // grid → (dem tile key, grid tile) cover pairs; the ±1.5 margins bound
    // the bilinear window of any dem pixel center mapping near the edge
    val gcov = grid.flatMap { gt =>
      def rangeOf(g0: Int, r: Double, nT: Int): (Int, Int) = {
        val lo = math.max(0.0, (g0 * gts - 1.5) / r - 0.5)
        val hi = ((g0 + 1.0) * gts + 1.5) / r
        (math.max(0, math.floor(lo / dts).toInt),
         math.min(nT - 1, math.floor(hi / dts).toInt))
      }
      val (xl, xh) = rangeOf(gt.x, rx, demTX)
      val (yl, yh) = rangeOf(gt.y, ry, demTY)
      for (tx <- xl to xh; ty <- yl to yh)
        yield (tx, ty, gt.x, gt.y, gt.w, gt.pixels)
    }.toDF("ctx", "cty", "gtx", "gty", "gtw", "gpix")
      .groupBy("ctx", "cty")
      .agg(collect_list(struct(col("gtx"), col("gty"), col("gtw"),
        col("gpix"))).as("gwin"))

    val demDf = dem.toDF()
    val joined = demDf.join(broadcast(gcov),
      demDf("x") === gcov("ctx") && demDf("y") === gcov("cty"), "left_outer")

    val shifted = udf((tx: Int, ty: Int, w: Int, h: Int, pixels: Seq[Double],
                       gwin: Seq[Row]) => {
      val tiles = if (gwin == null) Map.empty[(Int, Int), (Int, Array[Double])]
        else gwin.map { r => ((r.getInt(0), r.getInt(1)),
          (r.getInt(2), r.getSeq[Double](3).toArray)) }.toMap
      def readGrid(px: Int, py: Int): Option[Double] = {
        if (px < 0 || py < 0 || px >= gw || py >= gh) None
        else tiles.get((px / gts, py / gts)).flatMap { case (tw, gp) =>
          val cx = px - (px / gts) * gts; val cy = py - (py / gts) * gts
          if (cx < tw && cy * tw + cx < gp.length) Some(gp(cy * tw + cx)) else None
        }
      }
      val out = new Array[Double](pixels.length)
      var i = 0
      while (i < out.length) {
        val src = pixels(i)
        if (nd.contains(src)) out(i) = src // nodata pass-through
        else {
          val gx = tx * w + (i % w); val gy = ty * w + (i / w)
          val gxp = (gx + 0.5) * rx; val gyp = (gy + 0.5) * ry
          val g = InterpAtPoint.interpolateScalar(gxp, gyp, gw, gh,
            "bilinear", None, readGrid) match {
            case Some(v) if java.lang.Double.isFinite(v) => v
            case _ => throw new IllegalStateException(
              s"Missing vertical grid value at source ($gx,$gy)")
          }
          out(i) = if (inv) (src * sU - g) / dU else (src * sU + g) / dU
        }
        i += 1
      }
      out
    })

    joined.select(demDf("z"), demDf("x"), demDf("y"), demDf("band"),
        demDf("w"), demDf("h"),
        shifted(demDf("x"), demDf("y"), demDf("w"), demDf("h"),
          demDf("pixels"), col("gwin")).as("pixels"))
      .as[Tile]
  }
}
