package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** GDALInterpolateAtPoint (reference: alg/gdal_interpolateatpoint.cpp) —
  * raster value at fractional pixel coordinates with the four reference
  * resampling algorithms.
  *
  * Reference semantics mirrored exactly:
  *  - nearest tolerates coordinates within 1e-5 past the bottom/right edge
  *    by stepping 0.25 inward (gdal_interpolateatpoint.cpp:172-181);
  *  - out of [0, size] in either axis → no value (line 187-191);
  *  - algorithm downgrade on tiny rasters: cubic→bilinear under 4px,
  *    bilinear→nearest under 2px (lines 194-203);
  *  - bilinear/cubic sample at PIXEL CENTERS: df = loc - 0.5, d = floor(df),
  *    delta = df - d; the cubic window starts at d-1 (lines 343-393);
  *  - windows straddling the border are read at the clamped base and then
  *    "dragged": edge rows/cols replicate inward, one shift per out-of-border
  *    step (dragReadDataInBorderSimple, lines 231-265);
  *  - nodata: nearest and bilinear fail on any nodata sample; the 4x4
  *    kernels SKIP nodata samples and renormalize by the remaining weight,
  *    failing only when no weight remains (lines 273-341);
  *  - CubicKernel is Catmull-Rom (B,C)=(0,0.5); CubicSplineKernel is the
  *    cubic B-spline (alg/gdalresamplingkernels.h:23-60).
  *
  * Spark shape for 100 TB: a query's window pixels are enumerated QUERY-SIDE
  * (≤16 global coordinates, known before touching the DEM), grouped into
  * per-(query, tile) probe lists, equi-joined with the tile table on the
  * tile key, and re-assembled per query — the DEM is never replicated per
  * probe pixel and never shuffled by value; same gather shape as [[Los]]. */
object InterpAtPoint {

  /** Catmull-Rom (gdalresamplingkernels.h:23). */
  private[graft] def cubicKernel(x: Double): Double = {
    val ax = math.abs(x)
    if (ax <= 1.0) { val x2 = x * x; x2 * (1.5 * ax - 2.5) + 1 }
    else if (ax <= 2.0) { val x2 = x * x; x2 * (-0.5 * ax + 2.5) - 4 * ax + 2 }
    else 0.0
  }

  /** Cubic B-spline (gdalresamplingkernels.h:45). */
  private[graft] def cubicSplineKernel(v: Double): Double = {
    if (v > 2.0) 0.0
    else {
      val xm1 = v - 1.0; val xp1 = v + 1.0; val xp2 = v + 2.0
      val a = if (xp2 <= 0.0) 0.0 else xp2 * xp2 * xp2
      val b = if (xp1 <= 0.0) 0.0 else xp1 * xp1 * xp1
      val c = if (v <= 0.0) 0.0 else v * v * v
      val d = if (xm1 <= 0.0) 0.0 else xm1 * xm1 * xm1
      0.16666666666666666667 * (a - 4.0 * b + 6.0 * c - 4.0 * d)
    }
  }

  /** Window geometry for a query: (effective alg, clamped window base,
    * kernel size, dOutOfBorder, delta). None = out of bounds. */
  private[graft] final case class Plan(alg: String, baseX: Int, baseY: Int,
                                       k: Int, obX: Int, obY: Int,
                                       dx: Double, dy: Double)

  private def outOfBorder(d: Int, size: Int, k: Int): Int =
    if (d < 0) d else if (d + k >= size) d + k - size else 0

  private[graft] def windowPlan(xIn0: Double, yIn0: Double, rw: Int, rh: Int,
                                alg0: String): Option[Plan] = {
    var xIn = xIn0; var yIn = yIn0
    var alg = alg0
    if (alg == "nearest") {
      if (xIn >= rw && xIn <= rw + 1e-5) xIn -= 0.25
      if (yIn >= rh && yIn <= rh + 1e-5) yIn -= 0.25
    }
    if (xIn < 0 || xIn > rw || yIn < 0 || yIn > rh) return None
    if ((rw < 4 || rh < 4) && (alg == "cubicspline" || alg == "cubic"))
      alg = "bilinear"
    if ((rw < 2 || rh < 2) && alg == "bilinear") alg = "nearest"
    alg match {
      case "cubic" | "cubicspline" =>
        val dfx = xIn - 0.5; val dfy = yIn - 0.5
        val dX = math.floor(dfx).toInt; val dY = math.floor(dfy).toInt
        val nX = dX - 1; val nY = dY - 1
        val obx = outOfBorder(nX, rw, 4); val oby = outOfBorder(nY, rh, 4)
        Some(Plan(alg, nX - obx, nY - oby, 4, obx, oby, dfx - dX, dfy - dY))
      case "bilinear" =>
        val dfx = xIn - 0.5; val dfy = yIn - 0.5
        val dX = math.floor(dfx).toInt; val dY = math.floor(dfy).toInt
        val obx = outOfBorder(dX, rw, 2); val oby = outOfBorder(dY, rh, 2)
        Some(Plan(alg, dX - obx, dY - oby, 2, obx, oby, dfx - dX, dfy - dY))
      case _ =>
        Some(Plan("nearest", xIn.toInt, yIn.toInt, 1, 0, 0, 0.0, 0.0))
    }
  }

  /** dragReadDataInBorderSimple (gdal_interpolateatpoint.cpp:231-265). */
  private def drag(w: Array[Double], ob0: Int, k: Int, isX: Boolean): Unit = {
    var ob = ob0
    while (ob < 0) {
      var j = 0
      while (j < k) {
        var ii = 0
        while (ii < k - 1) {
          val i = k - ii - 2
          val (rs, rd, cs, cd) =
            if (isX) (j, j, i, i + 1) else (i, i + 1, j, j)
          w(k * rd + cd) = w(k * rs + cs)
          ii += 1
        }
        j += 1
      }
      ob += 1
    }
    while (ob > 0) {
      var j = 0
      while (j < k) {
        var i = 0
        while (i < k - 1) {
          val (rs, rd, cs, cd) =
            if (isX) (j, j, i + 1, i) else (i + 1, i, j, j)
          w(k * rd + cd) = w(k * rs + cs)
          i += 1
        }
        j += 1
      }
      ob -= 1
    }
  }

  /** Kernel application over the (dragged) window. None = reference FALSE. */
  private[graft] def applyWindow(p: Plan, w0: Array[Double],
                                 nodata: Option[Double]): Option[Double] = {
    val w = w0.clone()
    drag(w, p.obX, p.k, isX = true)
    drag(w, p.obY, p.k, isX = false)
    p.alg match {
      case "nearest" =>
        if (nodata.contains(w(0))) None else Some(w(0))
      case "bilinear" =>
        if (nodata.exists(nd => w.exists(_ == nd))) None
        else {
          val d1x = 1.0 - p.dx; val d1y = 1.0 - p.dy
          val xz1 = w(0) * d1x + w(1) * p.dx
          val xz2 = w(2) * d1x + w(3) * p.dx
          Some(xz1 * d1y + xz2 * p.dy)
        }
      case _ =>
        var sumH = 0.0; var sumW = 0.0
        var ki = 0
        while (ki < 4) {
          var kj = 0
          while (kj < 4) {
            val fx = (kj - 1).toDouble - p.dx
            val fy = (ki - 1).toDouble - p.dy
            val wt =
              if (p.alg == "cubicspline") cubicSplineKernel(fx) * cubicSplineKernel(fy)
              else cubicKernel(fx) * cubicKernel(fy)
            val v = w(kj + ki * 4)
            if (!nodata.contains(v)) { sumH += v * wt; sumW += wt }
            kj += 1
          }
          ki += 1
        }
        if (sumW == 0.0) None else Some(sumH / sumW)
    }
  }

  /** Reference-faithful scalar core against a local pixel reader (used by
    * specs; the distributed path reproduces it exactly). */
  private[graft] def interpolateScalar(x: Double, y: Double, rw: Int, rh: Int,
                                       alg: String, nodata: Option[Double],
                                       read: (Int, Int) => Option[Double]): Option[Double] =
    windowPlan(x, y, rw, rh, alg).flatMap { p =>
      val w = new Array[Double](p.k * p.k)
      var ok = true
      var i = 0
      while (i < p.k && ok) {
        var j = 0
        while (j < p.k && ok) {
          read(p.baseX + j, p.baseY + i) match {
            case Some(v) => w(i * p.k + j) = v
            case None    => ok = false
          }
          j += 1
        }
        i += 1
      }
      if (!ok) None else applyWindow(p, w, nodata)
    }

  /** Many-query interpolation against a tiled DEM of rw×rh pixels.
    * Returns (qid, value) with value NULL where the reference returns FALSE. */
  def interpolate(tiles: Dataset[Tile], queries: DataFrame, alg: String,
                  rw: Int, rh: Int, nodata: Option[Double] = None,
                  tileSize: Int = Raster.TileSize): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val nd = nodata
    val tsz = tileSize

    // query-side window expansion: ≤16 probe pixels per query
    val probes = queries.select(col("qid").cast("long"),
        col("x").cast("double"), col("y").cast("double"))
      .as[(Long, Double, Double)]
      .flatMap { case (qid, x, y) =>
        windowPlan(x, y, rw, rh, alg) match {
          case None => Iterator((qid, -1, -1, -1)) // out of bounds marker
          case Some(p) =>
            for (i <- 0 until p.k; j <- 0 until p.k)
              yield (qid, i * p.k + j, p.baseX + j, p.baseY + i)
        }
      }.toDF("qid", "slot", "gx", "gy")

    val seggrp = probes
      .withColumn("tx", floor(col("gx") / tsz).cast("int"))
      .withColumn("ty", floor(col("gy") / tsz).cast("int"))
      .groupBy("qid", "tx", "ty")
      .agg(collect_list(struct(col("slot"), col("gx"), col("gy"))).as("ps"))

    val demDF = tiles.toDF().select(col("x").as("tx"), col("y").as("ty"),
      col("w").as("tw"), col("pixels"))

    val readSeg = udf((tx: Int, ty: Int, tw: Int, pixels: Seq[Double],
                       ps: Seq[org.apache.spark.sql.Row]) =>
      ps.map { r =>
        val slot = r.getInt(0); val gx = r.getInt(1); val gy = r.getInt(2)
        if (slot < 0 || pixels == null) (slot, Double.NaN, false)
        else {
          val cx = gx - tx * tw; val cy = gy - ty * tw
          if (cx < 0 || cy < 0 || cx >= tw || cy >= tw) (slot, Double.NaN, false)
          else (slot, pixels(cy * tw + cx), true)
        }
      })

    val vals = seggrp.join(demDF, Seq("tx", "ty"), "left_outer")
      .select(col("qid"), explode(readSeg(col("tx"), col("ty"),
        coalesce(col("tw"), lit(tsz)), col("pixels"), col("ps"))).as("v"))
      .select(col("qid"), col("v._1").as("slot"), col("v._2").as("pv"),
        col("v._3").as("ok"))

    val assembled = vals.groupBy("qid")
      .agg(collect_list(struct(col("slot"), col("pv"), col("ok"))).as("vs"))

    // join back the query coords for the final local application
    val withQ = assembled.join(
      queries.select(col("qid").cast("long"), col("x").cast("double"),
        col("y").cast("double")), Seq("qid"))
    val applyU = udf((x: Double, y: Double, vs: Seq[org.apache.spark.sql.Row]) => {
      windowPlan(x, y, rw, rh, alg) match {
        case None => null.asInstanceOf[java.lang.Double]
        case Some(p) =>
          val w = new Array[Double](p.k * p.k)
          var ok = true
          val seen = new Array[Boolean](p.k * p.k)
          vs.foreach { r =>
            val slot = r.getInt(0)
            if (slot >= 0) {
              if (!r.getBoolean(2)) ok = false
              else { w(slot) = r.getDouble(1); seen(slot) = true }
            }
          }
          if (!ok || !seen.forall(identity)) null
          else applyWindow(p, w, nd) match {
            case Some(v) => java.lang.Double.valueOf(v)
            case None    => null
          }
      }
    })
    withQ.select(col("qid"), applyU(col("x"), col("y"), col("vs")).as("value"))
  }
}
