package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RPC00B rational-polynomial-coefficient georeferencing transformer
  * (reference: alg/gdal_rpc.cpp) — the standard satellite-imagery camera
  * model: 20-term cubic polynomials in normalized (long, lat, height)
  * forming the rational maps
  *
  *   sample = SAMP_NUM(P,L,H) / SAMP_DEN(P,L,H)
  *   line   = LINE_NUM(P,L,H) / LINE_DEN(P,L,H)
  *
  * Reference semantics mirrored exactly:
  *  - term basis and ORDER per RPCComputeTerms (gdal_rpc.cpp:189-218):
  *    1, L, P, H, LP, LH, PH, L², P², H², LPH, L³, LP², LH², L²P, P³,
  *    PH², L²H, P²H, H³ (L=normalized long, P=normalized lat);
  *  - dot products accumulate in TWO strided sums (even terms, odd terms)
  *    added at the end (RPCEvaluate, gdal_rpc.cpp:337-350) — the exact
  *    IEEE association order, so a relational twin can reproduce bits;
  *  - dateline guard: diffLong wrapped into (-270, 270] before
  *    normalization (gdal_rpc.cpp:369-377);
  *  - RPC space is center-of-upper-left-pixel = (0,0); outputs convert to
  *    GDAL's top-left-corner convention via +0.5 (gdal_rpc.cpp:464-466);
  *  - inverse = iterative: initial guess from an affine lat/long→pixel
  *    geotransform built by finite differences (delta 1e-4 deg) at a
  *    reference point — bounds midpoint when MIN/MAX_LONG describe a real
  *    footprint, else (LONG_OFF, LAT_OFF), with the "daft result" fallback
  *    when the bounds point lands outside [0, 100000] (gdal_rpc.cpp:
  *    1000-1056) — then Newton-style updates through the inverted affine
  *    until max(|Δpixel|, |Δline|) < pixErrThreshold, at most maxIterations
  *    (default 10 without a DEM, gdal_rpc.cpp:1443-1446);
  *  - no-DEM transforms add the user height directly (RPC heights are
  *    relative to the ellipsoid); DEM composition is [[VerticalShift]]'s
  *    job and out of scope here, matching the engine's layered design.
  *
  * Spark shape for 100 TB: both directions are MAP-ONLY over the point
  * table. The forward map is pure Column arithmetic — 80 literal
  * coefficients folded into one whole-stage-codegen'd projection; no
  * shuffle, no broadcast, no UDF. The inverse's data-dependent iteration
  * count makes it a scalar UDF over the same literals (still map-only,
  * ~5 iterations of 80 multiply-adds per row).
  */
object Rpc {

  /** RPC00B model. Coefficient arrays are length 20 in RPCComputeTerms
    * order. Bounds default to the "no footprint" sentinel (-180/180) the
    * reference uses to select the LONG_OFF/LAT_OFF reference point. */
  final case class Model(
      lineOff: Double, sampOff: Double,
      latOff: Double, longOff: Double, heightOff: Double,
      lineScale: Double, sampScale: Double,
      latScale: Double, longScale: Double, heightScale: Double,
      lineNum: Array[Double], lineDen: Array[Double],
      sampNum: Array[Double], sampDen: Array[Double],
      minLong: Double = -180.0, minLat: Double = -90.0,
      maxLong: Double = 180.0, maxLat: Double = 90.0) {
    require(lineNum.length == 20 && lineDen.length == 20 &&
      sampNum.length == 20 && sampDen.length == 20,
      "RPC coefficient arrays must have 20 terms")
  }

  /** The 20 polynomial terms (gdal_rpc.cpp:189-218). */
  private[graft] def terms(l: Double, p: Double, h: Double): Array[Double] = {
    val t = new Array[Double](20)
    t(0) = 1.0; t(1) = l; t(2) = p; t(3) = h
    t(4) = l * p; t(5) = l * h; t(6) = p * h
    t(7) = l * l; t(8) = p * p; t(9) = h * h
    t(10) = l * p * h; t(11) = l * l * l; t(12) = l * p * p
    t(13) = l * h * h; t(14) = l * l * p; t(15) = p * p * p
    t(16) = p * h * h; t(17) = l * l * h; t(18) = p * p * h
    t(19) = h * h * h
    t
  }

  /** Even/odd strided dot product (RPCEvaluate, gdal_rpc.cpp:337-350). */
  private[graft] def evaluate(t: Array[Double], c: Array[Double]): Double = {
    var s1 = 0.0; var s2 = 0.0; var i = 0
    while (i < 20) { s1 += t(i) * c(i); s2 += t(i + 1) * c(i + 1); i += 2 }
    s1 + s2
  }

  /** Scalar forward map: (long, lat, height) → (pixel, line) in GDAL's
    * top-left-corner convention (RPCTransformPoint, gdal_rpc.cpp:358-467). */
  private[graft] def forwardPoint(m: Model, lon: Double, lat: Double,
                                  height: Double): (Double, Double) = {
    var diffLong = lon - m.longOff
    if (diffLong < -270) diffLong += 360 else if (diffLong > 270) diffLong -= 360
    val l = diffLong / m.longScale
    val p = (lat - m.latOff) / m.latScale
    val h = (height - m.heightOff) / m.heightScale
    val t = terms(l, p, h)
    val x = evaluate(t, m.sampNum) / evaluate(t, m.sampDen)
    val y = evaluate(t, m.lineNum) / evaluate(t, m.lineDen)
    (x * m.sampScale + m.sampOff + 0.5, y * m.lineScale + m.lineOff + 0.5)
  }

  /** Affine lat/long→(pixel,line) init for the inverse, then inverted
    * (GDALCreateRPCTransformerV2, gdal_rpc.cpp:1000-1090). Returns the
    * INVERTED geotransform (pixel,line)→(long,lat). */
  private[graft] def plToLatLongGT(m: Model): Array[Double] = {
    // reference point: bounds midpoint when a real footprint is declared
    var refLong = 0.0; var refLat = 0.0
    var refPixel = -1.0; var refLine = -1.0
    if (m.minLong != -180.0 || m.maxLong != 180.0) {
      refLong = (m.minLong + m.maxLong) * 0.5
      refLat = (m.minLat + m.maxLat) * 0.5
      val (px, ln) = forwardPoint(m, refLong, refLat, 0.0)
      refPixel = px; refLine = ln
    }
    // "results seem daft" fallback (gdal_rpc.cpp:1030-1034)
    if (refPixel < 0.0 || refLine < 0.0 || refPixel > 100000 || refLine > 100000) {
      refLong = m.longOff; refLat = m.latOff
      val (px, ln) = forwardPoint(m, refLong, refLat, 0.0)
      refPixel = px; refLine = ln
    }
    // finite-difference direction vectors at delta = 1e-4 deg
    val d = 0.0001
    val (pxE, lnE) = forwardPoint(m, refLong + d, refLat, 0.0)
    val (pxN, lnN) = forwardPoint(m, refLong, refLat + d, 0.0)
    val gt = new Array[Double](6) // lat/long → pixel/line
    gt(1) = (pxE - refPixel) / d; gt(4) = (lnE - refLine) / d
    gt(2) = (pxN - refPixel) / d; gt(5) = (lnN - refLine) / d
    gt(0) = refPixel - gt(1) * refLong - gt(2) * refLat
    gt(3) = refLine - gt(4) * refLong - gt(5) * refLat
    // invert (GDALInvGeoTransform)
    val det = gt(1) * gt(5) - gt(2) * gt(4)
    require(math.abs(det) > 1e-15, "RPC: cannot invert affine init geotransform")
    val inv = new Array[Double](6)
    val idet = 1.0 / det
    inv(1) = gt(5) * idet; inv(2) = -gt(2) * idet
    inv(4) = -gt(4) * idet; inv(5) = gt(1) * idet
    inv(0) = -gt(0) * inv(1) - gt(3) * inv(2)
    inv(3) = -gt(0) * inv(4) - gt(3) * inv(5)
    inv
  }

  /** Scalar inverse: (pixel, line, userHeight) → (long, lat), or None when
    * the iteration does not reach pixErrThreshold within maxIterations
    * (RPCInverseTransformPoint, gdal_rpc.cpp:1130-1378, no-DEM paths; the
    * oscillation damper and boost factor are DEM-only branches there and
    * never fire without one). */
  private[graft] def inversePoint(m: Model, inv: Array[Double],
                                  pixel: Double, line: Double, height: Double,
                                  pixErrThreshold: Double = 0.1,
                                  maxIterations: Int = 10): Option[(Double, Double)] = {
    var x = inv(0) + inv(1) * pixel + inv(2) * line
    var y = inv(3) + inv(4) * pixel + inv(5) * line
    var i = 0
    while (i < maxIterations) {
      val (bp, bl) = forwardPoint(m, x, y, height)
      val dx = bp - pixel; val dy = bl - line
      if (math.max(math.abs(dx), math.abs(dy)) < pixErrThreshold)
        return Some((x, y))
      x = x - (dx * inv(1)) - (dy * inv(2))
      y = y - (dx * inv(4)) - (dy * inv(5))
      i += 1
    }
    None
  }

  // ----------------------------------------------------------------
  // Spark operators
  // ----------------------------------------------------------------

  /** Column-expression even/odd dot product with literal coefficients,
    * mirroring [[evaluate]]'s association order term by term. Zero
    * coefficients still participate (0.0 * x preserves NaN semantics the
    * same way in both engines). */
  private def evalCol(ts: IndexedSeq[Column], c: Array[Double]): Column = {
    val s1 = (2 until 20 by 2).foldLeft(ts(0) * lit(c(0))) {
      (acc, i) => acc + ts(i) * lit(c(i)) }
    val s2 = (3 until 20 by 2).foldLeft(ts(1) * lit(c(1))) {
      (acc, i) => acc + ts(i) * lit(c(i)) }
    s1 + s2
  }

  /** Forward RPC over a point table — map-only, whole-stage-codegen'd
    * Column arithmetic (no UDF). Adds `pixel` and `line`. */
  def forward(df: DataFrame, m: Model, lonCol: Column, latCol: Column,
              heightCol: Column): DataFrame = {
    val diff0 = lonCol - lit(m.longOff)
    val diff = when(diff0 < -270, diff0 + 360)
      .when(diff0 > 270, diff0 - 360).otherwise(diff0)
    val l = diff / lit(m.longScale)
    val p = (latCol - lit(m.latOff)) / lit(m.latScale)
    val h = (heightCol - lit(m.heightOff)) / lit(m.heightScale)
    val ts = IndexedSeq(
      lit(1.0), l, p, h, l * p, l * h, p * h, l * l, p * p, h * h,
      l * p * h, l * l * l, l * p * p, l * h * h, l * l * p, p * p * p,
      p * h * h, l * l * h, p * p * h, h * h * h)
    df.withColumn("pixel",
        evalCol(ts, m.sampNum) / evalCol(ts, m.sampDen) * lit(m.sampScale) +
          lit(m.sampOff) + lit(0.5))
      .withColumn("line",
        evalCol(ts, m.lineNum) / evalCol(ts, m.lineDen) * lit(m.lineScale) +
          lit(m.lineOff) + lit(0.5))
  }

  /** Inverse RPC over a (pixel, line) table — map-only scalar-iteration
    * UDF (the trip count is data-dependent). Adds `lon`, `lat` (null when
    * the iteration fails to converge, matching panSuccess=FALSE). */
  def inverse(df: DataFrame, m: Model, pixelCol: Column, lineCol: Column,
              heightCol: Column, pixErrThreshold: Double = 0.1,
              maxIterations: Int = 10): DataFrame = {
    val inv = plToLatLongGT(m)
    val f = udf((px: Double, ln: Double, h: Double) =>
      inversePoint(m, inv, px, ln, h, pixErrThreshold, maxIterations))
    df.withColumn("_ll", f(pixelCol, lineCol, heightCol))
      .withColumn("lon", col("_ll._1"))
      .withColumn("lat", col("_ll._2"))
      .drop("_ll")
  }
}
