package graft.engine

import org.apache.spark.sql.Dataset

/** `gdalenhance` histogram equalization (reference: apps/gdalenhance.cpp).
  *
  * Reference pipeline mirrored exactly:
  *  1. Default histogram (gcore/gdalrasterband.cpp GetDefaultHistogram, the
  *     generic non-Byte path): band min/max over valid pixels, the range
  *     extended by half a bucket on each side
  *     (dfHalfBucket = (max-min)/(2*(nBuckets-1))); min==max degenerates to
  *     one ±0.5 bucket. Bucket index = floor((v-min)*nBuckets/(max-min))
  *     with out-of-range clamped into the end buckets
  *     (bIncludeOutOfRange=TRUE); nodata and NaN pixels are skipped.
  *  2. LUT (gdalenhance.cpp ComputeEqualizationLUTs): extreme buckets are
  *     zeroed (hist[0]=hist[n-1]=0); the cumulative histogram uses the
  *     midpoint rule cum[i] = total_before + hist[i]/2 (integer division);
  *     LUT[i] = clamp(cum[(i*nHist)/nLUT] * nLUT / total, 0, nLUT-1), all in
  *     integer arithmetic; total==0 degrades to 1 with a warning.
  *  3. Application (gdalenhance.cpp EnhancerCallback): nodata passes through
  *     (cast to byte); bin = (v - scaleMin) * nLUT/(scaleMax - scaleMin) with
  *     the NaN-safe ladder (!(bin>0) → 0, !(bin<nLUT-1) → nLUT-1, else
  *     trunc); output = LUT[bin].
  *
  * Spark shape for 100 TB: two bounded reduction jobs build the LUT — a
  * per-tile (min,max) pair reduce, then a per-tile 256-long histogram array
  * reduce (map-side combined; the driver ever holds 256 longs) — and the
  * application is a MAP-ONLY pass with the LUT captured as a 256-int
  * closure constant. No shuffle anywhere. */
object Enhance {

  final case class Lut(scaleMin: Double, scaleMax: Double, nBuckets: Int,
                       lut: Array[Int])

  private def valid(v: Double, nodata: Option[Double]): Boolean =
    !v.isNaN && !nodata.contains(v)

  /** Distributed equalization LUT for one band (ComputeEqualizationLUTs). */
  def equalizationLut(tiles: Dataset[Tile], nodata: Option[Double] = None,
                      nLUTBins: Int = 256): Lut = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val nd = nodata

    // job 1: GetStatistics min/max (valid pixels only)
    val ranges = tiles.map { t =>
      var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
      var i = 0
      while (i < t.pixels.length) {
        val v = t.pixels(i)
        if (valid(v, nd)) { if (v < mn) mn = v; if (v > mx) mx = v }
        i += 1
      }
      (mn, mx)
    }.filter(p => p._1 <= p._2)
    // all-nodata/NaN input: refuse with a meaningful message instead of
    // Dataset.reduce's opaque "empty collection" (isEmpty is a limit-1
    // probe — the reduce itself stays distributed)
    require(!ranges.isEmpty,
      "equalizationLut: no valid pixels (all nodata/NaN); refusing")
    val (rawMin, rawMax) = ranges.reduce((a, b) =>
      (math.min(a._1, b._1), math.max(a._2, b._2)))

    // GetDefaultHistogram range extension (gdalrasterband.cpp)
    val (scaleMin, scaleMax, nBuckets) =
      if (rawMin == rawMax) (rawMin - 0.5, rawMax + 0.5, 1)
      else {
        val half = (rawMax - rawMin) / (2 * (nLUTBins - 1))
        (rawMin - half, rawMax + half, nLUTBins)
      }

    // job 2: bounded histogram (per-tile partial arrays, elementwise reduce)
    val nb = nBuckets; val smin = scaleMin
    val scale = nb / (scaleMax - scaleMin)
    val hist = tiles.map { t =>
      val h = new Array[Long](nb)
      var i = 0
      while (i < t.pixels.length) {
        val v = t.pixels(i)
        if (valid(v, nd)) {
          val idx = math.floor((v - smin) * scale)
          // bIncludeOutOfRange=TRUE end-bucket clamp (gdalrasterband.cpp)
          val b = if (idx < 0) 0 else if (idx >= nb) nb - 1 else idx.toInt
          h(b) += 1
        }
        i += 1
      }
      h
    }.reduce { (a, b) =>
      var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
    }

    // central LUT build over the bounded histogram (gdalenhance.cpp)
    hist(0) = 0
    hist(nBuckets - 1) = 0
    val cum = new Array[Long](nBuckets)
    var total = 0L
    var i = 0
    while (i < nBuckets) { cum(i) = total + hist(i) / 2; total += hist(i); i += 1 }
    if (total == 0) total = 1 // reference warning path
    val lut = new Array[Int](nLUTBins)
    i = 0
    while (i < nLUTBins) {
      val iHist = ((i.toLong * nBuckets) / nLUTBins).toInt
      val v = ((cum(iHist) * nLUTBins) / total).toInt
      lut(i) = math.max(0, math.min(nLUTBins - 1, v))
      i += 1
    }
    Lut(scaleMin, scaleMax, nLUTBins, lut)
  }

  /** EnhancerCallback pixel application as a scalar (shared with the gate
    * oracle's per-pixel twin). */
  def applyLut(v: Double, l: Lut, nodata: Option[Double]): Double = {
    if (nodata.contains(v)) (v.toInt & 0xFF).toDouble // static_cast<GByte>
    else {
      val dfBin = (v - l.scaleMin) * (l.nBuckets / (l.scaleMax - l.scaleMin))
      val iBin =
        if (!(dfBin > 0)) 0 // also catches NaN
        else if (!(dfBin < l.nBuckets - 1)) l.nBuckets - 1
        else dfBin.toInt
      l.lut(iBin).toDouble
    }
  }

  /** Full gdalenhance: LUT build + map-only application. */
  def equalize(tiles: Dataset[Tile], nodata: Option[Double] = None,
               nLUTBins: Int = 256): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val l = equalizationLut(tiles, nodata, nLUTBins)
    val nd = nodata
    tiles.map { t =>
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < t.pixels.length) { out(i) = applyLut(t.pixels(i), l, nd); i += 1 }
      t.copy(pixels = out)
    }
  }
}
