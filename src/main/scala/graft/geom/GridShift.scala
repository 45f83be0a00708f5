package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NTv2-style grid-shift datum transform — the grid-interpolation
  * ALGORITHM of the published NTv2 (Canadian National Transformation v2)
  * format, the path the reference's coordinate engine takes when an SRS
  * pair resolves to an `hgridshift` PROJ pipeline step
  * (/root/reference/ogr/ogrct.cpp:1788-2122 pipeline construction). The
  * distortion-grid FILES are licensed data and stay out of scope; the
  * algorithm — bilinear interpolation of two shift surfaces plus the
  * fixed-point inverse — is public and implemented here over in-memory
  * grids.
  *
  * NTv2 semantics implemented:
  *  - a regular lat/lon node grid; node (i, j) sits at
  *    (latMin + i·dlat, lonMin + j·dlon); row-major storage, row 0 = south
  *  - each node stores (latShiftSec, lonShiftSec) in ARC-SECONDS with the
  *    longitude shift POSITIVE WEST (the NTv2 file convention), so
  *    lat' = lat + latShift/3600 and lon' = lon − lonShift/3600
  *  - forward: bilinear interpolation of both surfaces at the input point
  *  - points outside the grid pass through unchanged (no shift defined —
  *    PROJ's out-of-grid fallback)
  *  - inverse: fixed-count fixed-point iteration
  *    xₖ₊₁ = target − shift(xₖ) (hgridshift inverse semantics, iteration
  *    count pinned for determinism)
  *
  * Scale shape: a grid is a few thousand doubles — broadcast as column
  * LITERALS, so the transform is a map-only projection that stays inside
  * whole-stage codegen; no shuffle, no UDF.
  */
object GridShift {

  /** An NTv2-style sub-grid. `latShiftSec`/`lonShiftSec` are row-major
    * nRows×nCols node values in arc-seconds (lon shift positive west). */
  final case class Grid(latMin: Double, lonMin: Double,
                        dlat: Double, dlon: Double,
                        nRows: Int, nCols: Int,
                        latShiftSec: Array[Double], lonShiftSec: Array[Double]) {
    require(latShiftSec.length == nRows * nCols && lonShiftSec.length == nRows * nCols)
    def latMax: Double = latMin + (nRows - 1) * dlat
    def lonMax: Double = lonMin + (nCols - 1) * dlon
  }

  /** Deterministic synthetic fixture grid: every node value is an exact
    * binary fraction (multiples of 1/16 and 1/32) computed from the node
    * indices by integer arithmetic, so an independent engine (the DuckDB
    * oracle) rebuilds the identical grid from the same closed form and the
    * bilinear arithmetic is bit-reproducible. Spacings are exact powers of
    * two × small integers for the same reason. */
  def syntheticGrid(nRows: Int = 21, nCols: Int = 21): Grid = {
    val latS = Array.tabulate(nRows * nCols) { k =>
      val i = k / nCols; val j = k % nCols
      (((i * 31 + j * 17) % 13) - 6) * 0.25 + ((i * 7 + j * 3) % 5) * 0.0625
    }
    val lonS = Array.tabulate(nRows * nCols) { k =>
      val i = k / nCols; val j = k % nCols
      (((i * 19 + j * 23) % 11) - 5) * 0.5 + ((i * 5 + j * 13) % 7) * 0.03125
    }
    Grid(latMin = -80.0, lonMin = -180.0, dlat = 8.0, dlon = 18.0,
      nRows, nCols, latS, lonS)
  }

  /** Scalar bilinear interpolation of one shift surface at (lon, lat).
    * The exact operation order here is mirrored by [[forwardCols]] and the
    * g52 oracle SQL — do not "simplify" the arithmetic. */
  private def bilinear(g: Grid, vals: Array[Double],
                       lon: Double, lat: Double): Double = {
    val fi = (lat - g.latMin) / g.dlat
    val fj = (lon - g.lonMin) / g.dlon
    val i = math.min(math.max(math.floor(fi), 0.0), (g.nRows - 2).toDouble).toInt
    val j = math.min(math.max(math.floor(fj), 0.0), (g.nCols - 2).toDouble).toInt
    val u = fi - i; val v = fj - j
    val idx = i * g.nCols + j
    (1.0 - u) * ((1.0 - v) * vals(idx) + v * vals(idx + 1)) +
      u * ((1.0 - v) * vals(idx + g.nCols) + v * vals(idx + g.nCols + 1))
  }

  private def inside(g: Grid, lon: Double, lat: Double): Boolean =
    lat >= g.latMin && lat <= g.latMax && lon >= g.lonMin && lon <= g.lonMax

  /** Forward grid shift of one point; out-of-grid points pass through. */
  def forward(g: Grid, lon: Double, lat: Double): (Double, Double) =
    if (!inside(g, lon, lat)) (lon, lat)
    else (lon - bilinear(g, g.lonShiftSec, lon, lat) / 3600.0,
          lat + bilinear(g, g.latShiftSec, lon, lat) / 3600.0)

  /** Inverse grid shift: `iters` fixed-point rounds of
    * xₖ₊₁ = target − shift(xₖ), seeded at the target itself. 4 rounds
    * put the residual far below the grid's resolution for real-world
    * shift magnitudes (arc-seconds). */
  def inverse(g: Grid, lon: Double, lat: Double, iters: Int = 4): (Double, Double) = {
    var lo = lon; var la = lat
    var k = 0
    while (k < iters) {
      val (flo, fla) = forward(g, lo, la)
      lo = lo - (flo - lon)
      la = la - (fla - lat)
      k += 1
    }
    (lo, la)
  }

  /** Column form of [[forward]]: a map-only projection over grid LITERALS
    * (element_at over a broadcast array literal — codegen-friendly, no
    * shuffle, no UDF). Returns (lonOut, latOut). Operation order matches
    * the scalar form and the g52 oracle SQL exactly. */
  def forwardCols(g: Grid, lon: Column, lat: Column): (Column, Column) = {
    val latArr = typedLit(g.latShiftSec.toSeq)
    val lonArr = typedLit(g.lonShiftSec.toSeq)
    val fi = (lat - lit(g.latMin)) / lit(g.dlat)
    val fj = (lon - lit(g.lonMin)) / lit(g.dlon)
    val i = least(greatest(floor(fi), lit(0.0)), lit((g.nRows - 2).toDouble)).cast("int")
    val j = least(greatest(floor(fj), lit(0.0)), lit((g.nCols - 2).toDouble)).cast("int")
    val u = fi - i.cast("double"); val v = fj - j.cast("double")
    def bil(a: Column): Column = {
      val idx = i * lit(g.nCols) + j + lit(1) // element_at is 1-based
      (lit(1.0) - u) * ((lit(1.0) - v) * element_at(a, idx) +
          v * element_at(a, idx + lit(1))) +
        u * ((lit(1.0) - v) * element_at(a, idx + lit(g.nCols)) +
          v * element_at(a, idx + lit(g.nCols) + lit(1)))
    }
    val in = lat >= lit(g.latMin) && lat <= lit(g.latMax) &&
      lon >= lit(g.lonMin) && lon <= lit(g.lonMax)
    (when(in, lon - bil(lonArr) / lit(3600.0)).otherwise(lon),
     when(in, lat + bil(latArr) / lit(3600.0)).otherwise(lat))
  }
}
