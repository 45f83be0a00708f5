package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.geom.Mercator

/** A raster tile as a row: GDAL's block grid becomes the row grid
  * (SURVEY.md §1.2). Pixels are row-major doubles (w*h). */
case class Tile(z: Int, x: Int, y: Int, band: Int, w: Int, h: Int, pixels: Array[Double])

/** Distributed raster ops over Dataset[Tile]: rasterize points, pyramid
  * reduce with the Average kernel, and the reference checksum oracle. */
object Raster {

  final val TileSize = 256

  /** Rasterize points into per-tile count grids at zoom z (the raster leg of
    * the north rule). Reference: scanline rasterizer burn step
    * (/root/reference/alg/gdalrasterize.cpp:878, llrasterize.cpp:58) — for
    * point geometries the burn is a single-pixel increment. One shuffle
    * (groupByKey on tile), then per-tile dense fill. */
  def rasterizePoints(pts: DataFrame, z: Int): Dataset[Tile] = {
    val spark = pts.sparkSession
    import spark.implicits._
    val tileSize = TileSize
    val mapSize = (1L << z) * tileSize // PixelsToRaster top-left flip (gdal2tiles.py:470)
    val pix = pts.select(col("lon").cast("double"), col("lat").cast("double"))
      .as[(Double, Double)]
      .flatMap { case (lon, lat) =>
        // exact gdal2tiles pixel pipeline — floor(pyXyz/256) agrees with
        // tile_y's ceil-based TMS tile + flip at every boundary
        val px = Mercator.metersToPixelX(Mercator.lonToX(lon), z)
        val pyXyz = mapSize - Mercator.metersToPixelY(Mercator.latToY(lat), z)
        if (px >= 0 && px < mapSize && pyXyz >= 0 && pyXyz < mapSize)
          Some((math.floor(px).toLong, math.floor(pyXyz).toLong))
        else None
      }
    pix
      .groupByKey { case (ipx, ipy) => (ipx / tileSize, ipy / tileSize) }
      .mapGroups { (key: (Long, Long), rows: Iterator[(Long, Long)]) =>
        val (tx, ty) = key
        val px = new Array[Double](tileSize * tileSize)
        rows.foreach { case (ipx, ipy) =>
          val cx = (ipx - tx * tileSize).toInt
          val cy = (ipy - ty * tileSize).toInt
          px(cy * tileSize + cx) += 1.0
        }
        Tile(z, tx.toInt, ty.toInt, 1, tileSize, tileSize, px)
      }
  }

  /** Deterministic synthetic raster: full z-level tile grid with pixel
    * values from a closed-form f(globalX, globalY) — the analytic-oracle
    * input for focal/warp tests (any engine can recompute f directly). */
  def syntheticTiles(spark: SparkSession, z: Int, band: Int = 1,
                     tileSize: Int = TileSize)(f: (Long, Long) => Double): Dataset[Tile] = {
    import spark.implicits._
    val n = 1 << z
    val ts = tileSize
    spark.range(0, n.toLong * n, 1, math.min(n * n, 64)).map { id =>
      val tx = (id % n).toInt; val ty = (id / n).toInt
      val px = new Array[Double](ts * ts)
      var y = 0
      while (y < ts) {
        var x = 0
        while (x < ts) {
          px(y * ts + x) = f(tx.toLong * ts + x, ty.toLong * ts + y)
          x += 1
        }
        y += 1
      }
      Tile(z, tx, ty, band, ts, ts, px)
    }
  }

  /** One pyramid level up: each parent tile is the Average-kernel reduction
    * of its <=4 children (reference: MosaicDataset + Average,
    * gdalalg_raster_tile.cpp:2003-2060, kernels gdalwarper.h:45). For count
    * rasters use sum=false to average, true to sum. */
  def pyramidUp(tiles: Dataset[Tile], sum: Boolean = false): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.groupByKey(t => (t.z - 1, t.x / 2, t.y / 2, t.band))
      .mapGroups { (key: (Int, Int, Int, Int), ts: Iterator[Tile]) =>
        val (z, px, py, band) = key
        val children = ts.toArray
        val w = children(0).w; val h = children(0).h
        val out = new Array[Double](w * h)
        children.foreach { c =>
          val ox = (c.x - px * 2) * w / 2 // child quadrant offset in parent
          val oy = (c.y - py * 2) * h / 2
          var cy = 0
          while (cy < h) {
            var cx = 0
            while (cx < w) {
              // 2x2 box filter into the parent quadrant
              if ((cx & 1) == 0 && (cy & 1) == 0) {
                val a = c.pixels(cy * w + cx)
                val b = if (cx + 1 < w) c.pixels(cy * w + cx + 1) else 0.0
                val d = if (cy + 1 < h) c.pixels((cy + 1) * w + cx) else 0.0
                val e = if (cx + 1 < w && cy + 1 < h) c.pixels((cy + 1) * w + cx + 1) else 0.0
                val v = if (sum) a + b + d + e else (a + b + d + e) / 4.0
                out((oy + cy / 2) * w + (ox + cx / 2)) = v
              }
              cx += 1
            }
            cy += 1
          }
        }
        Tile(z, px, py, band, w, h, out)
      }
  }

  /** Exact port of GDALChecksumImage for one tile's pixel window
    * (/root/reference/alg/gdalchecksum.cpp:36-57,175-188):
    * primes {7,...,43}; value += int(v) % prime[(y*W+x) % 11]; accumulator
    * masked with 0xffff after each ROW. Float conversion: +0.5, clamp to
    * ±2147483647, floor; non-finite → INT_MIN. isFloat=false takes values
    * as exact ints (integer-typed band path). */
  def checksum(pixels: Array[Double], w: Int, h: Int, isFloat: Boolean = true): Int = {
    val primes = Array(7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43)
    var cks = 0
    var y = 0
    while (y < h) {
      var iPrime = (y.toLong * w % 11).toInt
      var x = 0
      while (x < w) {
        val d = pixels(y * w + x)
        val v: Int =
          if (isFloat) {
            if (!java.lang.Double.isFinite(d)) Int.MinValue
            else {
              val s = d + 0.5
              if (s < -2147483647.0) -2147483647
              else if (s > 2147483647.0) 2147483647
              else math.floor(s).toInt
            }
          } else d.toInt
        cks += v % primes(iPrime)
        iPrime += 1
        if (iPrime > 10) iPrime = 0
        x += 1
      }
      cks &= 0xffff
      y += 1
    }
    cks
  }

  /** Checksum as a typed Aggregator — the distributed raster-equality oracle
    * (per-tile, so order within a tile is the reference's row-major order). */
  val tileChecksum: Aggregator[Tile, Long, Long] = new Aggregator[Tile, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, t: Tile): Long = (b + checksum(t.pixels, t.w, t.h)) & 0xffffffffL
    def merge(a: Long, b: Long): Long = (a + b) & 0xffffffffL
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

}
