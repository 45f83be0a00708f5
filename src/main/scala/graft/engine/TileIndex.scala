package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.geom.Mercator

/** gdaltindex + gdalbuildvrt re-expressed as DataFrames.
  *
  * gdaltindex builds a vector layer with one feature per source raster —
  * a `location` attribute plus the source's footprint polygon
  * (/root/reference/apps/gdaltindex_lib.cpp:900-1000). Spark-first that is
  * an INDEX TABLE: (location, z, x, y, minx..maxy) — small, broadcastable,
  * and a bbox query against it is an ordinary filter Catalyst can push.
  *
  * gdalbuildvrt composes the selected sources into a virtual mosaic whose
  * per-source SimpleSource carries SrcRect/DstRect pixel windows
  * (/root/reference/frmts/vrt/vrtsources.cpp GetSrcDstWindow,
  * apps/gdalbuildvrt_lib.cpp:1358-1500). Spark-first a VRT is a mosaic
  * DESCRIPTOR DataFrame — one row per (source, src window, dst window) —
  * and "translating" the VRT is a semi-join of the tile table against the
  * descriptor plus a per-tile crop/shift: the fact (pixel) side is touched
  * only for tiles the index selected, never scanned whole.
  *
  * Scale shape: the index is O(#sources) rows (millions at 100 TB — still
  * tiny next to pixels) and builds with ONE distinct-shuffle; bbox query
  * and VRT construction are narrow ops on the index alone; mosaic
  * materialization broadcasts the descriptor and streams the tile table
  * with zero fact-side shuffle.
  */
object TileIndex {

  /** One gdaltindex feature: location + EPSG:3857 footprint (XYZ y). */
  case class Entry(location: String, z: Int, x: Int, y: Int,
                   minx: Double, miny: Double, maxx: Double, maxy: Double)

  /** One VRT SimpleSource: source tile, SrcRect offset, DstRect offset,
    * shared window size (vrtsources.cpp SrcRect/DstRect). Dst pixel space
    * is anchored at the request bbox's top-left pixel. */
  case class SimpleSource(location: String, z: Int, x: Int, y: Int,
                          srcXOff: Int, srcYOff: Int, dstXOff: Int, dstYOff: Int,
                          w: Int, h: Int)

  def locationOf(z: Int, x: Int, y: Int): String = s"z$z/x$x/y$y.tile"

  /** Tile footprint in EPSG:3857 meters with XYZ row order (top-left
    * origin), the gdal2tiles TileBounds formula (gdal2tiles.py:446-452)
    * with the y flip applied. */
  def tileBounds(z: Int, x: Int, y: Int): (Double, Double, Double, Double) = {
    val tileM = 2.0 * Mercator.OriginShift / (1L << z).toDouble
    val minx = -Mercator.OriginShift + x * tileM
    val maxx = -Mercator.OriginShift + (x + 1) * tileM
    val maxy = Mercator.OriginShift - y * tileM
    val miny = Mercator.OriginShift - (y + 1) * tileM
    (minx, miny, maxx, maxy)
  }

  /** Build the tile index: one row per distinct (z,x,y). One shuffle
    * (distinct on the tile key); footprints are computed per-row after the
    * dedup so the shuffle payload is 3 ints, not 8 doubles + a string. */
  def buildIndex(tiles: Dataset[Tile]): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.map(t => (t.z, t.x, t.y)).distinct()
      .map { case (z, x, y) =>
        val (mnx, mny, mxx, mxy) = tileBounds(z, x, y)
        Entry(locationOf(z, x, y), z, x, y, mnx, mny, mxx, mxy)
      }
      .toDF()
  }

  /** Sources whose footprint intersects the bbox — strict inequalities so
    * a source that only shares an edge with the request is not selected
    * (it would contribute a zero-width window). */
  def queryBbox(index: DataFrame, minx: Double, miny: Double,
                maxx: Double, maxy: Double): DataFrame =
    index.where(col("minx") < lit(maxx) && col("maxx") > lit(minx) &&
      col("miny") < lit(maxy) && col("maxy") > lit(miny))

  /** gdalbuildvrt: per selected source, the SrcRect/DstRect pixel windows
    * of its overlap with the request bbox at the source zoom's native
    * resolution (GetSrcDstWindow semantics; request edges round OUT to
    * whole pixels like -te does). Pure per-row math over the index — no
    * pixel data touched. */
  def buildVrt(index: DataFrame, minx: Double, miny: Double,
               maxx: Double, maxy: Double): Dataset[SimpleSource] = {
    val spark = index.sparkSession
    import spark.implicits._
    queryBbox(index, minx, miny, maxx, maxy)
      .select(col("location"), col("z"), col("x"), col("y"))
      .as[(String, Int, Int, Int)]
      .map { case (loc, z, x, y) =>
        val res = Mercator.resolution(z)
        val os = Mercator.OriginShift
        // request bbox → global XYZ pixel range, rounded out
        val dx0 = math.floor((minx + os) / res).toLong
        val dy0 = math.floor((os - maxy) / res).toLong
        val dx1 = math.ceil((maxx + os) / res).toLong
        val dy1 = math.ceil((os - miny) / res).toLong
        // source tile's global pixel range
        val sx0 = x.toLong * Raster.TileSize
        val sy0 = y.toLong * Raster.TileSize
        // intersection
        val ix0 = math.max(sx0, dx0); val ix1 = math.min(sx0 + Raster.TileSize, dx1)
        val iy0 = math.max(sy0, dy0); val iy1 = math.min(sy0 + Raster.TileSize, dy1)
        SimpleSource(loc, z, x, y,
          (ix0 - sx0).toInt, (iy0 - sy0).toInt,
          (ix0 - dx0).toInt, (iy0 - dy0).toInt,
          (ix1 - ix0).toInt, (iy1 - iy0).toInt)
      }
      .filter(s => s.w > 0 && s.h > 0)
  }

  /** Materialize the VRT into dst-grid tiles (gdal_translate of a VRT):
    * the descriptor (small) joins the tile table (big) on the tile key —
    * Catalyst broadcasts the descriptor side, the pixel side never
    * shuffles before the crop; cropped fragments then group into dst
    * tiles (one shuffle, payload = only the pixels inside the request). */
  def mosaic(tiles: Dataset[Tile], vrt: Dataset[SimpleSource]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val ts = Raster.TileSize
    val keyed = tiles.joinWith(broadcast(vrt),
        tiles("z") === vrt("z") && tiles("x") === vrt("x") && tiles("y") === vrt("y"),
        "inner")
      .flatMap { case (t, s) =>
        // emit (dstTileX, dstTileY, dstCol, dstRow, value) fragments, then
        // reassemble per dst tile; dst tile grid is anchored at dst pixel 0
        val out = scala.collection.mutable.ArrayBuffer
          .empty[((Int, Int, Int), (Int, Int, Double))]
        var r = 0
        while (r < s.h) {
          var c = 0
          val srcRow = s.srcYOff + r
          val dstRow = s.dstYOff + r
          while (c < s.w) {
            val v = t.pixels(srcRow * t.w + (s.srcXOff + c))
            if (v != 0.0) {
              val dstCol = s.dstXOff + c
              out += (((t.band, dstCol / ts, dstRow / ts),
                (dstCol % ts, dstRow % ts, v)))
            }
            c += 1
          }
          r += 1
        }
        out.iterator
      }
    keyed.groupByKey(_._1).mapGroups { (key, it) =>
      val (band, tx, ty) = key
      val px = new Array[Double](ts * ts)
      it.foreach { case (_, (cx, cy, v)) => px(cy * ts + cx) = v }
      Tile(0, tx, ty, band, ts, ts, px)
    }
  }
}
