package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** gdal2tiles-style tile-pyramid assignment (SURVEY.md §3.3).
  *
  * Reference: `gdal raster tile` (/root/reference/apps/gdalalg_raster_tile.cpp)
  * — base tiles at max zoom, overview zoom z-1 built from the 4 children
  * (MosaicDataset, :2003), parallel fan-out in jobs (:3927), `--resume`
  * skipping existing tiles (:289). Here the tile grid is pure expression math
  * (tile_x/tile_y), the pyramid is an iterative parent aggregation, and
  * resume is a manifest anti-join (Manifest.scala).
  */
object TileJob {

  /** Assign each point row to its (z, x, y) XYZ tile for every zoom in
    * [minZ, maxZ]. Input needs (lon, lat); all other columns pass through.
    * Pure narrow transforms — no shuffle. */
  def assign(pts: DataFrame, minZ: Int, maxZ: Int): DataFrame =
    pts.withColumn("z", explode(lit((minZ to maxZ).toArray)))
      .withColumn("x", gf.tile_x(col("lon"), col("z")))
      .withColumn("y", gf.tile_y(col("lat"), col("z")))

  /** Tile statistics at one zoom: docs per tile. */
  def tileCounts(pts: DataFrame, z: Int): DataFrame =
    pts.withColumn("z", lit(z))
      .withColumn("x", gf.tile_x(col("lon"), lit(z)))
      .withColumn("y", gf.tile_y(col("lat"), lit(z)))
      .groupBy("z", "x", "y").agg(count(lit(1)).as("n"))

  /** Full pyramid of tile counts from maxZ down to minZ, computed the
    * reference way: base level aggregated once, each overview level from its
    * children ((x/2, y/2) parent — gdalalg_raster_tile.cpp:2003 semantics,
    * counts sum like an Average-kernel mosaic's weight plane). One shuffle
    * per level, each level 4x smaller. */
  def pyramidCounts(pts: DataFrame, minZ: Int, maxZ: Int): DataFrame = {
    val base = tileCounts(pts, maxZ).cache()
    base.count() // materialize once so the 6-way union reads the cache
    // every overview level derives from the (small, cached) base via bit
    // shifts — one cheap shuffle per level over pre-aggregated data, not a
    // chain of recomputations
    val levels = base :: (minZ until maxZ).map { z =>
      val shift = maxZ - z
      base.select(lit(z).as("z"),
          shiftright(col("x"), shift).cast("int").as("x"),
          shiftright(col("y"), shift).cast("int").as("y"),
          col("n"))
        .groupBy("z", "x", "y").agg(sum("n").as("n"))
    }.toList
    levels.reduce(_ unionByName _)
  }
}
