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
    // base level aggregated once, then ONE explode over the zoom levels +
    // ONE re-aggregation: two shuffles total and a single codegen stage,
    // instead of the previous per-level union (6 compiled stages + cache)
    // whose first-execution JIT dominated wall time
    tileCounts(pts, maxZ)
      .withColumn("zo", explode(lit((minZ to maxZ).toArray)))
      .select(col("zo").cast("int").as("z"),
        expr(s"CAST(x div CAST(pow(2, $maxZ - zo) AS BIGINT) AS INT)").as("x"),
        expr(s"CAST(y div CAST(pow(2, $maxZ - zo) AS BIGINT) AS INT)").as("y"),
        col("n"))
      .groupBy("z", "x", "y").agg(sum("n").as("n"))
  }
}
