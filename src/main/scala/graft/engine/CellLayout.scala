package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Cell-prefix-partitioned, hilbert-sorted data layout — the engine's
  * analog of the reference's persistent spatial indexes / CREATE INDEX DDL
  * (/root/reference/gcore/gdaldataset.cpp:7464-7530) re-expressed as a
  * PHYSICAL LAYOUT, the way a lakehouse stores 100 TB of geo rows:
  *
  *  - directory partitioning on a coarse cell (`pcell` at `prefixZ`):
  *    a bbox query's cell cover prunes entire directories at planning
  *    time (PartitionFilters, zero I/O for non-matching cells);
  *  - `sortWithinPartitions(hilbert)` inside each partition: rows near in
  *    space are near in the file, so parquet row-group min/max statistics
  *    prune within the partition too, and cell-cover joins read
  *    co-located blocks.
  *
  * Reference analog for the ordering: `gdal vector sort`/hilbert
  * clustering (alg/hilbert.cpp). */
object CellLayout {

  /** Write `df` (needs lon/lat columns) cell-partitioned + hilbert-sorted. */
  def write(df: DataFrame, path: String, prefixZ: Int, cellZ: Int = 16): Unit = {
    df.withColumn("pcell", gf.cell_parent(gf.st_cell(col("lon"), col("lat"), lit(cellZ)), lit(prefixZ)))
      .withColumn("hkey", gf.hilbert_code(col("lon"), col("lat"),
        lit(-180.0), lit(-90.0), lit(180.0), lit(90.0)))
      .repartition(col("pcell"))
      .sortWithinPartitions("pcell", "hkey")
      .write.mode("overwrite").partitionBy("pcell").parquet(path)
  }

  /** Read back with a bbox: the `pcell IN (cover)` predicate is a
    * partition filter — directories outside the bbox cover are never
    * listed or read. */
  def readBbox(spark: SparkSession, path: String, prefixZ: Int,
               minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): DataFrame = {
    val wkt = s"POLYGON (($minLon $minLat,$maxLon $minLat,$maxLon $maxLat,$minLon $maxLat,$minLon $minLat))"
    val df = spark.read.parquet(path)
    df.where(col("pcell").isin(coverCells(wkt, prefixZ): _*))
      .where(col("lon") >= minLon && col("lon") <= maxLon &&
        col("lat") >= minLat && col("lat") <= maxLat)
  }

  private def coverCells(wkt: String, z: Int): Seq[Long] = {
    val g = graft.geom.Wkt.parse(wkt)
    graft.cell.CellId.cover(g, z).toSeq
  }
}
