package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** gdal_grid-style interpolation of scattered points onto a regular grid
  * (SURVEY.md §2.F `grid`): per-node radius search with the nearest /
  * average / count "data metrics" family.
  *
  * Reference: grid algorithms + quadtree-accelerated neighbor search
  * (/root/reference/alg/gdal_alg.h:402-416, /root/reference/alg/gdalgrid.cpp:261-277,3769).
  * Spark shape: both sides are bucketed into a flat lon/lat cell grid with
  * cell size = search radius, nodes explode their 3x3 cell window, and one
  * equi-join on cell produces exactly the candidate set whose circle-test
  * refine is the radius predicate — the distributed twin of the quadtree
  * AOI walk. Metric is flat degrees (as gdal_grid's default cartesian
  * metric); no antimeridian wrap (documented limitation).
  */
object GridInterp {

  /** nodes: every (i,j) of an nx×ny grid over [minLon,maxLon]×[minLat,maxLat],
    * node coords at cell centers. */
  def gridNodes(spark: SparkSession, nx: Int, ny: Int,
                minLon: Double, maxLon: Double,
                minLat: Double, maxLat: Double): DataFrame = {
    val dLon = (maxLon - minLon) / nx
    val dLat = (maxLat - minLat) / ny
    spark.range(0, nx.toLong * ny, 1, math.min(nx * ny, 64))
      .select(
        (col("id") % nx).cast("int").as("i"),
        (col("id") / nx).cast("int").as("j"))
      .withColumn("nlon", lit(minLon) + (col("i") + lit(0.5)) * lit(dLon))
      .withColumn("nlat", lit(minLat) + (col("j") + lit(0.5)) * lit(dLat))
  }

  /** Radius-search interpolation. pts needs (pid, lon, lat, value).
    * Returns one row per grid node (gdal_grid nodata semantics: nodes with
    * no point in radius are kept with n=0 and null sum/nearest): n (count
    * in radius), sum_cents (exact integer sum of values), nearest_pid
    * (null if empty). Average = sum_cents / n downstream. */
  def radiusMetrics(nodes: DataFrame, pts: DataFrame, radius: Double): DataFrame = {
    val cell = (lon: Column, lat: Column) =>
      struct(floor(lon / radius).cast("long").as("cx"),
        floor(lat / radius).cast("long").as("cy"))
    val p = pts.withColumn("c", cell(col("lon"), col("lat")))
      .withColumn("pcx", col("c.cx")).withColumn("pcy", col("c.cy")).drop("c")
    val candidates = nodes
      .withColumn("c", cell(col("nlon"), col("nlat")))
      .withColumn("pcx", explode(array((-1 to 1).map(d => col("c.cx") + d): _*)))
      .withColumn("pcy", explode(array((-1 to 1).map(d => col("c.cy") + d): _*)))
      .drop("c")
      .join(p, Seq("pcx", "pcy"))
      .withColumn("dist2",
        (col("lon") - col("nlon")) * (col("lon") - col("nlon")) +
          (col("lat") - col("nlat")) * (col("lat") - col("nlat")))
      .where(col("dist2") <= lit(radius * radius))
    val w = Window.partitionBy("i", "j").orderBy(col("dist2"), col("pid"))
    val metrics = candidates
      .withColumn("rk", row_number().over(w))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).as("sum_cents"),
        max(when(col("rk") === 1, col("pid"))).as("nearest_pid"))
    // Left-join back onto the full node grid so empty nodes surface as
    // nodata rows (gdal_grid writes the nodata value there, alg/gdalgrid.cpp).
    nodes.select("i", "j").join(metrics, Seq("i", "j"), "left")
      .na.fill(0L, Seq("n"))
  }
}
