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

  /** Candidate (node, point) pairs within `radius`: both sides bucketed
    * into radius-sized cells, nodes explode a 3x3 window, one equi-join,
    * circle-test refine — the distributed twin of the reference's quadtree
    * AOI walk (alg/gdalgrid.cpp:261-277). Adds `dist2`. */
  private def radiusCandidates(nodes: DataFrame, pts: DataFrame, radius: Double): DataFrame = {
    val cell = (lon: Column, lat: Column) =>
      struct(floor(lon / radius).cast("long").as("cx"),
        floor(lat / radius).cast("long").as("cy"))
    val p = pts.withColumn("c", cell(col("lon"), col("lat")))
      .withColumn("pcx", col("c.cx")).withColumn("pcy", col("c.cy")).drop("c")
    nodes
      .withColumn("c", cell(col("nlon"), col("nlat")))
      .withColumn("pcx", explode(array((-1 to 1).map(d => col("c.cx") + d): _*)))
      .withColumn("pcy", explode(array((-1 to 1).map(d => col("c.cy") + d): _*)))
      .drop("c")
      .join(p, Seq("pcx", "pcy"))
      .withColumn("dist2",
        (col("lon") - col("nlon")) * (col("lon") - col("nlon")) +
          (col("lat") - col("nlat")) * (col("lat") - col("nlat")))
      .where(col("dist2") <= lit(radius * radius))
  }

  /** Inverse-distance-to-a-power gridding — gdal_grid's DEFAULT algorithm
    * (GDALGridInverseDistanceToAPower, alg/gdalgrid.cpp:110-189):
    * Z = Σ(Zi/ri^p) / Σ(1/ri^p) over points in the search circle, with
    * r² = dx² + dy² + smoothing² ; a point with r² < 1e-13 short-circuits
    * to its own value (singularity guard, :163-167); fewer than minPoints
    * neighbors → nodata (null value, :179-183).
    *
    * With maxPoints > 0 this is the NearestNeighbor variant
    * (GDALGridInverseDistanceToAPowerNearestNeighbor, :242-345): only the
    * maxPoints nearest candidates (by smoothed distance, scan-order pid
    * tie-break mirroring the multimap insertion order) contribute.
    *
    * Returns (i, j, n, value) with n = contributing points, value nullable.
    */
  def invdist(nodes: DataFrame, pts: DataFrame, radius: Double,
              power: Double = 2.0, smoothing: Double = 0.0,
              minPoints: Int = 0, maxPoints: Int = 0): DataFrame = {
    val cand0 = radiusCandidates(nodes, pts, radius)
      .withColumn("r2s", col("dist2") + lit(smoothing * smoothing))
    val cand =
      if (maxPoints > 0) {
        val w = Window.partitionBy("i", "j").orderBy(col("r2s"), col("pid"))
        cand0.withColumn("rk", row_number().over(w)).where(col("rk") <= maxPoints)
      } else cand0
    // w = 1/r^p computed as pow(r2, p/2) like the reference (dfPowerDiv2);
    // p=2 stays pow-free in codegen via the exact 1/r2 fast path
    val invw =
      if (power == 2.0) lit(1.0) / col("r2s")
      else lit(1.0) / pow(col("r2s"), lit(power / 2.0))
    val metrics = cand
      .withColumn("invw", invw)
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("invw") * col("value")).as("nom"),
        sum(col("invw")).as("den"),
        // singularity: any point closer than 1e-13 supplies its value
        // directly (first by pid, deterministic twin of scan order)
        min(when(col("r2s") < 1e-13, struct(col("pid"), col("value")))).as("sing"))
      .withColumn("value",
        when(col("sing").isNotNull, col("sing.value"))
          .when(col("n") < minPoints || col("den") === 0.0, lit(null))
          .otherwise(col("nom") / col("den")))
      .select("i", "j", "n", "value")
    nodes.select("i", "j").join(metrics, Seq("i", "j"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** Radius-search interpolation. pts needs (pid, lon, lat, value).
    * Returns one row per grid node (gdal_grid nodata semantics: nodes with
    * no point in radius are kept with n=0 and null sum/nearest): n (count
    * in radius), sum_cents (exact integer sum of values), nearest_pid
    * (null if empty). Average = sum_cents / n downstream. */
  def radiusMetrics(nodes: DataFrame, pts: DataFrame, radius: Double): DataFrame = {
    val candidates = radiusCandidates(nodes, pts, radius)
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
