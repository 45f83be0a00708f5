package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.geom.Mercator
import graft.functions.gf

/** kNN via cell-ring expansion + great-circle refinement (SURVEY.md §2.H).
  *
  * Reference: the quadtree nearest-neighbor walk with a growing search AOI
  * (/root/reference/alg/gdalgrid.cpp:261-277,348-430) and the geodesic metric
  * OGR_GreatCircle_Distance (/root/reference/ogr/ogr_geo_utils.cpp:33-46).
  *
  * Algorithm: iteratively grow a Chebyshev cell disk around each query cell,
  * join candidates on cell, keep the k nearest by great-circle; a query is
  * done once its kth distance is provably smaller than anything outside the
  * searched disk. The lower bound for a point outside disk(r) at zoom z is
  *   r * tileSpanMeters(z) * cos(85.05°)
  * (mercator ground distance shrinks by cos(lat); tiles only exist within
  * ±85.05°, so this conservative global factor is correct at any latitude).
  */
object Knn {

  private final val CosMaxLat = math.cos(Mercator.MaxLat * math.Pi / 180.0)

  /** Exact kNN join. queries: (qid, lon, lat); points: (pid, lon, lat).
    * Returns (qid, pid, dist_m, rank) with rank 1..k by great-circle meters.
    * Ties broken by pid for determinism. */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int, z: Int,
              maxRings: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    val pts = points
      .withColumn("pcell", gf.st_cell(col("plon"), col("plat"), lit(z)))
      .select("pid", "plon", "plat", "pcell")
      .cache()

    val spanMeters = Mercator.resolution(z) * Mercator.TileSize
    val w = Window.partitionBy("qid").orderBy(col("dist_m"), col("pid"))

    var pending = queries
      .withColumn("qcell", gf.st_cell(col("lon"), col("lat"), lit(z)))
      .cache()
    var results: DataFrame = null
    var r = 1 // first pass searches disk(1) = 3x3 so edge-adjacent cells are in
    var done = false
    while (!done) {
      val cand = pending
        .withColumn("pcell", explode(gf.cell_disk(col("qcell"), lit(r))))
        .join(pts, "pcell")
        .withColumn("dist_m", gf.st_greatcircle(col("lat"), col("lon"), col("plat"), col("plon")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
      // a query is resolved if it has k hits all closer than the disk bound
      val bound = (r - 0) * spanMeters * CosMaxLat // points beyond disk(r) are >= r*span*cos
      val stats = cand.groupBy("qid")
        .agg(count(lit(1)).as("nhits"), max("dist_m").as("kth"))
      val resolvedIds = stats.where(col("nhits") >= k && col("kth") < lit(bound))
        .select("qid")
      val resolved = cand.join(resolvedIds, "qid")
        .select("qid", "pid", "dist_m", "rank")
      results = if (results == null) resolved else results.unionByName(resolved)
      val stillPending = pending.join(resolvedIds, Seq("qid"), "left_anti").cache()
      val nPending = stillPending.count()
      pending.unpersist()
      pending = stillPending
      if (nPending == 0 || r >= maxRings) {
        // exhausted ring budget: emit best-effort top-k for the remainder
        if (nPending > 0) {
          val cand2 = pending
            .withColumn("pcell", explode(gf.cell_disk(col("qcell"), lit(maxRings))))
            .join(pts, "pcell")
            .withColumn("dist_m", gf.st_greatcircle(col("lat"), col("lon"), col("plat"), col("plon")))
            .withColumn("rank", row_number().over(w))
            .where(col("rank") <= k)
            .select("qid", "pid", "dist_m", "rank")
          results = results.unionByName(cand2)
        }
        done = true
      } else {
        r *= 2 // geometric ring growth: few driver iterations even for sparse areas
      }
    }
    results
  }

  /** Brute-force kNN (cross join) — the small-side / oracle path. */
  def knnBrute(queries: DataFrame, points: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("dist_m"), col("pid"))
    queries.crossJoin(points)
      .withColumn("dist_m", gf.st_greatcircle(col("lat"), col("lon"), col("plat"), col("plon")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "pid", "dist_m", "rank")
  }
}
