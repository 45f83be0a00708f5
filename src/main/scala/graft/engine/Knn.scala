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
  * done once its kth distance is provably smaller than any point outside the
  * searched disk.
  *
  * Resolution bound (sound at all latitudes, incl. over-the-pole
  * shortcuts): any point outside disk(r) has mercator Chebyshev gap
  * g ≥ r·span from the query, i.e. it lies beyond one of the four edges of
  * the mercator square. Lower-bound the great-circle distance to each edge:
  *  - north/south edge (constant my): ground ≥ R·|φ(my_q ± g) − φ_q|
  *    (meridional distance is a valid lower bound; edge beyond the mercator
  *    world top/bottom → no points there → +∞)
  *  - east/west edge (constant mx): the edge lies on a meridian great
  *    circle at longitude offset Δλ = g/R; exact point-to-great-circle
  *    distance = R·asin(|cos φ_q · sin Δλ|) (valid for any Δλ; naive
  *    g·cos(φ) bounds are WRONG near the poles where geodesics shortcut
  *    across, asin handles that exactly)
  * bound = min of the four. At low latitude this ≈ g·cos φ_q — ~10x
  * tighter than a global cos(85°) factor, so queries resolve early.
  */
object Knn {

  /** Exact kNN join. queries: (qid, lon, lat); points: (pid, plon, plat).
    * Returns (qid, pid, dist_m, rank) with rank 1..k by great-circle meters.
    * Ties broken by pid for determinism. */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int, z: Int,
              maxRings: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val nCells = 1L << z
    // disk(2^z) covers the whole grid (x wraps, y clamps) → exhaustive
    val ringCap = if (maxRings > 0) maxRings else math.max(4, nCells.toInt)
    val pts = points
      .withColumn("pcell", gf.st_cell(col("plon"), col("plat"), lit(z)))
      .select("pid", "plon", "plat", "pcell")
      .cache()
    val nPts = math.max(1L, pts.count())

    val spanMeters = Mercator.resolution(z) * Mercator.TileSize
    val os = Mercator.OriginShift
    val bigR = Mercator.EarthRadius
    val pi = math.Pi
    val w = Window.partitionBy("qid").orderBy(col("dist_m"), col("pid"))

    // adaptive initial radius: a disk expected to hold ~4(k+1) points
    val density = nPts.toDouble / (nCells.toDouble * nCells.toDouble)
    var r = math.max(1, math.min(ringCap,
      math.ceil((math.sqrt(4.0 * (k + 1) / math.max(density, 1e-12)) - 1.0) / 2.0).toInt))

    var pending = queries
      .withColumn("qcell", gf.st_cell(col("lon"), col("lat"), lit(z)))
      .withColumn("qmy", expr(
        s"ln(tan((90.0 + lat) * $pi / 360.0)) / ($pi / 180.0) * $os / 180.0"))
      .cache()
    var results: DataFrame = null
    var done = false
    while (!done) {
      val cand = pending
        .withColumn("pcell", explode(gf.cell_disk(col("qcell"), lit(r))))
        .join(pts, "pcell")
        .withColumn("dist_m", gf.st_greatcircle(col("lat"), col("lon"), col("plat"), col("plon")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
      val g = r * spanMeters
      def latAtMy(my: String) =
        s"(180.0 / $pi * (2.0 * atan(exp(($my) / $os * $pi)) - $pi / 2.0))"
      val dN = s"(CASE WHEN qmy + $g >= $os THEN 1e18 ELSE " +
        s"$bigR * (${latAtMy(s"qmy + $g")} - lat) * ($pi / 180.0) END)"
      val dS = s"(CASE WHEN qmy - $g <= -$os THEN 1e18 ELSE " +
        s"$bigR * (lat - ${latAtMy(s"qmy - $g")}) * ($pi / 180.0) END)"
      val dEW = s"($bigR * asin(least(1.0, abs(cos(lat * $pi / 180.0)) * " +
        s"abs(sin(least($g / $bigR, $pi))))))"
      val boundExpr = expr(s"least($dN, least($dS, $dEW))")
      val stats = cand.groupBy("qid")
        .agg(count(lit(1)).as("nhits"), max("dist_m").as("kth"),
          first("lat").as("lat"), first("qmy").as("qmy"))
      val resolvedIds = stats.where(col("nhits") >= k && col("kth") < boundExpr)
        .select("qid")
      val resolved = cand.join(resolvedIds, "qid")
        .select("qid", "pid", "dist_m", "rank")
      results = if (results == null) resolved else results.unionByName(resolved)
      val stillPending = pending.join(resolvedIds, Seq("qid"), "left_anti").cache()
      val nPending = stillPending.count()
      pending.unpersist()
      pending = stillPending
      if (nPending == 0 || r >= ringCap) {
        if (nPending > 0) {
          // ring budget exhausted: the unresolved remainder is small (the
          // stragglers), so cross-join it against the points directly —
          // exhaustive and exact, without materializing the (2·2^z+1)²-cell
          // disk array per query that cell_disk(ringCap) would build
          val cand2 = pending.select("qid", "lon", "lat").crossJoin(pts.drop("pcell"))
            .withColumn("dist_m", gf.st_greatcircle(col("lat"), col("lon"), col("plat"), col("plon")))
            .withColumn("rank", row_number().over(w))
            .where(col("rank") <= k)
            .select("qid", "pid", "dist_m", "rank")
          results = results.unionByName(cand2)
        }
        done = true
      } else {
        r = math.min(r * 4, ringCap) // aggressive growth: few driver rounds
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
