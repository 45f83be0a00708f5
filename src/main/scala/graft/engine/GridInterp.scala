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
    // p=2 stays pow-free in codegen via the exact 1/r2 fast path. A
    // coincident point (r2s < 1e-13, possible when smoothing = 0 and a
    // node sits exactly on a point) must not reach the division — ANSI
    // mode turns 1/0 into a query error; the reference breaks out of the
    // loop there (gdalgrid.cpp:163-167) so its weight is never formed
    // either, and `sing` below supplies the node's value.
    val invwRaw =
      if (power == 2.0) lit(1.0) / col("r2s")
      else lit(1.0) / pow(col("r2s"), lit(power / 2.0))
    val invw = when(col("r2s") < 1e-13, lit(0.0)).otherwise(invwRaw)
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

  /** Elliptical search window IDW (gdal_grid radius1/radius2/angle,
    * alg/gdalgrid.cpp:124-160): candidates come from the bounding circle
    * of the rotated ellipse (cells sized max(r1,r2)); the refine is the
    * reference's rotated test r2²·RX² + r1²·RY² ≤ r1²·r2² with
    * RX = dx·cosA + dy·sinA, RY = dy·cosA − dx·sinA, while the IDW weight
    * keeps the UNROTATED smoothed distance (dfR2 is computed before the
    * rotation, :145-155). Same singularity / minPoints semantics as
    * [[invdist]].
    *
    * Documented deviations from the reference: (1) the <1e-13 coincident-
    * point singularity resolves by MIN pid (a deterministic, partitioning-
    * independent tie-break), whereas the reference takes the first
    * coincident point in scan order (gdalgrid.cpp:163) — results differ
    * only when multiple coincident points with different values sit
    * exactly on a node; (2) the reference's nMaxPoints cap for the ellipse
    * variant is not implemented here (use [[invdist]] with maxPoints for
    * the capped circular form). */
  def invdistEllipse(nodes: DataFrame, pts: DataFrame,
                     radius1: Double, radius2: Double, angleDeg: Double,
                     power: Double = 2.0, smoothing: Double = 0.0,
                     minPoints: Int = 0): DataFrame = {
    val rmax = math.max(radius1, radius2)
    val cosA = math.cos(angleDeg * math.Pi / 180.0)
    val sinA = math.sin(angleDeg * math.Pi / 180.0)
    val r1sq = radius1 * radius1; val r2sq = radius2 * radius2
    val dx = col("lon") - col("nlon"); val dy = col("lat") - col("nlat")
    val rx = dx * lit(cosA) + dy * lit(sinA)
    val ry = dy * lit(cosA) - dx * lit(sinA)
    val cand = radiusCandidates(nodes, pts, rmax)
      .where(lit(r2sq) * rx * rx + lit(r1sq) * ry * ry <= lit(r1sq * r2sq))
      .withColumn("r2s", col("dist2") + lit(smoothing * smoothing))
    val invw =
      if (power == 2.0) lit(1.0) / col("r2s")
      else lit(1.0) / pow(col("r2s"), lit(power / 2.0))
    val metrics = cand
      .withColumn("invw", invw)
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("invw") * col("value")).as("nom"),
        sum(col("invw")).as("den"),
        min(when(col("r2s") < 1e-13, struct(col("pid"), col("value")))).as("sing"))
      .withColumn("value",
        when(col("sing").isNotNull, col("sing.value"))
          .when(col("n") < minPoints || col("den") === 0.0, lit(null))
          .otherwise(col("nom") / col("den")))
      .select("i", "j", "n", "value")
    nodes.select("i", "j").join(metrics, Seq("i", "j"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** Per-quadrant IDW (gdal_grid min_points_per_quadrant /
    * max_points_per_quadrant;
    * GDALGridInverseDistanceToAPowerNearestNeighborPerQuadrant,
    * alg/gdalgrid.cpp:351-480): candidates split into the four quadrants
    * around the node (iQuadrant = (dx≥0) | (dy≥0)<<1, :408), each quadrant
    * keeps its `maxPerQuadrant` nearest (by smoothed distance, pid
    * tie-break), and the node is NODATA unless every quadrant kept at
    * least `minPerQuadrant` (:463-470). With no global maxPoints cap the
    * reference's round-robin interleave selects exactly the per-quadrant
    * nearest sets, so the formulation is order-free. Same coincident-point
    * singularity (min-pid) and weight (1/r2s^(power/2)) as [[invdist]]. */
  def invdistPerQuadrant(nodes: DataFrame, pts: DataFrame, radius: Double,
                         power: Double = 2.0, smoothing: Double = 0.0,
                         minPoints: Int = 0, minPerQuadrant: Int = 0,
                         maxPerQuadrant: Int = 0): DataFrame = {
    val cand0 = radiusCandidates(nodes, pts, radius)
      .withColumn("r2s", col("dist2") + lit(smoothing * smoothing))
      .withColumn("quad",
        (when(col("lon") - col("nlon") >= 0.0, 1).otherwise(0) +
         when(col("lat") - col("nlat") >= 0.0, 2).otherwise(0)))
    val w = Window.partitionBy("i", "j", "quad").orderBy(col("r2s"), col("pid"))
    val ranked = cand0.withColumn("qrk", row_number().over(w))
    val kept = if (maxPerQuadrant > 0) ranked.where(col("qrk") <= maxPerQuadrant)
               else ranked
    val invw =
      if (power == 2.0) lit(1.0) / col("r2s")
      else lit(1.0) / pow(col("r2s"), lit(power / 2.0))
    val metrics = kept
      .withColumn("invw", invw)
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("invw") * col("value")).as("nom"),
        sum(col("invw")).as("den"),
        min(when(col("r2s") < 1e-13, struct(col("pid"), col("value")))).as("sing"),
        count(when(col("quad") === 0, 1)).as("n0"),
        count(when(col("quad") === 1, 1)).as("n1"),
        count(when(col("quad") === 2, 1)).as("n2"),
        count(when(col("quad") === 3, 1)).as("n3"))
      .withColumn("qok",
        if (minPerQuadrant > 0)
          col("n0") >= minPerQuadrant && col("n1") >= minPerQuadrant &&
          col("n2") >= minPerQuadrant && col("n3") >= minPerQuadrant
        else lit(true))
      .withColumn("value",
        when(col("sing").isNotNull, col("sing.value"))
          .when(!col("qok") || col("n") < minPoints || col("den") === 0.0, lit(null))
          .otherwise(col("nom") / col("den")))
      .select("i", "j", "n", "value")
    nodes.select("i", "j").join(metrics, Seq("i", "j"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** gdal_grid data-metric algorithms (-a minimum/maximum/range/count/
    * average_distance; GDALGridDataMetricMinimum..AverageDistance,
    * alg/gdalgrid.cpp:1024-1171,1937 and the average-distance accumulator
    * above :995): per node over the search circle — min/max/range of
    * values, member count, and the mean node→point distance; fewer than
    * minPoints members → nodata (null). `cnt` is the COUNT METRIC (null
    * under minPoints like every other metric, gdalgrid.cpp:1937-1940);
    * `n` is the raw member count kept as bookkeeping (0 for empty nodes).
    * Same one-equi-join candidate shape as the interpolators. */
  def dataMetrics(nodes: DataFrame, pts: DataFrame, radius: Double,
                  minPoints: Int = 0): DataFrame =
    metricAgg(nodes, radiusCandidates(nodes, pts, radius), minPoints)

  /** Elliptical-window data metrics — the reference's metric functions all
    * carry the same rotated-ellipse membership test as the interpolators
    * (e.g. GDALGridDataMetricCount, alg/gdalgrid.cpp:1888-1931); this is
    * the dfRadius1/dfRadius2/dfAngle path of [[dataMetrics]], candidate
    * cells sized by the bounding circle like [[invdistEllipse]]. */
  def dataMetricsEllipse(nodes: DataFrame, pts: DataFrame,
                         radius1: Double, radius2: Double, angleDeg: Double,
                         minPoints: Int = 0): DataFrame = {
    val rmax = math.max(radius1, radius2)
    val cosA = math.cos(angleDeg * math.Pi / 180.0)
    val sinA = math.sin(angleDeg * math.Pi / 180.0)
    val r1sq = radius1 * radius1; val r2sq = radius2 * radius2
    val dx = col("lon") - col("nlon"); val dy = col("lat") - col("nlat")
    val rx = dx * lit(cosA) + dy * lit(sinA)
    val ry = dy * lit(cosA) - dx * lit(sinA)
    val cand = radiusCandidates(nodes, pts, rmax)
      .where(lit(r2sq) * rx * rx + lit(r1sq) * ry * ry <= lit(r1sq * r2sq))
    metricAgg(nodes, cand, minPoints)
  }

  private def metricAgg(nodes: DataFrame, cand: DataFrame, minPoints: Int): DataFrame = {
    val m = cand.groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        min("value").as("vmin0"), max("value").as("vmax0"),
        sum(sqrt(col("dist2"))).as("distsum"))
      .withColumn("ok", col("n") >= minPoints)
      .select(col("i"), col("j"), col("n"),
        when(col("ok"), col("n")).as("cnt"),
        when(col("ok"), col("vmin0")).as("vmin"),
        when(col("ok"), col("vmax0")).as("vmax"),
        when(col("ok"), col("vmax0") - col("vmin0")).as("vrange"),
        when(col("ok"), col("distsum") / col("n")).as("avgdist"))
    nodes.select("i", "j").join(m, Seq("i", "j"), "left")
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

  /** Linear (triangulation) gridding — GDALGridLinear
    * (alg/gdalgrid.cpp:2594-2668 + alg/delaunay.c barycentric facets):
    * a node inside the triangulation hull takes λ1·z1 + λ2·z2 + λ3·z3 of
    * its containing Delaunay facet; outside the hull it falls back to
    * nearest-neighbor within `radius` (radius 0 → nodata, the reference's
    * GDALGridNearestNeighbor delegation).
    *
    * Spark shape: the reference triangulates the whole point set on one
    * node; here grid tiles of `tileSize` degrees gather the points of
    * their `halo`-expanded bbox (one equi-join after a bounded explode)
    * and triangulate LOCALLY per tile — the halo trade every distributed
    * stencil uses. Facets whose circumradius exceeds `halo` may differ
    * from the single-node triangulation near tile borders; for any node
    * that falls inside the local hull, piecewise-linear reproduction of
    * affine fields is exact regardless of which valid triangulation the
    * tile built. Per-tile facet lookup goes through a local uniform grid
    * index (the distributed twin of the directed facet walk,
    * GDALTriangulationFindFacetDirected).
    *
    * Returns (i, j, src, value): src = 2 facet interpolation, 1 nearest-
    * neighbor fallback, 0 nodata. */
  def linear(nodes: DataFrame, pts: DataFrame, radius: Double,
             tileSize: Double, halo: Double): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // (tx, ty, isNode, i, j, x, y, z)
    val nodeTagged = nodes.select(
      floor(col("nlon") / tileSize).cast("long").as("tx"),
      floor(col("nlat") / tileSize).cast("long").as("ty"),
      lit(true).as("isNode"), col("i"), col("j"),
      col("nlon").as("x"), col("nlat").as("y"), lit(0.0).as("z"))
    val ptTagged = pts.select(
      explode(sequence(floor((col("lon") - halo) / tileSize).cast("long"),
        floor((col("lon") + halo) / tileSize).cast("long"))).as("tx"),
      col("lon"), col("lat"), col("value"))
      .select(col("tx"),
        explode(sequence(floor((col("lat") - halo) / tileSize).cast("long"),
          floor((col("lat") + halo) / tileSize).cast("long"))).as("ty"),
        col("lon"), col("lat"), col("value"))
      .select(col("tx"), col("ty"), lit(false).as("isNode"),
        lit(-1).cast("int").as("i"), lit(-1).cast("int").as("j"),
        col("lon").as("x"), col("lat").as("y"), col("value").as("z"))
    val eps = -1e-11
    val triRes = nodeTagged.unionByName(ptTagged)
      .as[(Long, Long, Boolean, Int, Int, Double, Double, Double)]
      .groupByKey { case (tx, ty, _, _, _, _, _, _) => (tx, ty) }
      .flatMapGroups { (_, it) =>
        val nodeBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Double)]
        val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
        val zs = scala.collection.mutable.ArrayBuffer.empty[Double]
        it.foreach { case (_, _, isNode, i, j, x, y, z) =>
          if (isNode) nodeBuf += ((i, j, x, y))
          else { xs += x; xs += y; zs += z }
        }
        if (nodeBuf.isEmpty) Iterator.empty
        else {
          val tris = graft.geom.Delaunay.triangulate(xs.toArray).toArray
          val px = xs.toArray
          // local uniform grid over triangle bboxes: facet lookup in O(1)
          // per node instead of a scan over all facets
          val nT = tris.length
          val lookup: (Double, Double) => Int =
            if (nT == 0) (_, _) => -1
            else {
              var minX = Double.MaxValue; var minY = Double.MaxValue
              var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
              var k = 0
              while (k < px.length) {
                if (px(k) < minX) minX = px(k); if (px(k) > maxX) maxX = px(k)
                if (px(k + 1) < minY) minY = px(k + 1); if (px(k + 1) > maxY) maxY = px(k + 1)
                k += 2
              }
              val gridN = math.max(1, math.min(256, math.sqrt(nT.toDouble).toInt))
              val gw = math.max((maxX - minX) / gridN, 1e-300)
              val gh = math.max((maxY - minY) / gridN, 1e-300)
              val cells = Array.fill(gridN * gridN)(List.empty[Int])
              var t = 0
              while (t < nT) {
                val tr = tris(t)
                val txs = Array(px(2 * tr.a), px(2 * tr.b), px(2 * tr.c))
                val tys = Array(px(2 * tr.a + 1), px(2 * tr.b + 1), px(2 * tr.c + 1))
                val c0 = math.max(0, math.min(gridN - 1, ((txs.min - minX) / gw).toInt))
                val c1 = math.max(0, math.min(gridN - 1, ((txs.max - minX) / gw).toInt))
                val r0 = math.max(0, math.min(gridN - 1, ((tys.min - minY) / gh).toInt))
                val r1 = math.max(0, math.min(gridN - 1, ((tys.max - minY) / gh).toInt))
                var r = r0
                while (r <= r1) {
                  var c = c0
                  while (c <= c1) { cells(r * gridN + c) ::= t; c += 1 }
                  r += 1
                }
                t += 1
              }
              (qx: Double, qy: Double) => {
                val c = math.max(0, math.min(gridN - 1, ((qx - minX) / gw).toInt))
                val r = math.max(0, math.min(gridN - 1, ((qy - minY) / gh).toInt))
                var found = -1
                var lst = cells(r * gridN + c)
                while (found < 0 && lst.nonEmpty) {
                  val t0 = lst.head; lst = lst.tail
                  val tr = tris(t0)
                  val x1 = px(2 * tr.a); val y1 = px(2 * tr.a + 1)
                  val x2 = px(2 * tr.b); val y2 = px(2 * tr.b + 1)
                  val x3 = px(2 * tr.c); val y3 = px(2 * tr.c + 1)
                  val det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
                  if (det != 0.0) {
                    val l1 = ((y2 - y3) * (qx - x3) + (x3 - x2) * (qy - y3)) / det
                    val l2 = ((y3 - y1) * (qx - x3) + (x1 - x3) * (qy - y3)) / det
                    val l3 = 1.0 - l1 - l2
                    if (l1 >= eps && l2 >= eps && l3 >= eps) found = t0
                  }
                }
                found
              }
            }
          nodeBuf.iterator.map { case (i, j, qx, qy) =>
            val t = lookup(qx, qy)
            if (t < 0) (i, j, 0, Option.empty[Double])
            else {
              val tr = tris(t)
              val x1 = px(2 * tr.a); val y1 = px(2 * tr.a + 1)
              val x2 = px(2 * tr.b); val y2 = px(2 * tr.b + 1)
              val x3 = px(2 * tr.c); val y3 = px(2 * tr.c + 1)
              val det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
              val l1 = ((y2 - y3) * (qx - x3) + (x3 - x2) * (qy - y3)) / det
              val l2 = ((y3 - y1) * (qx - x3) + (x1 - x3) * (qy - y3)) / det
              val l3 = 1.0 - l1 - l2
              (i, j, 2, Some(l1 * zs(tr.a) + l2 * zs(tr.b) + l3 * zs(tr.c)))
            }
          }
        }
      }
      .toDF("i", "j", "src", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (radius == 0.0) triRes
    else {
      // outside-hull fallback: nearest neighbor within radius
      // (GDALGridNearestNeighbor delegation, alg/gdalgrid.cpp:2645-2664)
      val misses = triRes.where(col("src") === 0).select("i", "j")
        .join(nodes, Seq("i", "j"))
      val w = Window.partitionBy("i", "j").orderBy(col("dist2"), col("pid"))
      val nn = radiusCandidates(misses, pts, radius)
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("i"), col("j"), lit(1).as("src"), col("value"))
      triRes.where(col("src") === 2)
        .unionByName(nn)
        .unionByName(
          triRes.where(col("src") === 0).select("i", "j")
            .join(nn.select("i", "j"), Seq("i", "j"), "left_anti")
            .select(col("i"), col("j"), lit(0).as("src"),
              lit(null).cast("double").as("value")))
    }
  }
}
