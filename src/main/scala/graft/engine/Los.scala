package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** GDALIsLineOfSightVisible (reference: alg/los.cpp) — point-to-point line
  * of sight over a DEM, distributed over many queries.
  *
  * Reference semantics mirrored exactly:
  *  - Endpoint pre-checks first: A below terrain → intersection=(xA,yA);
  *    else B below → (xB,yB) (los.cpp:212-222) — B's pre-check wins over any
  *    mid-line obstruction because it runs before the walk.
  *  - A==B after clear pre-checks is visible (los.cpp:225-228).
  *  - Vertical/horizontal lines walk every pixel A..B INCLUSIVE with z
  *    lerped by the axis ratio (los.cpp:255-322).
  *  - Diagonals walk the reference's balance-form Bresenham
  *    (los.cpp:38-110) with z lerped by the euclidean-distance ratio
  *    sqrt(((x-xA)²+(y-yA)²)/((xB-xA)²+(yB-yA)²)) (los.cpp:337-355).
  *  - A pixel exactly at terrain height is visible (z >= terrain); a failed
  *    elevation read (outside the DEM) is blocking (los.cpp:121-133).
  *  - The reported intersection is the FIRST blocking pixel in traversal
  *    order; visible queries report (-1,-1) (los.cpp:205-210).
  *
  * Spark shape for 100 TB: each query expands to its traversal points
  * (bounded by the raster diagonal), which group into per-(query, tile)
  * SEGMENTS — one row per DEM tile the sight line crosses. Segments
  * equi-join the tile table on the tile key (the viewshed disc-pruned
  * gather's shape: DEM rows are never replicated per pixel probe, only per
  * crossing segment), each joined row resolves its segment's pixels in one
  * local pass, and a final per-query min picks the first obstruction.
  * Two shuffles + one equi-join, independent of DEM size. */
object Los {

  final case class LosQuery(qid: Long, xa: Int, ya: Int, za: Double,
                            xb: Int, yb: Int, zb: Double)

  /** Traversal points in reference check order: (step, x, y, zTest).
    * step -2/-1 are the A/B pre-checks (los.cpp:212-222); the walk itself
    * numbers from 0. The pre-check duplicates of A and B carry the same
    * zTest the walk would use, so duplicate evaluation is harmless and the
    * min-step pick reproduces the reference's intersection choice. */
  private[graft] def traversalPoints(q: LosQuery): Seq[(Int, Int, Int, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double)]
    out += ((-2, q.xa, q.ya, q.za))
    out += ((-1, q.xb, q.yb, q.zb))
    def lerp(a: Double, b: Double, t: Double): Double = a + t * (b - a)
    if (q.xa == q.xb && q.ya == q.yb) return out.toSeq
    if (q.xa == q.xb) {
      // vertical inclusive walk, z by y ratio (los.cpp:236-241, 255-286)
      val dir = if (q.ya < q.yb) 1 else -1
      var y = q.ya; var step = 0
      while (y != q.yb + dir) {
        val ratio = (y - q.ya).toDouble / (q.yb - q.ya).toDouble
        out += ((step, q.xa, y, lerp(q.za, q.zb, ratio)))
        y += dir; step += 1
      }
    } else if (q.ya == q.yb) {
      // horizontal inclusive walk, z by x ratio (los.cpp:244-249, 288-322)
      val dir = if (q.xa < q.xb) 1 else -1
      var x = q.xa; var step = 0
      while (x != q.xb + dir) {
        val ratio = (x - q.xa).toDouble / (q.xb - q.xa).toDouble
        out += ((step, x, q.ya, lerp(q.za, q.zb, ratio)))
        x += dir; step += 1
      }
    } else {
      // balance-form Bresenham (los.cpp:38-110) with euclidean z ratio
      def zAt(x: Int, y: Int): Double = {
        def sq(d: Double) = d * d
        val rNum = sq((x - q.xa).toDouble) + sq((y - q.ya).toDouble)
        val rDenom = sq((q.xb - q.xa).toDouble) + sq((q.yb - q.ya).toDouble)
        lerp(q.za, q.zb, math.sqrt(rNum / rDenom))
      }
      val (dx0, incx) = if (q.xb >= q.xa) (q.xb - q.xa, 1) else (q.xa - q.xb, -1)
      val (dy0, incy) = if (q.yb >= q.ya) (q.yb - q.ya, 1) else (q.ya - q.yb, -1)
      var x = q.xa; var y = q.ya; var step = 0
      if (dx0 >= dy0) {
        val dy2 = dy0 << 1; var balance = dy2 - dx0; val dx2 = dx0 * 2
        while (x != q.xb) {
          out += ((step, x, y, zAt(x, y)))
          if (balance >= 0) { y += incy; balance -= dx2 }
          balance += dy2; x += incx; step += 1
        }
        out += ((step, x, y, zAt(x, y)))
      } else {
        val dx2 = dx0 * 2; var balance = dx2 - dy0; val dy2 = dy0 * 2
        while (y != q.yb) {
          out += ((step, x, y, zAt(x, y)))
          if (balance >= 0) { x += incx; balance -= dy2 }
          balance += dx2; y += incy; step += 1
        }
        out += ((step, x, y, zAt(x, y)))
      }
    }
    out.toSeq
  }

  /** Many-query LOS against a tiled DEM. Returns one row per query:
    * (qid, visible, ix, iy) with ix=iy=-1 when visible. */
  def lineOfSight(tiles: Dataset[Tile], queries: Dataset[LosQuery],
                  tileSize: Int = Raster.TileSize): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._

    // expand → per-(query, tile) segments: one shuffle, segment size bounded
    // by the tile edge
    val segs = queries.flatMap { q =>
      traversalPoints(q).map { case (step, x, y, z) => (q.qid, step, x, y, z) }
    }.toDF("qid", "step", "px", "py", "z")

    val tsz = tileSize
    val seggrp = segs
      .withColumn("tx", floor(col("px") / tsz).cast("int"))
      .withColumn("ty", floor(col("py") / tsz).cast("int"))
      .groupBy("qid", "tx", "ty")
      .agg(collect_list(struct(col("step"), col("px"), col("py"), col("z"))).as("pts"))

    val demDF = tiles.toDF().select(col("x").as("tx"), col("y").as("ty"),
      col("w"), col("pixels"))

    // equi-join on the tile key; a segment outside the DEM keeps null pixels
    val joined = seggrp.join(demDF, Seq("tx", "ty"), "left_outer")

    // local pass per segment: first blocking step in this tile
    val hitOf = udf((tx: Int, ty: Int, w: Int, pixels: Seq[Double],
                     pts: Seq[org.apache.spark.sql.Row]) => {
      var best: (Int, Int, Int) = null
      pts.foreach { r =>
        val step = r.getInt(0); val x = r.getInt(1); val y = r.getInt(2)
        val z = r.getDouble(3)
        val blocked =
          if (pixels == null) true // elevation read failed (los.cpp:129-132)
          else {
            val cx = x - tx * w; val cy = y - ty * w
            if (cx < 0 || cy < 0 || cx >= w || cy >= w) true
            else !(z >= pixels(cy * w + cx))
          }
        if (blocked && (best == null || step < best._1)) best = (step, x, y)
      }
      if (best == null) null else best
    })

    joined
      .withColumn("hit", hitOf(col("tx"), col("ty"),
        coalesce(col("w"), lit(tsz)), col("pixels"), col("pts")))
      .groupBy("qid")
      .agg(min(col("hit")).as("hit"))
      .select(col("qid"),
        col("hit").isNull.as("visible"),
        coalesce(col("hit._2"), lit(-1)).as("ix"),
        coalesce(col("hit._3"), lit(-1)).as("iy"))
  }
}
