package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed polygonize: connected components of equal-valued pixels
  * (4-connected GDAL default, 8-connected option) over a tiled raster —
  * per-tile labeling plus
  * cross-tile boundary merge, the classic "crosses tile borders" raster op
  * (SURVEY.md §2.G).
  *
  * Reference: two-pass connected-component polygonizer
  * (/root/reference/alg/polygonize.cpp:455-498, 4/8-connectivity :169-229).
  * Spark shape:
  *   1. per-tile union-find → local components labeled by their MIN global
  *      pixel index (deterministic, mergeable)
  *   2. tiles emit their border strips keyed by the shared edge; one
  *      shuffle pairs facing strips → adjacency edges between labels
  *   3. the label adjacency graph (O(total tile perimeter) — orders of
  *      magnitude smaller than the raster, but unbounded in adversarial
  *      stripe rasters) is resolved by GraphOps.connectedComponentsAuto:
  *      union-find on the driver while it fits the driver budget,
  *      distributed hash-min label propagation beyond it — nothing
  *      O(edges) is ever forced through the driver
  *   4. per-tile component aggregates re-key to their root (join against
  *      the label→root mapping; Catalyst broadcasts it while small) and merge
  * Labels are min-global-pixel-index, so output is invariant to tiling.
  */
case class PolyTileOut(comps: Array[(Long, Double, Long)],
                       borders: Array[(Int, Int, Int, Int, Array[Double], Array[Long])])

object Polygonize {

  /** (label = min global pixel idx, value, size) per component. `width` =
    * global raster width in pixels (for the global index). */
  def components(tiles: Dataset[Tile], width: Long, conn: Int = 4): DataFrame = {
    require(conn == 4 || conn == 8, s"connectivity must be 4 or 8, got $conn")
    val spark = tiles.sparkSession
    import spark.implicits._
    val connB = conn

    // ---- pass 1: per-tile CCL + border strips
    val perTile = tiles.map { t =>
      val w = t.w; val h = t.h
      val parent = Array.tabulate(w * h)(identity)
      def find(a: Int): Int = {
        var r = a
        while (parent(r) != r) r = parent(r)
        var c = a
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      def union(a: Int, b: Int): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          if (x + 1 < w && t.pixels(i) == t.pixels(i + 1)) union(i, i + 1)
          if (y + 1 < h && t.pixels(i) == t.pixels(i + w)) union(i, i + w)
          if (connB == 8) {
            if (x + 1 < w && y + 1 < h && t.pixels(i) == t.pixels(i + w + 1)) union(i, i + w + 1)
            if (x > 0 && y + 1 < h && t.pixels(i) == t.pixels(i + w - 1)) union(i, i + w - 1)
          }
          x += 1
        }
        y += 1
      }
      def globalIdx(x: Int, y: Int): Long =
        (t.y.toLong * h + y) * width + (t.x.toLong * w + x)
      // local root -> global label (min global idx; row-major scan order
      // means the first pixel of a root has the min index)
      val lbl = new java.util.HashMap[Int, Long]()
      val value = new java.util.HashMap[Int, Double]()
      val size = new java.util.HashMap[Int, Long]()
      y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val r = find(i)
          if (!lbl.containsKey(r)) { lbl.put(r, globalIdx(x, y)); value.put(r, t.pixels(i)) }
          size.put(r, size.getOrDefault(r, 0L) + 1L)
          x += 1
        }
        y += 1
      }
      val comps = lbl.keySet().toArray(Array.empty[Integer]).map { r =>
        (lbl.get(r.intValue).longValue, value.get(r.intValue).doubleValue,
          size.get(r.intValue).longValue)
      }
      // border strips: (edgeTx, edgeTy, band, vertical?, values, labels)
      // vertical edge key (tx,ty) = edge between (tx,ty) and (tx+1,ty):
      // left tile emits col w-1, right tile emits col 0 under key (tx-1? )
      def colStrip(x: Int) = {
        val vs = new Array[Double](h); val ls = new Array[Long](h)
        var yy = 0
        while (yy < h) {
          vs(yy) = t.pixels(yy * w + x)
          val g = find(yy * w + x); ls(yy) = lbl.get(g)
          yy += 1
        }
        (vs, ls)
      }
      def rowStrip(y0: Int) = {
        val vs = new Array[Double](w); val ls = new Array[Long](w)
        var xx = 0
        while (xx < w) {
          vs(xx) = t.pixels(y0 * w + xx)
          val g = find(y0 * w + xx); ls(xx) = lbl.get(g)
          xx += 1
        }
        (vs, ls)
      }
      // kinds: 0 = vertical edge, 1 = horizontal edge, 2 = main-diagonal
      // corner (NW/SE tiles), 3 = anti-diagonal corner (NE/SW tiles)
      def corner(x: Int, y: Int) = {
        val g = find(y * w + x)
        (Array(t.pixels(y * w + x)), Array(lbl.get(g).longValue))
      }
      val strips = Array(
        { val (vs, ls) = colStrip(w - 1); (t.x, t.y, t.band, 0, vs, ls) },     // our right edge
        { val (vs, ls) = colStrip(0); (t.x - 1, t.y, t.band, 0, vs, ls) },     // neighbor's right edge
        { val (vs, ls) = rowStrip(h - 1); (t.x, t.y, t.band, 1, vs, ls) },     // our bottom edge
        { val (vs, ls) = rowStrip(0); (t.x, t.y - 1, t.band, 1, vs, ls) }      // neighbor's bottom edge
      )
      val borders =
        if (connB != 8) strips
        else strips ++ Array(
          { val (vs, ls) = corner(w - 1, h - 1); (t.x, t.y, t.band, 2, vs, ls) },    // we are NW
          { val (vs, ls) = corner(0, 0); (t.x - 1, t.y - 1, t.band, 2, vs, ls) },    // we are SE
          { val (vs, ls) = corner(0, h - 1); (t.x - 1, t.y, t.band, 3, vs, ls) },    // we are NE
          { val (vs, ls) = corner(w - 1, 0); (t.x, t.y - 1, t.band, 3, vs, ls) })    // we are SW
      PolyTileOut(comps, borders)
    }.cache()

    // ---- pass 2: adjacency across facing strips
    val edges = perTile.flatMap(_.borders)
      .groupByKey(b => (b._1, b._2, b._3, b._4))
      .flatMapGroups { (_, it) =>
        val sides = it.toArray
        if (sides.length < 2) Iterator.empty
        else {
          // the two facing strips arrive in arbitrary order; labels differ,
          // pair equal-valued aligned pixels
          val (_, _, _, _, v1, l1) = sides(0)
          val (_, _, _, _, v2, l2) = sides(1)
          val offs = if (connB == 8) Seq(-1, 0, 1) else Seq(0)
          (0 until v1.length).iterator.flatMap { i =>
            offs.iterator.map(o => i + o)
              .filter(j => j >= 0 && j < v2.length)
              .filter(j => v1(i) == v2(j) && l1(i) != l2(j))
              .map(j => (math.min(l1(i), l2(j)), math.max(l1(i), l2(j))))
          }
        }
      }.distinct()

    // ---- pass 3: components of the label graph (driver fast path under
    // spark.graft.cc.driverLimit edges, distributed hash-min beyond)
    val mapping = GraphOps.connectedComponentsAuto(edges)
      .toDF("lbl", "root")

    // ---- pass 4: merge component aggregates under root labels. The
    // mapping is perimeter-sized: Catalyst broadcasts it while it is small,
    // shuffles when it is not — either way no driver materialization.
    val out = perTile.flatMap(_.comps)
      .toDF("label", "value", "size")
      .join(mapping, col("label") === col("lbl"), "left")
      .select(coalesce(col("root"), col("label")).as("label"),
        col("value"), col("size"))
      .groupBy("label", "value").agg(sum("size").as("size"))
    out
  }
}
