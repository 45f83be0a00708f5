package graft.engine

import org.apache.spark.sql.Dataset

/** Nearblack: set near-black pixels that are flood-fill-connected to the
  * image collar to exact black (reference: nearblack's border flood fill,
  * /root/reference/apps/nearblack_lib_floodfill.cpp). Interior near-black
  * blobs are preserved — only collar-connected regions are scrubbed.
  *
  * Spark shape (two passes, Polygonize-style merge):
  *  1. per-tile local connected components over the near-black mask
  *     (4-conn, min-index canonical labels) → per-tile border strips +
  *     which local components touch the GLOBAL border;
  *  2. the cross-tile adjacency graph (perimeter-proportional, like the
  *     polygonize label merge) is reduced centrally: components reachable
  *     from a global-border component form the scrub set, broadcast back;
  *  3. rewrite pass recomputes the (deterministic) local labels and fills
  *     scrub-set pixels with `fill`. */
object Nearblack {

  /** Local CC with min-index canonical roots. Returns label array
    * (-1 for non-near pixels). */
  private def localCC(t: Tile, isNear: Double => Boolean): Array[Int] = {
    val n = t.w * t.h
    val parent = new Array[Int](n)
    var i = 0
    while (i < n) { parent(i) = if (isNear(t.pixels(i))) i else -1; i += 1 }
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    var y = 0
    while (y < t.h) {
      var x = 0
      while (x < t.w) {
        val idx = y * t.w + x
        if (parent(idx) >= 0) {
          if (x + 1 < t.w && parent(idx + 1) >= 0) union(idx, idx + 1)
          if (y + 1 < t.h && parent(idx + t.w) >= 0) union(idx, idx + t.w)
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = if (parent(i) >= 0) find(i) else -1; i += 1 }
    out
  }

  /** @param nTilesX,nTilesY full tile-grid extent (global border detection) */
  def nearblack(tiles: Dataset[Tile], nTilesX: Int, nTilesY: Int,
                isNear: Double => Boolean, fill: Double = 0.0): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._

    val cached = tiles.cache()

    // pass 1: per-tile component summary + border strips
    val summaries = cached.map { t =>
      val lab = localCC(t, isNear)
      val onGlobal = scala.collection.mutable.HashSet[Int]()
      def edge(f: Int => Int, len: Int): Array[Int] = Array.tabulate(len)(i => lab(f(i)))
      val top = edge(i => i, t.w)
      val bottom = edge(i => (t.h - 1) * t.w + i, t.w)
      val left = edge(i => i * t.w, t.h)
      val right = edge(i => i * t.w + t.w - 1, t.h)
      if (t.y == 0) top.foreach(r => if (r >= 0) onGlobal += r)
      if (t.y == nTilesY - 1) bottom.foreach(r => if (r >= 0) onGlobal += r)
      if (t.x == 0) left.foreach(r => if (r >= 0) onGlobal += r)
      if (t.x == nTilesX - 1) right.foreach(r => if (r >= 0) onGlobal += r)
      (t.x, t.y, t.w, t.h, onGlobal.toArray, top, bottom, left, right)
    }.collect() // perimeter-proportional: strips + component ids only

    // central merge: nodes = (tileX, tileY, localRoot)
    val parent = scala.collection.mutable.HashMap[(Int, Int, Int), (Int, Int, Int)]()
    def find(a: (Int, Int, Int)): (Int, Int, Int) = {
      var r = a
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = a
      while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: (Int, Int, Int), b: (Int, Int, Int)): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(rb) = ra
    }
    val byTile = summaries.map(s => ((s._1, s._2), s)).toMap
    summaries.foreach { case (tx, ty, w, h, _, _, bottom, _, right) =>
      byTile.get((tx + 1, ty)).foreach { o =>
        var i = 0
        while (i < h) {
          if (right(i) >= 0 && o._8(i) >= 0) // my right col vs their left col
            union((tx, ty, right(i)), (tx + 1, ty, o._8(i)))
          i += 1
        }
      }
      byTile.get((tx, ty + 1)).foreach { o =>
        var i = 0
        while (i < w) {
          if (bottom(i) >= 0 && o._6(i) >= 0) // my bottom row vs their top row
            union((tx, ty, bottom(i)), (tx, ty + 1, o._6(i)))
          i += 1
        }
      }
    }
    val borderRootSet = scala.collection.mutable.HashSet[(Int, Int, Int)]()
    summaries.foreach { case (tx, ty, _, _, onGlobal, _, _, _, _) =>
      onGlobal.foreach(r => borderRootSet += find((tx, ty, r)))
    }
    // scrub set: every (tile, localRoot) whose global root touches border.
    // Local roots appear either in strips or as interior-only components;
    // interior-only components can't be border-connected across tiles
    // unless they touch their own tile border (then they're in a strip).
    val scrub = scala.collection.mutable.HashSet[(Int, Int, Int)]()
    summaries.foreach { case (tx, ty, _, _, onGlobal, top, bottom, left, right) =>
      (top.iterator ++ bottom.iterator ++ left.iterator ++ right.iterator ++ onGlobal.iterator)
        .foreach { r => if (r >= 0 && borderRootSet.contains(find((tx, ty, r)))) scrub += ((tx, ty, r)) }
    }
    val scrubB = spark.sparkContext.broadcast(scrub.toSet)

    // rewrite pass
    cached.map { t =>
      val lab = localCC(t, isNear)
      val sc = scrubB.value
      val out = t.pixels.clone()
      var i = 0
      while (i < out.length) {
        if (lab(i) >= 0 && sc.contains((t.x, t.y, lab(i)))) out(i) = fill
        i += 1
      }
      Tile(t.z, t.x, t.y, t.band, t.w, t.h, out)
    }
  }
}
