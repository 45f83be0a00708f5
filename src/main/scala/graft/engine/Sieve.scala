package graft.engine

import org.apache.spark.sql.Dataset

/** Distributed sieve filter: raster polygons (4-connected equal-value
  * components) smaller than a threshold are absorbed into their largest
  * neighbor, smallest-first, until none remain (SURVEY.md §2.G `sieve`).
  *
  * Reference: GDALSieveFilter (/root/reference/alg/gdalsievefilter.cpp:178)
  * — polygon enumeration + merge-into-largest-neighbor. Semantics here
  * (documented, deterministic): iterate smallest component first (ties by
  * label); absorb into the neighbor with the largest size (ties by label);
  * absorbed pixels take the absorber's value; components that become
  * same-value adjacent coalesce. Isolated small components are kept.
  *
  * Distribution: reuses the Polygonize shape — per-tile CCL, cross-tile
  * same-value union + cross-value adjacency from border strips, in-tile
  * cross-value adjacency from the CCL pass; the component graph
  * (O(boundary), not O(pixels)) is merged on the driver with the pure
  * `mergePolicy`, and a broadcast label→value map rewrites the tiles in a
  * final narrow pass. Output raster is invariant to the tiling.
  */
object Sieve {

  /** Pure merge policy over the component graph. Returns label → final
    * value after all merges. */
  def mergePolicy(comps0: Map[Long, (Double, Long)],
                  edges0: Set[(Long, Long)], threshold: Long): Map[Long, Double] = {
    val value = scala.collection.mutable.HashMap[Long, Double](comps0.map { case (l, vs) => l -> vs._1 }.toSeq: _*)
    val size = scala.collection.mutable.HashMap[Long, Long](comps0.map { case (l, vs) => l -> vs._2 }.toSeq: _*)
    val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.Set[Long]]()
    def link(a: Long, b: Long): Unit = {
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
    }
    edges0.foreach { case (a, b) => link(a, b) }
    // alias: absorbed label -> surviving label
    val alias = scala.collection.mutable.HashMap[Long, Long]()
    def find(l: Long): Long = {
      var r = l
      while (alias.contains(r)) r = alias(r)
      r
    }
    def mergeInto(src: Long, dst: Long): Unit = {
      alias(src) = dst
      size(dst) = size(dst) + size(src)
      size.remove(src); value.remove(src)
      val srcAdj = adj.remove(src).getOrElse(scala.collection.mutable.Set.empty)
      srcAdj.foreach { n0 =>
        val n = find(n0)
        adj.get(n).foreach(_.remove(src))
        if (n != dst) link(n, dst)
      }
      adj.get(dst).foreach(_.remove(src))
    }
    def coalesceSameValue(l: Long): Unit = {
      var changed = true
      while (changed) {
        changed = false
        val ns = adj.getOrElse(l, scala.collection.mutable.Set.empty)
          .map(find).filter(n => n != l && value.get(n) == value.get(l))
        if (ns.nonEmpty) {
          // absorb same-value neighbors into the smaller label
          ns.toSeq.sorted.foreach { n =>
            if (find(n) != find(l)) {
              val keep = math.min(l, n); val drop = math.max(l, n)
              // keep label min for determinism; value identical
              if (keep == l) mergeInto(drop, l)
              else { mergeInto(l, keep); return coalesceSameValue(keep) }
              changed = true
            }
          }
        }
      }
    }
    val frozen = scala.collection.mutable.Set[Long]()
    var done = false
    while (!done) {
      val cand = size.iterator
        .filter { case (l, s) => s < threshold && !frozen(l) }
        .toSeq.sortBy { case (l, s) => (s, l) }
      if (cand.isEmpty) done = true
      else {
        val (c, _) = cand.head
        val ns = adj.getOrElse(c, scala.collection.mutable.Set.empty)
          .map(find).filter(_ != c)
        if (ns.isEmpty) frozen += c
        else {
          val target = ns.toSeq.sortBy(n => (-size.getOrElse(n, 0L), n)).head
          mergeInto(c, target)
          coalesceSameValue(target)
        }
      }
    }
    // resolve every original label to its final value
    comps0.keys.map(l => l -> value(find(l))).toMap
  }

  /** Sieve a tiled raster; returns the rewritten tiles. `width` = global
    * raster width in pixels. */
  def sieve(tiles: Dataset[Tile], width: Long, threshold: Long): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val t0 = tiles.cache()

    // pass 1 (reuse Polygonize internals): same-value union + components
    val (comps, sameEdges, diffEdges) = componentGraph(t0, width)
    // union same-value cross-tile edges first
    val root = scala.collection.mutable.HashMap[Long, Long]()
    def find(a: Long): Long = {
      var r = a
      while (root.getOrElse(r, r) != r) r = root(r)
      var c = a
      while (root.getOrElse(c, c) != c) { val n = root(c); root(c) = r; c = n }
      r
    }
    sameEdges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) root(rb) = ra else root(ra) = rb }
    }
    val merged = scala.collection.mutable.HashMap[Long, (Double, Long)]()
    comps.foreach { case (l, v, s) =>
      val r = find(l)
      val cur = merged.getOrElse(r, (v, 0L))
      merged(r) = (v, cur._2 + s)
    }
    val adjEdges = diffEdges.map { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      (math.min(ra, rb), math.max(ra, rb))
    }.filter(e => e._1 != e._2).toSet
    val finalValue = mergePolicy(merged.toMap, adjEdges, threshold)
    // original local label -> final value
    val labelValue: Map[Long, Double] =
      comps.map { case (l, v, _) => l -> finalValue(find(l)) }.toMap
    val bc = spark.sparkContext.broadcast(labelValue)

    // final pass: recompute local CCL per tile, rewrite pixel values
    t0.map { t =>
      val (lbl, _, _, _) = localCcl(t, width)
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) { out(i) = bc.value(lbl(i)); i += 1 }
      Tile(t.z, t.x, t.y, t.band, t.w, t.h, out)
    }
  }

  /** Per-tile CCL: (per-pixel global label, comps (label,value,size),
    * in-tile diff-value adjacency, border (strips for cross-tile)). */
  private[engine] def localCcl(t: Tile, width: Long)
      : (Array[Long], Array[(Long, Double, Long)], Array[(Long, Long)],
         Array[(Int, Int, Int, Boolean, Array[Double], Array[Long])]) = {
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
        x += 1
      }
      y += 1
    }
    def globalIdx(x: Int, y: Int): Long =
      (t.y.toLong * h + y) * width + (t.x.toLong * w + x)
    val lblOfRoot = new java.util.HashMap[Int, Long]()
    val valOfRoot = new java.util.HashMap[Int, Double]()
    val sizeOfRoot = new java.util.HashMap[Int, Long]()
    val pixLbl = new Array[Long](w * h)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val r = find(i)
        if (!lblOfRoot.containsKey(r)) { lblOfRoot.put(r, globalIdx(x, y)); valOfRoot.put(r, t.pixels(i)) }
        sizeOfRoot.put(r, sizeOfRoot.getOrDefault(r, 0L) + 1L)
        pixLbl(i) = lblOfRoot.get(r)
        x += 1
      }
      y += 1
    }
    val comps = lblOfRoot.keySet().toArray(Array.empty[Integer]).map { r =>
      (lblOfRoot.get(r.intValue).longValue, valOfRoot.get(r.intValue).doubleValue,
        sizeOfRoot.get(r.intValue).longValue)
    }
    // in-tile diff-value adjacency
    val adjB = scala.collection.mutable.HashSet[(Long, Long)]()
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (x + 1 < w && t.pixels(i) != t.pixels(i + 1))
          adjB += ((math.min(pixLbl(i), pixLbl(i + 1)), math.max(pixLbl(i), pixLbl(i + 1))))
        if (y + 1 < h && t.pixels(i) != t.pixels(i + w))
          adjB += ((math.min(pixLbl(i), pixLbl(i + w)), math.max(pixLbl(i), pixLbl(i + w))))
        x += 1
      }
      y += 1
    }
    def colStrip(x: Int) = {
      val vs = new Array[Double](h); val ls = new Array[Long](h)
      var yy = 0
      while (yy < h) { vs(yy) = t.pixels(yy * w + x); ls(yy) = pixLbl(yy * w + x); yy += 1 }
      (vs, ls)
    }
    def rowStrip(y0: Int) = {
      val vs = new Array[Double](w); val ls = new Array[Long](w)
      var xx = 0
      while (xx < w) { vs(xx) = t.pixels(y0 * w + xx); ls(xx) = pixLbl(y0 * w + xx); xx += 1 }
      (vs, ls)
    }
    val borders = Array(
      { val (vs, ls) = colStrip(w - 1); (t.x, t.y, t.band, true, vs, ls) },
      { val (vs, ls) = colStrip(0); (t.x - 1, t.y, t.band, true, vs, ls) },
      { val (vs, ls) = rowStrip(h - 1); (t.x, t.y, t.band, false, vs, ls) },
      { val (vs, ls) = rowStrip(0); (t.x, t.y - 1, t.band, false, vs, ls) })
    (pixLbl, comps, adjB.toArray, borders)
  }

  /** Distributed component graph: (components, same-value cross-tile
    * edges, diff-value edges incl. in-tile). */
  private def componentGraph(tiles: Dataset[Tile], width: Long)
      : (Array[(Long, Double, Long)], Array[(Long, Long)], Array[(Long, Long)]) = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val per = tiles.map { t =>
      val (_, comps, adjB, borders) = localCcl(t, width)
      (comps, adjB, borders)
    }.cache()
    val comps = per.flatMap(_._1).collect()
    val inTile = per.flatMap(_._2).collect()
    val crossEdges = per.flatMap(_._3)
      .groupByKey(b => (b._1, b._2, b._3, b._4))
      .flatMapGroups { (_, it) =>
        val sides = it.toArray
        if (sides.length < 2) Iterator.empty
        else {
          val (_, _, _, _, v1, l1) = sides(0)
          val (_, _, _, _, v2, l2) = sides(1)
          (0 until v1.length).iterator.map { i =>
            (v1(i) == v2(i), math.min(l1(i), l2(i)), math.max(l1(i), l2(i)))
          }.filter(e => e._2 != e._3)
        }
      }.distinct().collect()
    val same = crossEdges.collect { case (true, a, b) => (a, b) }
    val diff = crossEdges.collect { case (false, a, b) => (a, b) } ++ inTile
    per.unpersist()
    (comps, same, diff)
  }
}
