package graft.engine

import org.apache.spark.sql.Dataset

/** Distributed sieve filter: raster polygons (4- or 8-connected
  * equal-value components) smaller than a threshold are absorbed into their
  * largest neighbor, smallest-first, until none remain (SURVEY.md §2.G
  * `sieve`; connectivity option as in the reference's nPolyConnectedness).
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
    * raster width in pixels.
    *
    * Scale shape: nothing O(pixels) or O(components) ever reaches the
    * driver. The driver sees only (a) cross-tile border adjacency
    * (perimeter-proportional, same budget Polygonize already spends) and
    * (b) the merge subgraph — components under the size threshold, their
    * incident edges, and the stats of their neighbors. Everything else
    * (per-tile CCL, global size aggregation, edge semi-joins) is
    * distributed. Only absorbed components change value, so the rewrite
    * broadcast carries just those labels. */
  def sieve(tiles: Dataset[Tile], width: Long, threshold: Long,
            conn: Int = 4): Dataset[Tile] = {
    require(conn == 4 || conn == 8, s"connectivity must be 4 or 8, got $conn")
    val spark = tiles.sparkSession
    import spark.implicits._
    val t0 = tiles.cache()

    val per = t0.map { t =>
      val (_, comps, adjB, borders) = localCcl(t, width, conn)
      (comps, adjB, borders)
    }.cache()
    per.count() // materialize once; three downstream consumers

    // cross-tile edges from border strips: perimeter-proportional.
    // 8-conn additionally pairs each strip pixel with its diagonal
    // neighbors (offset ±1 on the facing strip) and the corner points of
    // diagonally-adjacent tiles (kind 2/3 single-pixel strips).
    val connB = conn
    val crossEdges = per.flatMap(_._3)
      .groupByKey(b => (b._1, b._2, b._3, b._4))
      .flatMapGroups { (_, it) =>
        val sides = it.toArray
        if (sides.length < 2) Iterator.empty
        else {
          val (_, _, _, _, v1, l1) = sides(0)
          val (_, _, _, _, v2, l2) = sides(1)
          val offs = if (connB == 8) Seq(-1, 0, 1) else Seq(0)
          (0 until v1.length).iterator.flatMap { i =>
            offs.iterator
              .map(o => i + o)
              .filter(j => j >= 0 && j < v2.length)
              .map(j => (v1(i) == v2(j), math.min(l1(i), l2(j)), math.max(l1(i), l2(j))))
          }.filter(e => e._2 != e._3)
        }
      }.distinct().cache()

    // same-value cross-tile union-find on the driver: the edge list is
    // O(tile perimeter), not O(pixels) — the acceptable driver budget
    val sameEdges = crossEdges.filter(_._1).map(e => (e._2, e._3)).collect()
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
    // path-compress into an immutable broadcastable map (touched labels
    // only). Snapshot the key set BEFORE calling find(): find's path
    // compression writes into `root` and mutable-HashMap iteration is not
    // safe under concurrent value writes (it silently drops entries).
    val rootMap: Map[Long, Long] = {
      val ks = root.keys.toList
      ks.map(l => l -> find(l)).filter(kv => kv._1 != kv._2).toMap
    }
    val bcRoot = spark.sparkContext.broadcast(rootMap)

    // global component stats, aggregated distributively on root labels
    val compStats = per.flatMap(_._1.iterator.map { case (l, v, s) =>
        (bcRoot.value.getOrElse(l, l), v, s)
      })
      .groupByKey(_._1)
      .mapGroups { (l, it) =>
        var v = 0.0; var s = 0L; var first = true
        it.foreach { c => if (first) { v = c._2; first = false }; s += c._3 }
        (l, v, s)
      }.cache()

    // diff-value adjacency on roots, deduped distributively
    val diffEdges = per.flatMap(_._2.iterator)
      .union(crossEdges.filter(!_._1).map(e => (e._2, e._3)))
      .map { e =>
        val ra = bcRoot.value.getOrElse(e._1, e._1)
        val rb = bcRoot.value.getOrElse(e._2, e._2)
        (math.min(ra, rb), math.max(ra, rb))
      }.filter(e => e._1 != e._2).distinct().cache()

    // merge subgraph: components below threshold + incident edges + the
    // stats of every node those edges touch
    val smallIds = compStats.filter(_._3 < threshold).map(_._1).cache()
    val eDf = diffEdges.toDF("a", "b").cache()
    val sA = smallIds.toDF("a"); val sB = smallIds.toDF("b")
    val touchingDf = eDf.join(sA, Seq("a"), "left_semi")
      .unionByName(eDf.join(sB, Seq("b"), "left_semi")).distinct()
    val touching = touchingDf.as[(Long, Long)].collect()
    val nodeIds = (touching.iterator.flatMap(e => Iterator(e._1, e._2)) ++
      smallIds.collect().iterator).toSet
    val bcNodes = spark.sparkContext.broadcast(nodeIds)
    val nodes = compStats.filter(c => bcNodes.value.contains(c._1)).collect()

    val finalValue = mergePolicy(
      nodes.map { case (l, v, s) => l -> (v, s) }.toMap,
      touching.toSet, threshold)
    // only absorbed components change value; broadcast just those
    val origValue = nodes.map { case (l, v, _) => l -> v }.toMap
    val changed: Map[Long, Double] = finalValue.filter { case (l, v) => origValue(l) != v }
    val bcChanged = spark.sparkContext.broadcast(changed)

    per.unpersist(); crossEdges.unpersist(); compStats.unpersist()
    smallIds.unpersist(); eDf.unpersist()

    // final pass: recompute local CCL per tile, rewrite absorbed pixels
    t0.map { t =>
      val (lbl, _, _, _) = localCcl(t, width, connB)
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) {
        val r = bcRoot.value.getOrElse(lbl(i), lbl(i))
        out(i) = bcChanged.value.getOrElse(r, t.pixels(i))
        i += 1
      }
      Tile(t.z, t.x, t.y, t.band, t.w, t.h, out)
    }
  }

  /** Per-tile CCL: (per-pixel global label, comps (label,value,size),
    * in-tile diff-value adjacency, border (strips for cross-tile)). */
  private[engine] def localCcl(t: Tile, width: Long, conn: Int = 4)
      : (Array[Long], Array[(Long, Double, Long)], Array[(Long, Long)],
         Array[(Int, Int, Int, Int, Array[Double], Array[Long])]) = {
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
        if (conn == 8) {
          if (x + 1 < w && y + 1 < h && t.pixels(i) == t.pixels(i + w + 1)) union(i, i + w + 1)
          if (x > 0 && y + 1 < h && t.pixels(i) == t.pixels(i + w - 1)) union(i, i + w - 1)
        }
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
        def diffEdge(j: Int): Unit =
          if (t.pixels(i) != t.pixels(j))
            adjB += ((math.min(pixLbl(i), pixLbl(j)), math.max(pixLbl(i), pixLbl(j))))
        if (x + 1 < w) diffEdge(i + 1)
        if (y + 1 < h) diffEdge(i + w)
        if (conn == 8) {
          if (x + 1 < w && y + 1 < h) diffEdge(i + w + 1)
          if (x > 0 && y + 1 < h) diffEdge(i + w - 1)
        }
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
    // kinds: 0 = vertical edge, 1 = horizontal edge, 2 = main-diagonal
    // corner (NW/SE tiles), 3 = anti-diagonal corner (NE/SW tiles)
    def corner(x: Int, y: Int) =
      (Array(t.pixels(y * w + x)), Array(pixLbl(y * w + x)))
    val strips = Array(
      { val (vs, ls) = colStrip(w - 1); (t.x, t.y, t.band, 0, vs, ls) },
      { val (vs, ls) = colStrip(0); (t.x - 1, t.y, t.band, 0, vs, ls) },
      { val (vs, ls) = rowStrip(h - 1); (t.x, t.y, t.band, 1, vs, ls) },
      { val (vs, ls) = rowStrip(0); (t.x, t.y - 1, t.band, 1, vs, ls) })
    val borders =
      if (conn != 8) strips
      else strips ++ Array(
        { val (vs, ls) = corner(w - 1, h - 1); (t.x, t.y, t.band, 2, vs, ls) },     // we are NW
        { val (vs, ls) = corner(0, 0); (t.x - 1, t.y - 1, t.band, 2, vs, ls) },     // we are SE
        { val (vs, ls) = corner(0, h - 1); (t.x - 1, t.y, t.band, 3, vs, ls) },     // we are NE
        { val (vs, ls) = corner(w - 1, 0); (t.x, t.y - 1, t.band, 3, vs, ls) })     // we are SW
    (pixLbl, comps, adjB.toArray, borders)
  }

}
