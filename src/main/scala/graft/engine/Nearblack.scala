package graft.engine

import org.apache.spark.sql.Dataset

/** Nearblack: set near-black pixels that are flood-fill-connected to the
  * image collar to exact black (reference: nearblack's border flood fill,
  * /root/reference/apps/nearblack_lib_floodfill.cpp). Interior near-black
  * blobs are preserved — only collar-connected regions are scrubbed.
  *
  * Spark shape (fully distributed; nothing O(pixels) or O(perimeter)
  * reaches the driver):
  *  1. per-tile local connected components over the near-black mask
  *     (4-conn), labeled by their MIN global pixel index (deterministic,
  *     tiling-invariant);
  *  2. tiles emit border strips keyed by the shared tile edge; one shuffle
  *     pairs facing strips into label-adjacency edges, plus edges from a
  *     virtual collar node (-1) to every component touching the GLOBAL
  *     border — the edge list is deduped distributively;
  *  3. GraphOps.connectedComponentsAuto resolves components (driver
  *     union-find while the edge list fits the budget, distributed
  *     hash-min beyond). Because hash-min labels a component with its MIN
  *     reachable node, collar-connected components are exactly those whose
  *     component id is -1 — the scrub set, kept as a Dataset;
  *  4. scrub labels route back to their owning tile (decoded from the
  *     label's pixel index) and a cogroup rewrite fills them — no global
  *     broadcast of the scrub set.
  *
  * Assumes a uniform tile grid and a single band (labels are global pixel
  * indices; two bands would collide — callers sieve one band at a time). */
object Nearblack {

  /** Local CC with labels = global pixel index of each component's first
    * (row-major min) pixel. Returns label array (-1 for non-near pixels). */
  private def localCC(t: Tile, isNear: Double => Boolean, width: Long): Array[Long] = {
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
    // relabel roots to global pixel indices (first pixel in row-major scan
    // has the min global index for its component within this tile)
    val lblOfRoot = new java.util.HashMap[Int, Long]()
    val out = new Array[Long](n)
    y = 0
    while (y < t.h) {
      var x = 0
      while (x < t.w) {
        val idx = y * t.w + x
        if (parent(idx) >= 0) {
          val r = find(idx)
          if (!lblOfRoot.containsKey(r))
            lblOfRoot.put(r, (t.y.toLong * t.h + y) * width + (t.x.toLong * t.w + x))
          out(idx) = lblOfRoot.get(r)
        } else out(idx) = -1L
        x += 1
      }
      y += 1
    }
    out
  }

  /** @param nTilesX,nTilesY full tile-grid extent (global border detection) */
  def nearblack(tiles: Dataset[Tile], nTilesX: Int, nTilesY: Int,
                isNear: Double => Boolean, fill: Double = 0.0): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._

    val cached = tiles.cache()
    val dims = cached.limit(1).collect() // uniform-grid tile dims (bounded: 1 row)
    if (dims.isEmpty) return cached
    val tileW = dims(0).w; val tileH = dims(0).h
    val width = nTilesX.toLong * tileW
    val nearF = isNear
    val ntx = nTilesX; val nty = nTilesY

    // pass 1: records = border strips (kind 0 vertical / 1 horizontal,
    // keyed by the shared edge) + global-collar labels (kind 2)
    val recs = cached.flatMap { t =>
      val lab = localCC(t, nearF, width)
      val w = t.w; val h = t.h
      def strip(f: Int => Int, len: Int): Array[Long] = Array.tabulate(len)(i => lab(f(i)))
      val buf = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Array[Long])]()
      buf += ((t.x, t.y, 0, strip(i => i * w + w - 1, h)))   // our right edge
      buf += ((t.x - 1, t.y, 0, strip(i => i * w, h)))       // neighbor's right edge
      buf += ((t.x, t.y, 1, strip(i => (h - 1) * w + i, w))) // our bottom edge
      buf += ((t.x, t.y - 1, 1, strip(i => i, w)))           // neighbor's bottom edge
      val collar = scala.collection.mutable.HashSet[Long]()
      if (t.y == 0) strip(i => i, w).foreach(l => if (l >= 0) collar += l)
      if (t.y == nty - 1) strip(i => (h - 1) * w + i, w).foreach(l => if (l >= 0) collar += l)
      if (t.x == 0) strip(i => i * w, h).foreach(l => if (l >= 0) collar += l)
      if (t.x == ntx - 1) strip(i => i * w + w - 1, h).foreach(l => if (l >= 0) collar += l)
      if (collar.nonEmpty) buf += ((t.x, t.y, 2, collar.toArray))
      buf.iterator
    }

    // pass 2: label adjacency (facing strips) + collar edges, deduped
    val edges = recs.groupByKey(r => (r._1, r._2, r._3)).flatMapGroups { (key, it) =>
      if (key._3 == 2) it.flatMap(_._4.iterator.map(l => (-1L, l)))
      else {
        val sides = it.toArray
        if (sides.length < 2) Iterator.empty
        else {
          val l1 = sides(0)._4; val l2 = sides(1)._4
          val m = math.min(l1.length, l2.length)
          (0 until m).iterator
            .filter(i => l1(i) >= 0 && l2(i) >= 0 && l1(i) != l2(i))
            .map(i => (math.min(l1(i), l2(i)), math.max(l1(i), l2(i))))
        }
      }
    }.distinct()

    // pass 3: components; collar-connected ⇔ component id is the virtual
    // node -1 (hash-min labels components by their minimum node)
    val scrub = GraphOps.connectedComponentsAuto(edges)
      .filter(c => c._2 == -1L && c._1 >= 0L).map(_._1)

    // pass 4: route scrub labels to their owning tile, rewrite via cogroup
    val tw = tileW; val th = tileH; val fillB = fill
    val scrubByTile = scrub.groupByKey { l =>
      (((l % width) / tw).toInt, ((l / width) / th).toInt)
    }
    cached.groupByKey(t => (t.x, t.y)).cogroup(scrubByTile) { (_, ts, ss) =>
      val set = new java.util.HashSet[Long]()
      ss.foreach(set.add)
      ts.map { t =>
        if (set.isEmpty) t
        else {
          val lab = localCC(t, nearF, width)
          val out = t.pixels.clone()
          var i = 0
          while (i < out.length) {
            if (lab(i) >= 0 && set.contains(lab(i))) out(i) = fillB
            i += 1
          }
          Tile(t.z, t.x, t.y, t.band, t.w, t.h, out)
        }
      }
    }
  }
}
