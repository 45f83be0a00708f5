package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** GNM-style network analysis (reference: GNMGraph::DijkstraShortestPath /
  * ConnectedComponents, /root/reference/gnm/gnmgraph.cpp:185-244 and
  * gnmgenericnetwork.cpp:804-860). GDAL runs a priority-queue Dijkstra on
  * one machine; the Spark-native equivalent is synchronous parallel edge
  * relaxation (Bellman–Ford / Pregel shape): per round ONE join of the
  * frontier against the edge table + a min-aggregate, converging in
  * diameter rounds. Same fixpoint as Dijkstra for non-negative weights;
  * at 100 TB the edge table is the big side and each round is a bounded
  * pair of shuffles — no driver-side graph state. */
object GraphOps {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def warnNoConverge(what: String, it: Int): Unit =
    log.warn(s"$what stopped at maxIter=$it with changes still pending; " +
      "results may be partially relaxed — raise maxIter")

  /** Single-source shortest distances. `edges` needs (src, dst, w). */
  def shortestPaths(edges: DataFrame, source: Long, maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("double")).cache()
    var dist = Seq((source, 0.0)).toDF("node", "dist").cache()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true) // cut lineage; frames stay diameter-bounded
      changed = next.as("n").join(dist.as("o"), Seq("node"), "left")
        .where(col("o.dist").isNull || col("n.dist") < col("o.dist")).count() +
        (next.count() - dist.count())
      dist.unpersist()
      dist = next
      it += 1
    }
    if (changed > 0) warnNoConverge("shortestPaths", it)
    dist
  }

  /** Undirected connected components via alternating large-star /
    * small-star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): component id = MIN node id reachable — the same
    * output contract as hash-min label propagation, but convergence is
    * O(log n) ROUNDS INDEPENDENT OF GRAPH DIAMETER. Hash-min needs
    * O(diameter) rounds, and the adversarial case the distributed merge
    * path exists for (stripe/snake rasters whose label graph is one long
    * path) has diameter proportional to the raster perimeter — exactly
    * the input that would blow a fixed round cap. Star operations double
    * the "reach" of the minimum each alternation instead of extending it
    * by one hop.
    *
    * Each round is two agg+join passes (no collect_list — per-node minima
    * via groupBy.min, then a join back onto the edge list), so per-round
    * cost is a bounded number of shuffles on the CURRENT edge set, which
    * the paper proves never grows beyond 2·|E| and shrinks geometrically.
    *
    * Non-convergence within maxIter now THROWS (IllegalStateException)
    * rather than warning: four shipped operators (polygonize, sieve,
    * nearblack, near-dup clustering) consume these labels, and a
    * partially-merged result is silent data corruption. With O(log n)
    * convergence, maxIter=64 covers graphs of ~2^64 nodes, so hitting the
    * cap means a bug, not a big input.
    *
    * `edges` needs (src, dst); direction is ignored. Returns (node, comp)
    * covering every node that appears in an edge. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val raw = edges.select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
    // every node that appears in ANY edge (incl. self-loops) must be labeled
    val nodes = raw.select(col("s").as("node"))
      .union(raw.select(col("d").as("node"))).distinct().localCheckpoint(true)
    // canonical undirected edge form (hi > lo); self-loops dropped
    var e = raw.where(col("s") =!= col("d"))
      .select(greatest(col("s"), col("d")).as("hi"), least(col("s"), col("d")).as("lo"))
      .distinct().localCheckpoint(true)
    var it = 0
    var converged = e.isEmpty
    while (!converged && it < maxIter) {
      // large-star: group by each node u over BOTH directions; every
      // strictly-larger neighbor v of u re-attaches to m(u) = min(N(u) ∪ {u}).
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val lmins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = sym.join(lmins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star: group by the LARGER endpoint u; all (< u) neighbors and
      // u itself re-attach to the minimum neighbor.
      val smins = afterLarge.groupBy("hi").agg(min(col("lo")).as("m"))
      val half = afterLarge.join(smins, "hi")
      val next = half.where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(half.select(col("hi"), col("m").as("lo")))
        .distinct().localCheckpoint(true)
      // converged when the canonical edge set is a fixpoint (stars only)
      converged =
        next.count() == e.count() &&
        next.join(e, Seq("hi", "lo"), "left_anti").isEmpty
      e.unpersist()
      e = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in maxIter=$maxIter star rounds; " +
        "this indicates a bug (star convergence is O(log n) rounds)")
    // at the fixpoint each component is a star rooted at its minimum node:
    // children are (hi=child, lo=root); roots and isolated/self-loop nodes
    // label themselves.
    val labels = e.select(col("hi").as("node"), col("lo").as("comp"))
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
  }

  /** Connected components over typed Long edges with an automatic
    * small-graph fast path: when the (deduped) edge list fits the driver
    * budget it is collected and union-found in memory; above the budget the
    * distributed hash-min propagation above runs instead, so nothing
    * O(edges) ever reaches the driver. Both paths return every node that
    * appears in an edge, labeled with the MIN node id reachable from it —
    * identical, deterministic output. Used by the polygonize / sieve /
    * nearblack cross-tile merges (their label graphs are perimeter-
    * proportional: usually tiny, unbounded in adversarial stripe rasters).
    * Budget conf: spark.graft.cc.driverLimit (edges; default 2,000,000). */
  def connectedComponentsAuto(edges: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val limit =
      try spark.conf.get("spark.graft.cc.driverLimit", "2000000").toLong
      catch { case _: Exception => 2000000L }
    val e = edges.cache()
    val n = e.limit((limit + 1).min(Int.MaxValue.toLong).toInt).count()
    if (n <= limit) {
      val arr = e.collect()
      val root = new java.util.HashMap[Long, Long]()
      def find(a: Long): Long = {
        var r = a
        while (root.getOrDefault(r, r) != r) r = root.get(r)
        var c = a
        while (root.getOrDefault(c, c) != c) { val nx = root.get(c); root.put(c, r); c = nx }
        r
      }
      arr.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) root.put(rb, ra) else root.put(ra, rb) }
      }
      val nodes = arr.iterator.flatMap(t => Iterator(t._1, t._2)).toArray.distinct
      val out = nodes.map(x => (x, find(x))).toSeq
      e.unpersist()
      out.toDS()
    } else {
      val out = connectedComponents(e.toDF("src", "dst"))
        .select(col("node").cast("long"), col("comp").cast("long"))
        .as[(Long, Long)]
      out
    }
  }

  /** SSSP with parent pointers under node/edge masks — the spur-path
    * primitive for Yen's. Returns the source→target path (node list with
    * the cumulative distance at each node), or None if unreachable.
    * Relaxation is the same diameter-round join+min shape as
    * [[shortestPaths]]; ties pick the lowest parent id so the tree is
    * deterministic. Backtracking is one tiny (single-node filter) job per
    * hop — O(path length), never O(nodes), on the driver. */
  private def ssspPath(e: DataFrame, source: Long, target: Long,
                       removedNodes: Set[Long], removedEdges: Set[(Long, Long)],
                       maxIter: Int): Option[List[(Long, Double)]] = {
    val spark = e.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    var g = e
    if (removedNodes.nonEmpty) {
      val rn = removedNodes.toSeq
      g = g.where(!col("src").isin(rn: _*) && !col("dst").isin(rn: _*))
    }
    if (removedEdges.nonEmpty) {
      val keys = removedEdges.map { case (a, b) => s"${a}_$b" }.toSeq
      g = g.where(!concat_ws("_", col("src"), col("dst")).isin(keys: _*))
    }
    g = g.cache()
    var dist = Seq((source, 0.0, -1L)).toDF("node", "dist", "parent").cache()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val relaxed = dist.join(g, dist("node") === g("src"))
        .select(g("dst").as("node"), (dist("dist") + g("w")).as("dist"),
          dist("node").as("parent"))
      val w = Window.partitionBy("node").orderBy(col("dist"), col("parent"))
      val next = dist.unionByName(relaxed)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1).drop("rk")
        .localCheckpoint(true)
      changed = next.as("n").join(dist.as("o"), Seq("node"), "left")
        .where(col("o.dist").isNull || col("n.dist") < col("o.dist")).count() +
        (next.count() - dist.count())
      dist.unpersist()
      dist = next
      it += 1
    }
    if (changed > 0) warnNoConverge("ssspPath", it)
    val out = backtrackPath(dist, source, target)
    dist.unpersist(); g.unpersist()
    out
  }

  /** Backtrack the parent-pointer tree from `target` to `source` in TWO
    * Spark jobs total (round-4 verdict #8 — the per-hop `where(node ===
    * n).collect()` loop was one job per path hop, 10⁴ sequential jobs for
    * a 10⁴-hop path): (1) look up the target's (dist, parent); (2) collect
    * the parent SUB-map of nodes with dist ≤ dist(target) once — every
    * on-path node satisfies that by monotonicity of the shortest-path
    * tree — then walk pointers in memory. The collect is guarded by
    * `spark.graft.sssp.backtrackLimit` (default 4M rows ≈ 100 MB) and
    * REFUSES loudly above it, the repo's report-and-refuse pattern; GNM
    * inputs (road/utility networks) sit far below. `dist` columns:
    * (node, dist, parent). */
  private[graft] def backtrackPath(dist: DataFrame, source: Long,
                                   target: Long): Option[List[(Long, Double)]] = {
    dist.where(col("node") === target).collect().headOption.map { r =>
      val (tc, tp) = (r.getDouble(1), r.getLong(2))
      val limit = dist.sparkSession.conf
        .getOption("spark.graft.sssp.backtrackLimit").map(_.toLong).getOrElse(4000000L)
      val sub = dist.where(col("dist") <= tc)
        .select(col("node"), col("dist"), col("parent"))
      if (sub.count() > limit) throw new IllegalStateException(
        s"ssspPath backtrack: settled set below dist($target)=$tc exceeds " +
          s"spark.graft.sssp.backtrackLimit=$limit rows; raise the limit " +
          "or reduce the graph")
      val arr = sub.collect()
      val pm = arr.iterator.map(x => x.getLong(0) -> (x.getDouble(1), x.getLong(2))).toMap
      var path = List((target, tc))
      var cur = target; var par = tp
      while (cur != source) {
        val (d, p2) = pm(par)
        path = (par, d) :: path
        cur = par; par = p2
      }
      path
    }
  }

  /** Yen's K shortest loopless paths (GNMGraph::KShortestPaths,
    * /root/reference/gnm/gnmgraph.cpp:247-420): k−1 rounds of spur-node
    * deviation search over the distributed SSSP primitive. Driver state is
    * O(k · path-length) — the found paths and candidate heap only; every
    * shortest-path computation is the cluster-side relaxation above (the
    * reference masks edges by infinity-cost assignment; we mask by
    * broadcastable filter sets, same effect). Candidate ties break on
    * (cost, path) so results are deterministic. Returns up to k
    * (path-nodes, total-cost) tuples, cost ascending. */
  def kShortestPaths(edges: DataFrame, source: Long, target: Long, k: Int,
                     maxIter: Int = 64): Seq[(Seq[Long], Double)] = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("double")).cache()
    val a = scala.collection.mutable.ArrayBuffer[List[(Long, Double)]]()
    ssspPath(e, source, target, Set.empty, Set.empty, maxIter) match {
      case Some(p) => a += p
      case None => e.unpersist(); return Seq.empty
    }
    // candidates: (cost, node list with cum dists), deduped by node list
    val b = scala.collection.mutable.Map[List[Long], List[(Long, Double)]]()
    var ki = 1
    while (ki < k && (b.nonEmpty || ki == a.length)) {
      val prev = a(ki - 1)
      var i = 0
      while (i < prev.length - 1) {
        val root = prev.take(i + 1)
        val rootNodes = root.map(_._1)
        val spur = rootNodes.last
        val rootCost = root.last._2
        // remove the edge that follows the spur node in every found path
        // sharing this root (ensures a different continuation) …
        val removedEdges = a.iterator
          .filter(p => p.length > i + 1 && p.take(i + 1).map(_._1) == rootNodes)
          .map(p => (p(i)._1, p(i + 1)._1)).toSet
        // … and the root nodes except the spur (ensures looplessness)
        val removedNodes = rootNodes.dropRight(1).toSet
        ssspPath(e, spur, target, removedNodes, removedEdges, maxIter).foreach { sp =>
          val shifted = sp.map { case (n, d) => (n, d + rootCost) }
          val cand = root.dropRight(1) ++ shifted
          val nodesOnly = cand.map(_._1)
          if (!a.exists(_.map(_._1) == nodesOnly)) b.getOrElseUpdate(nodesOnly, cand)
        }
        i += 1
      }
      if (b.isEmpty) { ki = k } // no more deviations: stop
      else {
        val best = b.minBy { case (nodes, path) =>
          (path.last._2, nodes.mkString("-")) }
        b.remove(best._1)
        a += best._2
        ki += 1
      }
    }
    e.unpersist()
    a.toSeq.map(p => (p.map(_._1), p.last._2))
  }
}
