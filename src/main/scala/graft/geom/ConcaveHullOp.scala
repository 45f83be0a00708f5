package graft.geom

import scala.collection.mutable.{ArrayBuffer, HashMap, PriorityQueue}

/** Concave hull by edge-length ratio (reference: OGRGeometry::ConcaveHull,
  * ogrgeometry.cpp → GEOS ConcaveHull; algorithm re-derived from the
  * published approach — Park & Oh 2012 / the GEOS hull erosion: Delaunay
  * triangulation, then repeatedly remove the border triangle with the
  * longest border edge while the edge exceeds the target length and the
  * removal keeps every input point on-or-inside the hull).
  *
  * target = minEdge + ratio · (maxEdge − minEdge) over the triangulation's
  * edge lengths (ratio 1 → convex hull, ratio 0 → maximally eroded).
  * Removable = border triangle with exactly ONE border edge whose opposite
  * vertex is interior — this preserves connectivity, creates no holes, and
  * never strands a point outside the hull. */
object ConcaveHullOp {

  def concaveHull(g: Geom, ratio: Double): Geom = {
    val pts = collectPoints(g)
    val n = pts.length / 2
    if (n < 3) return GeoOps.convexHull(g)
    val tris = Delaunay.triangulate(pts)
    if (tris.isEmpty) return GeoOps.convexHull(g)

    def len2(u: Int, v: Int): Double = {
      val dx = pts(2 * u) - pts(2 * v); val dy = pts(2 * u + 1) - pts(2 * v + 1)
      dx * dx + dy * dy
    }
    // edge statistics over the triangulation
    var minE = Double.MaxValue; var maxE = 0.0
    tris.foreach { t =>
      Seq(len2(t.a, t.b), len2(t.b, t.c), len2(t.c, t.a)).foreach { l2 =>
        val l = math.sqrt(l2)
        if (l < minE) minE = l
        if (l > maxE) maxE = l
      }
    }
    val target = minE + math.max(0.0, math.min(1.0, ratio)) * (maxE - minE)

    // live triangle set + edge→triangles adjacency
    val live = scala.collection.mutable.HashSet[Int]()
    val byEdge = HashMap[(Int, Int), ArrayBuffer[Int]]()
    def key(u: Int, v: Int) = if (u < v) (u, v) else (v, u)
    tris.indices.foreach { ti =>
      live += ti
      val t = tris(ti)
      Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { e =>
        byEdge.getOrElseUpdate(key(e._1, e._2), new ArrayBuffer[Int]()) += ti
      }
    }
    def borderEdges(ti: Int): Seq[(Int, Int)] = {
      val t = tris(ti)
      Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).filter { e =>
        byEdge(key(e._1, e._2)).count(live.contains) == 1
      }
    }
    def borderVertices: scala.collection.mutable.HashSet[Int] = {
      val s = scala.collection.mutable.HashSet[Int]()
      live.foreach { ti =>
        borderEdges(ti).foreach { e => s += e._1; s += e._2 }
      }
      s
    }

    // erosion: max-heap of (borderEdgeLen, triIdx); stale entries skipped
    val heap = PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
    def push(ti: Int): Unit = {
      val bes = borderEdges(ti)
      if (bes.length == 1)
        heap.enqueue((math.sqrt(len2(bes.head._1, bes.head._2)), ti))
    }
    live.foreach(push)
    var bv = borderVertices
    while (heap.nonEmpty) {
      val (l, ti) = heap.dequeue()
      if (live.contains(ti) && l > target) {
        val bes = borderEdges(ti)
        if (bes.length == 1 && math.sqrt(len2(bes.head._1, bes.head._2)) == l) {
          val t = tris(ti)
          val opposite = Seq(t.a, t.b, t.c)
            .find(v => v != bes.head._1 && v != bes.head._2).get
          if (!bv.contains(opposite) && live.size > 1) {
            live -= ti
            bv += opposite // now on the border
            // neighbors may have become 1-border-edge candidates
            Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { e =>
              byEdge(key(e._1, e._2)).foreach { nb =>
                if (live.contains(nb)) push(nb)
              }
            }
          }
        }
      }
    }

    // trace the border into a ring
    val succ = HashMap[Int, ArrayBuffer[Int]]()
    live.foreach { ti =>
      val t = tris(ti)
      // orient each triangle CCW so border edges chain consistently
      val orient = (pts(2 * t.b) - pts(2 * t.a)) * (pts(2 * t.c + 1) - pts(2 * t.a + 1)) -
        (pts(2 * t.c) - pts(2 * t.a)) * (pts(2 * t.b + 1) - pts(2 * t.a + 1))
      val (a, b, c) = if (orient >= 0) (t.a, t.b, t.c) else (t.a, t.c, t.b)
      Seq((a, b), (b, c), (c, a)).foreach { e =>
        if (byEdge(key(e._1, e._2)).count(live.contains) == 1)
          succ.getOrElseUpdate(e._1, new ArrayBuffer[Int]()) += e._2
      }
    }
    if (succ.isEmpty) return GeoOps.convexHull(g)
    val start = succ.keys.min
    val ring = new ArrayBuffer[Double]()
    var cur = start
    var guard = 0
    val visited = scala.collection.mutable.HashSet[(Int, Int)]()
    do {
      ring += pts(2 * cur); ring += pts(2 * cur + 1)
      val nexts = succ.getOrElse(cur, ArrayBuffer.empty)
      val nx = nexts.find(v => !visited.contains((cur, v)))
      if (nx.isEmpty) { ring += pts(2 * start); ring += pts(2 * start + 1); cur = start }
      else { visited += ((cur, nx.get)); cur = nx.get }
      guard += 1
    } while (cur != start && guard < 4 * tris.length + 8)
    if (ring.length < 2 || ring(ring.length - 2) != pts(2 * start) ||
        ring(ring.length - 1) != pts(2 * start + 1)) {
      ring += pts(2 * start); ring += pts(2 * start + 1)
    }
    Polygon(Array(ring.toArray))
  }

  private def collectPoints(g: Geom): Array[Double] = {
    val buf = new ArrayBuffer[Double]()
    def walk(x: Geom): Unit = x match {
      case Point(px, py) => if (!px.isNaN) { buf += px; buf += py }
      case LineString(cs) => buf ++= cs
      case p: Polygon => p.rings.foreach(r => buf ++= r.dropRight(2))
      case MultiPoint(ps) => ps.foreach(walk)
      case MultiLineString(ls) => ls.foreach(walk)
      case MultiPolygon(ps) => ps.foreach(walk)
      case GeometryCollection(gs) => gs.foreach(walk)
      case s: Surface => walk(s.toMulti)
    }
    walk(g)
    // dedupe exact duplicates (Delaunay degeneracy guard)
    val seen = scala.collection.mutable.HashSet[(Double, Double)]()
    val out = new ArrayBuffer[Double]()
    var i = 0
    while (i + 1 < buf.length) {
      val k = (buf(i), buf(i + 1))
      if (!seen.contains(k)) { seen += k; out += buf(i); out += buf(i + 1) }
      i += 2
    }
    out.toArray
  }
}
