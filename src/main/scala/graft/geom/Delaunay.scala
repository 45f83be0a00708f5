package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Bowyer–Watson Delaunay triangulation (public classic algorithm;
  * incremental insertion with a super-triangle). Exact-double in-circle
  * via the standard 3×3 determinant; cocircular degeneracies resolve by
  * insertion order (valid, not unique — documented, as in any
  * non-exact-arithmetic implementation). Input: interleaved (x,y) points;
  * output triangles as index triples into the input. */
object Delaunay {

  final case class Tri(a: Int, b: Int, c: Int)

  def triangulate(pts: Array[Double]): ArrayBuffer[Tri] = {
    val n = pts.length / 2
    if (n < 3) return ArrayBuffer.empty
    // super-triangle enclosing everything
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = Double.MinValue; var maxY = Double.MinValue
    var i = 0
    while (i < n) {
      val x = pts(2 * i); val y = pts(2 * i + 1)
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
      i += 1
    }
    val d = math.max(maxX - minX, maxY - minY) * 10.0 + 1.0
    val cx = (minX + maxX) / 2.0; val cy = (minY + maxY) / 2.0
    // coordinates array extended with the 3 super vertices at n..n+2
    val xs = new Array[Double](n + 3); val ys = new Array[Double](n + 3)
    i = 0
    while (i < n) { xs(i) = pts(2 * i); ys(i) = pts(2 * i + 1); i += 1 }
    xs(n) = cx - 2 * d; ys(n) = cy - d
    xs(n + 1) = cx + 2 * d; ys(n + 1) = cy - d
    xs(n + 2) = cx; ys(n + 2) = cy + 2 * d

    var tris = ArrayBuffer(Tri(n, n + 1, n + 2))

    def inCircumcircle(t: Tri, px: Double, py: Double): Boolean = {
      val ax = xs(t.a) - px; val ay = ys(t.a) - py
      val bx = xs(t.b) - px; val by = ys(t.b) - py
      val ccx = xs(t.c) - px; val ccy = ys(t.c) - py
      val det =
        (ax * ax + ay * ay) * (bx * ccy - ccx * by) -
        (bx * bx + by * by) * (ax * ccy - ccx * ay) +
        (ccx * ccx + ccy * ccy) * (ax * by - bx * ay)
      // orientation of (a,b,c) flips the sign convention
      val orient = (xs(t.b) - xs(t.a)) * (ys(t.c) - ys(t.a)) -
        (xs(t.c) - xs(t.a)) * (ys(t.b) - ys(t.a))
      if (orient > 0) det > 0 else det < 0
    }

    var p = 0
    while (p < n) {
      val px = xs(p); val py = ys(p)
      val bad = tris.filter(t => inCircumcircle(t, px, py))
      if (bad.nonEmpty) {
        // boundary of the cavity: edges appearing exactly once among bad
        val edgeCount = scala.collection.mutable.HashMap[(Int, Int), Int]()
        def key(u: Int, v: Int) = if (u < v) (u, v) else (v, u)
        bad.foreach { t =>
          Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { e =>
            val k = key(e._1, e._2)
            edgeCount(k) = edgeCount.getOrElse(k, 0) + 1
          }
        }
        val badSet = bad.toSet
        tris = tris.filterNot(badSet.contains)
        bad.foreach { t =>
          Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { e =>
            if (edgeCount(key(e._1, e._2)) == 1) tris += Tri(e._1, e._2, p)
          }
        }
      }
      p += 1
    }
    tris.filter(t => t.a < n && t.b < n && t.c < n)
  }
}
