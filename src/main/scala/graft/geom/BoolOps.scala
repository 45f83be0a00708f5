package graft.geom

import java.util.{TreeSet => JTreeSet, PriorityQueue => JPriorityQueue}
import scala.collection.mutable.ArrayBuffer

/** Polygon boolean operations (Intersection / Union / Difference / XOR) via
  * the Martinez–Rueda–Feito plane-sweep (Martinez et al. 2009, "A new
  * algorithm for computing Boolean operations on polygons", Computers &
  * Geosciences 35 — a published, public algorithm; this is an independent
  * Scala implementation of the paper's sweep + edge-coincidence rules).
  *
  * Reference semantics replicated: OGRGeometry::Intersection/Union/
  * Difference/SymDifference (/root/reference/ogr/ogrgeometry.cpp:5318-5874)
  * which GDAL delegates to GEOS — here re-expressed as a from-scratch sweep
  * usable inside a Catalyst expression (per-row, no native library).
  *
  * Scope: linear polygons with holes (Polygon / MultiPolygon), XY only.
  * Degenerate collinear overlaps between the two operands are handled by
  * the paper's SAME/DIFFERENT_TRANSITION edge coincidence; self-overlapping
  * edges within one operand are not supported (match the paper).
  * Robustness is IEEE-double exact-comparison (like the published
  * implementations), not arbitrary-precision — adequate for coordinates
  * that are not adversarially near-degenerate.
  */
object BoolOps {

  final val Intersection = 0
  final val Union = 1
  final val Difference = 2
  final val Xor = 3

  // edge coincidence types (paper §7)
  private final val Normal = 0
  private final val NonContributing = 1
  private final val SameTransition = 2
  private final val DifferentTransition = 3

  private final class Ev(var x: Double, var y: Double, var left: Boolean,
                         val subject: Boolean, var contourId: Int) {
    var other: Ev = _
    var inOut = false
    var otherInOut = false
    var etype: Int = Normal
    var inResult = false
    var pos: Int = -1 // index in result-event array (connect phase)

    def isVertical: Boolean = x == other.x

    /** p strictly below the segment through (this, other)? (left events) */
    def below(px: Double, py: Double): Boolean =
      if (left) signedArea(x, y, other.x, other.y, px, py) > 0
      else signedArea(other.x, other.y, x, y, px, py) > 0

    def above(px: Double, py: Double): Boolean = !below(px, py)
  }

  @inline private def signedArea(x0: Double, y0: Double, x1: Double, y1: Double,
                                 x2: Double, y2: Double): Double =
    (x0 - x2) * (y1 - y2) - (x1 - x2) * (y0 - y2)

  /** Priority-queue ordering (paper fig. 4): x, then y, then right-before-
    * left, then bottom-segment-first, then subject-first. Returns <0 when
    * a is processed before b. */
  private def cmpEv(a: Ev, b: Ev): Int = {
    if (a eq b) return 0
    if (a.x != b.x) return if (a.x < b.x) -1 else 1
    if (a.y != b.y) return if (a.y < b.y) -1 else 1
    if (a.left != b.left) return if (!a.left) -1 else 1
    val sa = signedArea(a.x, a.y, a.other.x, a.other.y, b.other.x, b.other.y)
    if (sa != 0.0) return if (a.below(b.other.x, b.other.y)) -1 else 1
    if (a.subject != b.subject) return if (a.subject) -1 else 1
    // fully collinear same-polygon twins: stable, arbitrary
    if (a.contourId != b.contourId) return Integer.compare(a.contourId, b.contourId)
    System.identityHashCode(a).compareTo(System.identityHashCode(b))
  }

  /** Sweep-status ordering of segments (paper fig. 5): below-first at the
    * current sweep position. */
  private def cmpSeg(a: Ev, b: Ev): Int = {
    if (a eq b) return 0
    if (signedArea(a.x, a.y, a.other.x, a.other.y, b.x, b.y) != 0.0 ||
        signedArea(a.x, a.y, a.other.x, a.other.y, b.other.x, b.other.y) != 0.0) {
      // not collinear
      if (a.x == b.x && a.y == b.y)
        return if (a.below(b.other.x, b.other.y)) -1 else 1
      if (a.x == b.x) return if (a.y < b.y) -1 else 1
      if (cmpEv(a, b) > 0) // a inserted after b: sort by b's view of a's point
        return if (b.above(a.x, a.y)) -1 else 1
      return if (a.below(b.x, b.y)) -1 else 1
    }
    // collinear
    if (a.subject == b.subject) {
      if (a.x == b.x && a.y == b.y) {
        if (a.other.x == b.other.x && a.other.y == b.other.y) return 0
        return Integer.compare(a.contourId, b.contourId) match {
          case 0 => System.identityHashCode(a).compareTo(System.identityHashCode(b))
          case c => c
        }
      }
    } else {
      return if (a.subject) -1 else 1
    }
    if (cmpEv(a, b) > 0) 1 else -1
  }

  /** Segment intersection: returns 0 (none), 1 (point in out(0..1)), or
    * 2 (collinear overlap, [out(0..1)]-[out(2..3)]). Standard parametric
    * formulation with exact-double endpoint snapping. Results go into the
    * caller-provided `out` buffer — BoolOps must stay free of shared
    * mutable state (it runs concurrently in every executor thread). */
  private def segInt(a0x: Double, a0y: Double, a1x: Double, a1y: Double,
                     b0x: Double, b0y: Double, b1x: Double, b1y: Double,
                     out: Array[Double]): Int = {
    val vax = a1x - a0x; val vay = a1y - a0y
    val vbx = b1x - b0x; val vby = b1y - b0y
    val ex = b0x - a0x; val ey = b0y - a0y
    val kross = vax * vby - vay * vbx
    if (kross != 0.0) {
      val s = (ex * vby - ey * vbx) / kross
      if (s < 0.0 || s > 1.0) return 0
      val t = (ex * vay - ey * vax) / kross
      if (t < 0.0 || t > 1.0) return 0
      // snap to endpoints so subdivision never creates near-duplicate points
      if (s == 0.0) { out(0) = a0x; out(1) = a0y }
      else if (s == 1.0) { out(0) = a1x; out(1) = a1y }
      else if (t == 0.0) { out(0) = b0x; out(1) = b0y }
      else if (t == 1.0) { out(0) = b1x; out(1) = b1y }
      else { out(0) = a0x + s * vax; out(1) = a0y + s * vay }
      return 1
    }
    // parallel: collinear?
    if (ex * vay - ey * vax != 0.0) return 0
    // project b endpoints onto a's parameter space
    val den = vax * vax + vay * vay
    if (den == 0.0) return 0 // degenerate zero-length
    val s0 = (ex * vax + ey * vay) / den
    val s1 = ((b1x - a0x) * vax + (b1y - a0y) * vay) / den
    val smin = math.min(s0, s1); val smax = math.max(s0, s1)
    val lo = math.max(0.0, smin); val hi = math.min(1.0, smax)
    if (lo > hi) return 0
    def at(s: Double, isB0: Boolean, isB1: Boolean): (Double, Double) =
      if (s == 0.0) (a0x, a0y)
      else if (s == 1.0) (a1x, a1y)
      else if (isB0) (b0x, b0y)
      else if (isB1) (b1x, b1y)
      else (a0x + s * vax, a0y + s * vay)
    val (lx, ly) = at(lo, lo == s0, lo == s1)
    if (lo == hi) { out(0) = lx; out(1) = ly; return 1 }
    val (hx, hy) = at(hi, hi == s0, hi == s1)
    out(0) = lx; out(1) = ly; out(2) = hx; out(3) = hy
    2
  }

  private def inResultOf(e: Ev, op: Int): Boolean = e.etype match {
    case Normal => op match {
      case Intersection => !e.otherInOut
      case Union        => e.otherInOut
      case Difference   => (e.subject && e.otherInOut) || (!e.subject && !e.otherInOut)
      case Xor          => true
    }
    case SameTransition      => op == Intersection || op == Union
    case DifferentTransition => op == Difference
    case _                   => false
  }

  private def computeFields(e: Ev, prev: Ev, op: Int): Unit = {
    if (prev == null) { e.inOut = false; e.otherInOut = true }
    else if (e.subject == prev.subject) {
      e.inOut = !prev.inOut
      e.otherInOut = prev.otherInOut
    } else {
      e.inOut = !prev.otherInOut
      e.otherInOut = if (prev.isVertical) !prev.inOut else prev.inOut
    }
    e.inResult = inResultOf(e, op)
  }

  private def divide(e: Ev, px: Double, py: Double,
                     q: JPriorityQueue[Ev]): Unit = {
    // split [e, e.other] at p into [e, r][l, e.other]
    val r = new Ev(px, py, false, e.subject, e.contourId)
    r.other = e
    val l = new Ev(px, py, true, e.subject, e.contourId)
    l.other = e.other
    if (cmpEv(l, e.other) > 0) { // rounding degeneracy guard (paper impl.)
      e.other.left = true
      l.left = false
    }
    e.other.other = l
    e.other = r
    q.add(l); q.add(r)
  }

  /** Returns 2 when the segments fully coincide (caller must recompute
    * fields), per the published implementation's contract. */
  private def possibleIntersection(e1: Ev, e2: Ev, q: JPriorityQueue[Ev]): Int = {
    val ib = new Array[Double](4)
    val n = segInt(e1.x, e1.y, e1.other.x, e1.other.y,
      e2.x, e2.y, e2.other.x, e2.other.y, ib)
    if (n == 0) return 0
    if (n == 1) {
      val shareLeft = e1.x == e2.x && e1.y == e2.y
      val shareRight = e1.other.x == e2.other.x && e1.other.y == e2.other.y
      if ((shareLeft && ib(0) == e1.x && ib(1) == e1.y) ||
          (shareRight && ib(0) == e1.other.x && ib(1) == e1.other.y)) return 0
      val px = ib(0); val py = ib(1)
      if (!(px == e1.x && py == e1.y) && !(px == e1.other.x && py == e1.other.y))
        divide(e1, px, py, q)
      if (!(px == e2.x && py == e2.y) && !(px == e2.other.x && py == e2.other.y))
        divide(e2, px, py, q)
      return 1
    }
    // overlap
    if (e1.subject == e2.subject) return 0 // same-operand overlap unsupported
    val leftCoincide = e1.x == e2.x && e1.y == e2.y
    val rightCoincide = e1.other.x == e2.other.x && e1.other.y == e2.other.y
    val evs = new ArrayBuffer[Ev](4)
    if (!leftCoincide) {
      if (cmpEv(e1, e2) > 0) { evs += e2; evs += e1 } else { evs += e1; evs += e2 }
    }
    if (!rightCoincide) {
      if (cmpEv(e1.other, e2.other) > 0) { evs += e2.other; evs += e1.other }
      else { evs += e1.other; evs += e2.other }
    }
    if (leftCoincide) {
      e2.etype = NonContributing
      e1.etype = if (e2.inOut == e1.inOut) SameTransition else DifferentTransition
      if (!rightCoincide) divide(evs(1).other, evs(0).x, evs(0).y, q)
      return 2
    }
    if (rightCoincide) {
      divide(evs(0), evs(1).x, evs(1).y, q)
      return 3
    }
    if (evs(0).other ne evs(3)) {
      // partial overlap, neither contains the other
      divide(evs(0), evs(1).x, evs(1).y, q)
      divide(evs(1), evs(2).x, evs(2).y, q)
      return 3
    }
    // one contains the other
    divide(evs(0), evs(1).x, evs(1).y, q)
    divide(evs(3).other, evs(2).x, evs(2).y, q)
    3
  }

  private def polygonsOf(g: Geom): Array[Polygon] = g match {
    case p: Polygon => Array(p)
    case MultiPolygon(ps) => ps
    case GeometryCollection(gs) => gs.flatMap(polygonsOf)
    case s: Surface => s.toMulti.polys
    case _ => Array.empty
  }

  private def addRingEvents(ring: Array[Double], subject: Boolean,
                            contourId: Int, q: JPriorityQueue[Ev]): Unit = {
    // ring is closed (last == first); iterate distinct segments
    var i = 0
    while (i + 3 < ring.length) {
      val x0 = ring(i); val y0 = ring(i + 1)
      val x1 = ring(i + 2); val y1 = ring(i + 3)
      if (!(x0 == x1 && y0 == y1)) {
        val a = new Ev(x0, y0, true, subject, contourId)
        val b = new Ev(x1, y1, true, subject, contourId)
        a.other = b; b.other = a
        if (cmpEv(a, b) < 0) b.left = false else a.left = false
        q.add(a); q.add(b)
      }
      i += 2
    }
  }

  /** Core sweep: returns the ordered processed events. */
  private def sweep(subj: Array[Polygon], clip: Array[Polygon], op: Int): ArrayBuffer[Ev] = {
    val q = new JPriorityQueue[Ev](64, (a: Ev, b: Ev) => cmpEv(a, b))
    var cid = 0
    subj.foreach { p => p.rings.foreach { r => cid += 1; addRingEvents(r, subject = true, cid, q) } }
    clip.foreach { p => p.rings.foreach { r => cid += 1; addRingEvents(r, subject = false, cid, q) } }

    val status = new JTreeSet[Ev]((a: Ev, b: Ev) => cmpSeg(a, b))
    val sorted = new ArrayBuffer[Ev](q.size * 2)
    while (!q.isEmpty) {
      val ev = q.poll()
      sorted += ev
      if (ev.left) {
        status.add(ev)
        val prev = status.lower(ev)
        val next = status.higher(ev)
        computeFields(ev, prev, op)
        if (next != null && possibleIntersection(ev, next, q) == 2) {
          computeFields(ev, prev, op)
          computeFields(next, ev, op)
        }
        if (prev != null && possibleIntersection(prev, ev, q) == 2) {
          val prevprev = status.lower(prev)
          computeFields(prev, prevprev, op)
          computeFields(ev, prev, op)
        }
      } else {
        val le = ev.other
        if (status.contains(le)) {
          val prev = status.lower(le)
          val next = status.higher(le)
          status.remove(le)
          if (prev != null && next != null) possibleIntersection(prev, next, q)
        }
      }
    }
    sorted
  }

  /** Connect result edges into closed rings (paper §8 contour connection). */
  private def connect(sorted: ArrayBuffer[Ev]): ArrayBuffer[Array[Double]] = {
    val res = new ArrayBuffer[Ev]()
    sorted.foreach { e =>
      if ((e.left && e.inResult) || (!e.left && e.other.inResult)) res += e
    }
    // events arrive in processed order which is cmpEv order already
    var i = 0
    while (i < res.length) { res(i).pos = i; i += 1 }
    i = 0
    while (i < res.length) {
      val e = res(i)
      if (!e.left) { val t = e.pos; e.pos = e.other.pos; e.other.pos = t }
      i += 1
    }
    val processed = new Array[Boolean](res.length)
    val rings = new ArrayBuffer[Array[Double]]()

    def nextPos(pos: Int, orig: Int): Int = {
      var np = pos + 1
      val px = res(pos).x; val py = res(pos).y
      while (np < res.length && res(np).x == px && res(np).y == py) {
        if (!processed(np)) return np
        np += 1
      }
      np = pos - 1
      while (np > orig && processed(np)) np -= 1
      np
    }

    i = 0
    while (i < res.length) {
      if (!processed(i)) {
        val ring = new ArrayBuffer[Double]()
        val ix = res(i).x; val iy = res(i).y
        ring += ix; ring += iy
        var pos = i
        var guard = 0
        val maxSteps = res.length * 2 + 4
        var open = true
        while (open && guard < maxSteps) {
          processed(pos) = true
          pos = res(pos).pos
          processed(pos) = true
          ring += res(pos).x; ring += res(pos).y
          if (res(pos).x == ix && res(pos).y == iy) open = false
          else {
            pos = nextPos(pos, i)
            if (pos <= i) open = false // safety: ring failed to close cleanly
          }
          guard += 1
        }
        if (ring.length >= 8) rings += ring.toArray // >= 3 distinct + closure
      }
      i += 1
    }
    rings
  }

  /** Even-odd containment depth classification: shells at even depth,
    * holes (odd depth) attach to their immediate enclosing shell. Rings
    * produced by the sweep are disjoint-interior simple rings, so a
    * representative interior point of each ring (taken just inside its
    * bottom-left convex vertex) gives an unambiguous depth. */
  private def assemble(rings: ArrayBuffer[Array[Double]]): Geom = {
    val n = rings.length
    if (n == 0) return MultiPolygon(Array.empty)
    val areas = rings.map(GeoOps.signedRingArea).toArray
    // representative point: interior of the wedge at the ring's min-lex
    // (convex) vertex, shrunk until it is strictly inside the ring AND
    // clear of every other ring's boundary (crossing counts are only
    // well-defined off boundaries); irrational-ish start so halving
    // doesn't land on other rings' lattice-aligned vertices
    def repPoint(ri: Int): (Double, Double) = {
      val r = rings(ri)
      val m = r.length - 2 // last point == first
      var best = 0
      var k = 2
      while (k < m) {
        if (r(k) < r(best) || (r(k) == r(best) && r(k + 1) < r(best + 1))) best = k
        k += 2
      }
      val vx = r(best); val vy = r(best + 1)
      val pk = if (best == 0) m - 2 else best - 2
      val nk = if (best + 2 >= m) 0 else best + 2
      var t = 0.437891023457
      var px = 0.0; var py = 0.0
      var ok = false
      while (!ok && t > 1e-12) {
        val ax = vx + (r(pk) - vx) * t; val ay = vy + (r(pk + 1) - vy) * t
        val bx = vx + (r(nk) - vx) * t; val by = vy + (r(nk + 1) - vy) * t
        px = (ax + bx) / 2.0; py = (ay + by) / 2.0
        ok = GeoOps.isPointInRing(r, px, py, testEnvelope = false) &&
          !(px == vx && py == vy)
        if (ok) {
          var j = 0
          while (ok && j < rings.length) {
            if (j != ri &&
                GeoOps.isPointOnRingBoundary(rings(j), px, py, testEnvelope = true))
              ok = false
            j += 1
          }
        }
        t /= 2.0
      }
      (px, py)
    }
    val reps = rings.indices.map(repPoint)
    val depth = new Array[Int](n)
    val parentShell = Array.fill(n)(-1)
    var a = 0
    while (a < n) {
      val (px, py) = reps(a)
      var bestParent = -1
      var bestArea = Double.MaxValue
      var b = 0
      while (b < n) {
        if (b != a && GeoOps.isPointInRing(rings(b), px, py, testEnvelope = true)) {
          depth(a) += 1
          val ar = math.abs(areas(b))
          if (ar < bestArea) { bestArea = ar; bestParent = b }
        }
        b += 1
      }
      parentShell(a) = bestParent
      a += 1
    }
    val shellIdx = (0 until n).filter(i => depth(i) % 2 == 0)
    val polys = shellIdx.map { si =>
      val holes = (0 until n).filter(i => depth(i) % 2 == 1 && parentShell(i) == si)
      // orient: shell CCW (positive), holes CW — OGC convention
      def orient(r: Array[Double], ccw: Boolean): Array[Double] = {
        val sa = GeoOps.signedRingArea(r)
        if ((sa >= 0) == ccw) r else reverseRing(r)
      }
      Polygon(Array(orient(rings(si), ccw = true)) ++
        holes.map(h => orient(rings(h), ccw = false)))
    }.toArray
    if (polys.length == 1) polys(0) else MultiPolygon(polys)
  }

  private def reverseRing(r: Array[Double]): Array[Double] = {
    val out = new Array[Double](r.length)
    val np = r.length / 2
    var i = 0
    while (i < np) {
      out(2 * i) = r(2 * (np - 1 - i))
      out(2 * i + 1) = r(2 * (np - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** The public entry: boolean op over two (multi)polygons. */
  def boolOp(a: Geom, b: Geom, op: Int): Geom = {
    val subj = polygonsOf(a)
    val clip = polygonsOf(b)
    val subjEmpty = subj.forall(_.isEmpty) || subj.isEmpty
    val clipEmpty = clip.forall(_.isEmpty) || clip.isEmpty
    if (subjEmpty && clipEmpty) return MultiPolygon(Array.empty)
    if (subjEmpty) return op match {
      case Intersection | Difference => MultiPolygon(Array.empty)
      case _ => assembleCopy(clip)
    }
    if (clipEmpty) return op match {
      case Intersection => MultiPolygon(Array.empty)
      case _ => assembleCopy(subj)
    }
    val ea = envOf(subj); val eb = envOf(clip)
    if (!ea.intersects(eb)) return op match {
      case Intersection => MultiPolygon(Array.empty)
      case Difference => assembleCopy(subj)
      case _ => assembleCopy(subj ++ clip)
    }
    assemble(connect(sweep(subj, clip, op)))
  }

  private def envOf(ps: Array[Polygon]): Envelope =
    ps.foldLeft(Envelope.Empty)((e, p) => e.union(p.envelope))

  private def assembleCopy(ps: Array[Polygon]): Geom =
    if (ps.length == 1) ps(0) else MultiPolygon(ps)

  /** MakeValid for self-intersecting polygons (reference:
    * OGRGeometry::MakeValid, ogrgeometry.cpp:4183, STRUCTURE method):
    * the sweep subdivides the polygon's edges at self-intersections
    * (op=Xor keeps every subdivided edge), then ring connection + even-odd
    * depth classification rebuilds the valid shell/hole structure — a
    * bowtie becomes its two triangles. Even-odd fill semantics; parts of a
    * MultiPolygon that overlap each other cancel (documented deviation from
    * GEOS, which unions them). */
  def makeValid(g: Geom): Geom = {
    val subj = polygonsOf(g)
    if (subj.isEmpty || subj.forall(_.isEmpty)) MultiPolygon(Array.empty)
    else assemble(connect(sweep(subj, Array.empty, Xor)))
  }

  def intersection(a: Geom, b: Geom): Geom = boolOp(a, b, Intersection)
  def union(a: Geom, b: Geom): Geom = boolOp(a, b, Union)
  def difference(a: Geom, b: Geom): Geom = boolOp(a, b, Difference)
  def symDifference(a: Geom, b: Geom): Geom = boolOp(a, b, Xor)
}
