package graft.engine

/** Error-bounded approximate transformer — GDALApproxTransform
  * (/root/reference/alg/gdaltransformer.cpp:4375-4429 entry,
  * GDALApproxTransformInternal :4080-4360): the warp inner loop's
  * subdivision scheme that replaces per-pixel evaluation of an expensive
  * transform (TPS, RPC, geolocation ring search) by linear interpolation
  * along a scanline wherever the interpolation error at the segment middle
  * stays under the threshold, recursing into halves otherwise.
  *
  * Per node over points [0, n): the first/middle/last transformed anchors
  * give per-unit-x deltas; the middle's interpolation error
  * |X0 + dX·(xm−x0) − Xm| + |Y0 + dY·(xm−x0) − Ym| decides: under the
  * threshold every point (ends included) is overwritten by interpolation;
  * over it, the halves [0, nM) and [nM, n) recurse — a half of ≤5 points
  * (or one that stops looking like a monotone scanline) falls back to
  * exact per-point evaluation with its anchors pinned to the already-
  * transformed values, exactly as the reference does.
  *
  * At 100 TB this is a pure map-side cost lever: the subdivision runs
  * per-partition inside the warp kernel; no plan shape changes.
  */
object ApproxTransform {

  /** Transform a scanline (xs with constant y) through `base`, allowing
    * interpolation with absolute error ≤ maxError (reference semantics:
    * error measured at segment middles only). Returns (X, Y) arrays.
    * Degrades to exact per-point evaluation when the preconditions fail
    * (non-scanline input, ≤5 points, maxError 0). */
  def transformRow(base: (Double, Double) => (Double, Double), maxError: Double,
                   xs: Array[Double], ys: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xs.length
    val ox = new Array[Double](n)
    val oy = new Array[Double](n)
    def exact(i: Int): Unit = {
      val (bx, by) = base(xs(i), ys(i))
      ox(i) = bx; oy(i) = by
    }
    val nMiddle = (n - 1) / 2
    if (n <= 5 || maxError == 0.0 || ys(0) != ys(n - 1) || ys(0) != ys(nMiddle) ||
        xs(0) == xs(n - 1) || xs(0) == xs(nMiddle)) {
      var i = 0
      while (i < n) { exact(i); i += 1 }
      return (ox, oy)
    }
    val sme0 = base(xs(0), ys(0))
    val sme1 = base(xs(nMiddle), ys(nMiddle))
    val sme2 = base(xs(n - 1), ys(n - 1))
    internal(base, maxError, xs, ys, ox, oy, 0, n, sme0, sme1, sme2)
    (ox, oy)
  }

  /** GDALApproxTransformInternal over the index window [lo, lo+n):
    * sme0/1/2 are the transformed anchors at lo, lo+(n−1)/2, lo+n−1. */
  private def internal(base: (Double, Double) => (Double, Double), maxError: Double,
                       xs: Array[Double], ys: Array[Double],
                       ox: Array[Double], oy: Array[Double],
                       lo: Int, n: Int,
                       sme0: (Double, Double), sme1: (Double, Double), sme2: (Double, Double)): Unit = {
    val nM = (n - 1) / 2
    val mid = lo + nM
    val hi = lo + n - 1
    val dX = (sme2._1 - sme0._1) / (xs(hi) - xs(lo))
    val dY = (sme2._2 - sme0._2) / (xs(hi) - xs(lo))
    val err = math.abs(sme0._1 + dX * (xs(mid) - xs(lo)) - sme1._1) +
      math.abs(sme0._2 + dY * (xs(mid) - xs(lo)) - sme1._2)
    if (err > maxError) {
      // quarter anchors for the recursive halves: half1 = [lo, mid),
      // half2 = [mid, hi]; a half of <=5 points (or a non-scanline /
      // degenerate-x half) is evaluated exactly instead
      val q1 = lo + (nM - 1) / 2
      val h1End = lo + nM - 1
      val q2 = mid + (n - nM - 1) / 2
      val useBase1 = nM <= 5 || ys(lo) != ys(h1End) || ys(lo) != ys(q1) ||
        xs(lo) == xs(h1End) || xs(lo) == xs(q1)
      val useBase2 = (n - nM) <= 5 || ys(mid) != ys(hi) || ys(mid) != ys(q2) ||
        xs(mid) == xs(hi) || xs(mid) == xs(q2)
      if (!useBase1) {
        val m1 = base(xs(q1), ys(q1))
        val e1 = base(xs(h1End), ys(h1End))
        internal(base, maxError, xs, ys, ox, oy, lo, nM, sme0, m1, e1)
      } else {
        var i = lo + 1
        while (i <= h1End) {
          val (bx, by) = base(xs(i), ys(i)); ox(i) = bx; oy(i) = by
          i += 1
        }
        ox(lo) = sme0._1; oy(lo) = sme0._2
      }
      if (!useBase2) {
        val m2 = base(xs(q2), ys(q2))
        internal(base, maxError, xs, ys, ox, oy, mid, n - nM, sme1, m2, sme2)
      } else {
        var i = mid + 1
        while (i <= hi - 1) {
          val (bx, by) = base(xs(i), ys(i)); ox(i) = bx; oy(i) = by
          i += 1
        }
        ox(mid) = sme1._1; oy(mid) = sme1._2
        ox(hi) = sme2._1; oy(hi) = sme2._2
      }
    } else {
      // acceptable: overwrite every point (ends included) by interpolation
      var i = hi
      while (i >= lo) {
        val dist = xs(i) - xs(lo)
        ox(i) = sme0._1 + dX * dist
        oy(i) = sme0._2 + dY * dist
        i -= 1
      }
    }
  }
}
