package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Surf
import graft.engine.Surf.FeaturePoint

/** GDALSimpleSURF / GDALComputeMatchingPoints semantics
  * (alg/gdal_simplesurf.cpp, alg/gdal_octave.cpp, alg/gdalmatching.cpp):
  * integral-image rectangle sums, fast-Hessian extremum detection,
  * descriptor translation invariance, and the greedy matcher's
  * order-dependent ratio-test quirks. */
class SurfSpec extends AnyFunSuite {

  private val H = 96; private val W = 96

  private def pix(r: Int, c: Int): Double = {
    val br = r / 8; val bc = c / 8
    val dr = r - br * 8 - 4; val dc = c - bc * 8 - 4
    val amp = (br * br * 3 + bc * bc * 5 + br * bc) % 9
    val d = math.max(math.abs(dr), math.abs(dc))
    if (d < 4) amp.toDouble * (4 - d) else 0.0
  }

  private def img(sr: Int, sc: Int): Array[Double] =
    Array.tabulate(H * W)(i => pix(i / W + sr, i % W + sc))

  test("rectangle sum matches brute force, including clamped borders") {
    val im = img(0, 0)
    val ii = Surf.integralImage(im, H, W)
    def brute(row: Int, col: Int, w: Int, h: Int): Double = {
      // the reference clamps the corners, so the EFFECTIVE rectangle runs
      // from max(row,0)..min(row+h-1, H-1) except the row<=H / col<=W
      // upper-bound quirk; compare against the 4-corner definition instead
      val ltr = if (row <= H) row - 1 else -1
      val ltc = if (col <= W) col - 1 else -1
      val rbr = if (row + h - 1 < H) row + h - 1 else H - 1
      val rbc = if (col + w - 1 < W) col + w - 1 else W - 1
      def cum(r: Int, c: Int): Double =
        if (r < 0 || c < 0 || r >= H || c >= W) 0.0
        else (0 to r).map(i => (0 to c).map(j => im(i * W + j)).sum).sum
      val res = cum(ltr, ltc) + cum(rbr, rbc) - cum(ltr, rbc) - cum(rbr, ltc)
      math.max(res, 0.0)
    }
    for ((r, c, w, h) <- Seq((0, 0, 5, 5), (10, 20, 13, 7), (-6, -3, 9, 9),
        (90, 91, 13, 25), (95, 0, 4, 4), (50, 93, 8, 2)))
      assert(ii.rectSum(r, c, w, h) == brute(r, c, w, h), s"rect($r,$c,$w,$h)")
  }

  test("a single centred blob yields a positive-sign extremum at its peak") {
    val solo = Array.tabulate(H * W) { i =>
      val r = i / W; val c = i % W
      val d = math.max(math.abs(r - 48), math.abs(c - 48))
      if (d < 6) (6 - d) * 8.0 else 0.0
    }
    val fps = Surf.detect(solo, H, W, 1, 2, 0.05)
    assert(fps.nonEmpty)
    // the fast-Hessian of a square pyramid responds near (not exactly at)
    // the apex — edge/corner responses offset by up to the filter radius
    assert(fps.exists(fp => math.abs(fp.x - 48) <= 5 && math.abs(fp.y - 48) <= 5))
    assert(fps.forall(fp => math.abs(fp.x - 48) <= 20 && math.abs(fp.y - 48) <= 20))
    // a flat image has no extremum anywhere
    assert(Surf.detect(new Array[Double](H * W), H, W, 1, 2, 0.05).isEmpty)
  }

  test("interior descriptors are translation-invariant") {
    val c1 = Surf.detect(img(0, 0), H, W, 1, 1, 0.05)
    val c2 = Surf.detect(img(5, 9), H, W, 1, 1, 0.05)
    // an interior point (descriptor window fully inside both frames)
    val inner1 = c1.filter(p => p.x >= 32 && p.x <= 62 && p.y >= 28 && p.y <= 62)
    assert(inner1.nonEmpty)
    var checked = 0
    inner1.foreach { p =>
      c2.find(q => q.x == p.x - 9 && q.y == p.y - 5 && q.scale == p.scale).foreach { q =>
        assert(Surf.euclideanDistance(p.desc, q.desc) == 0.0, s"at (${p.x},${p.y})")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  private def fp(sign: Int, d: Double*): FeaturePoint = {
    val desc = new Array[Double](Surf.DescSize)
    d.zipWithIndex.foreach { case (v, i) => desc(i) = v }
    FeaturePoint(0, 0, 2, 6, sign, desc)
  }

  test("greedy matcher: first-examined best is rejected (second-best seeds from it)") {
    // p2(0) is BOTH the first examined and the nearest -> bestDist_2 seeds
    // at bestDist, ratio = 1, pair rejected (gdal_simplesurf.cpp:466-486)
    val first = IndexedSeq(fp(1, 1.0), fp(1, 100.0))
    val second = IndexedSeq(fp(1, 2.0), fp(1, 50.0), fp(1, 30.0))
    // first is smaller -> no swap; i=0: dists to (2,50,30) = (1,49,29):
    // best=1 (j0, first examined) -> best2 stays 1 -> rejected
    val ms = Surf.matchPoints(first, second, 1.0)
    assert(!ms.exists(_._1 == 0))
  }

  test("greedy matcher: accepted match excludes its target for later points") {
    // i=0 matches j=1 (best 1 vs second-best 20 -> ratio .05); i=1 would
    // also prefer j=1 but it is already matched
    val first = IndexedSeq(fp(1, 10.0), fp(1, 11.0))
    val second = IndexedSeq(fp(1, 30.0), fp(1, 11.0), fp(1, 200.0))
    val ms = Surf.matchPoints(first, second, 1.0)
    assert(ms.exists(m => m._1 == 0 && m._2 == 1))
    assert(!ms.exists(m => m._1 == 1 && m._2 == 1))
  }

  test("greedy matcher: sign must agree and swap preserves orientation") {
    // larger FIRST collection -> reference swaps so p_1 = second collection;
    // output must still be (index in first, index in second)
    val first = IndexedSeq(fp(1, 10.0), fp(-1, 10.0), fp(1, 500.0))
    val second = IndexedSeq(fp(1, 11.0), fp(1, 100.0))
    val ms = Surf.matchPoints(first, second, 1.0)
    ms.foreach { case (i1, i2, _) =>
      assert(first(i1).sign == second(i2).sign)
      assert(i1 >= 0 && i1 < first.length && i2 >= 0 && i2 < second.length)
    }
  }

  test("normalization: distances divide by the max matched distance, threshold prunes") {
    val first = IndexedSeq(fp(1, 0.0), fp(1, 1000.0))
    val second = IndexedSeq(fp(1, 30.0), fp(1, 0.0), fp(1, 400.0), fp(1, 5000.0))
    // i=0: dists (30,0,400,5000) -> best 0 at j1, second-best seeds at 30
    // -> ratio 0, accepted; i=1: dists (970,1000,600,4000) -> best 600 at
    // j2, second-best 970 -> ratio .62, accepted; max=600 -> norms (0, 1)
    val all = Surf.matchPoints(first, second, 1.0)
    assert(all.map(m => (m._1, m._2, m._3)).toSet == Set((0, 1, 0.0), (1, 2, 1.0)))
    val tight = Surf.matchPoints(first, second, 0.015)
    assert(tight.map(m => (m._1, m._2)) == Seq((0, 1)))
  }

  test("Spark pair matching recovers the translation end-to-end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val images = spark.createDataset(Seq(
      (1L, H, W, img(0, 0)), (2L, H, W, img(5, 9))))
      .toDF("img_id", "h", "w", "pixels")
    val pairs = spark.createDataset(Seq((1L, 2L))).toDF("id1", "id2")
    val rows = Surf.matchImagePairs(images, pairs, 1, 2, 0.05, 0.015)
      .collect()
    assert(rows.length == 38)
    rows.foreach { r =>
      assert(r.getDouble(3) - r.getDouble(5) == 9.0, "x translation")
      assert(r.getDouble(4) - r.getDouble(6) == 5.0, "y translation")
    }
    // detection itself is map-only: no shuffle in the plan
    val detPlan = Surf.detectPoints(images, 1, 2, 0.05)
      .queryExecution.executedPlan.toString
    assert(!detPlan.contains("Exchange"))
  }
}
