package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geom._
import graft.engine.Coverage

/** simplify-coverage topology invariants: after a coverage-wide simplify
  * the units must still tile exactly — identical shared arcs on both
  * owners (no cracks, no overlaps) — including the no-node isolated-ring
  * path (island inside a hole). */
class CoverageSpec extends AnyFunSuite {

  private def zigEdge(ax: Double, ay: Double, bx: Double, by: Double,
                      steps: Int, amp: Double): Seq[(Double, Double)] = {
    // offsets derive from ABSOLUTE position (not traversal direction) so
    // both owners of a shared edge generate bit-identical point chains
    (0 until steps).map { k =>
      val t = k.toDouble / steps
      val x = ax + (bx - ax) * t; val y = ay + (by - ay) * t
      if (k == 0) (x, y)
      else {
        val s = if (math.round((x + y) / 2.0) % 2 == 0) amp else -amp
        if (ay == by) (x, y + s) else (x + s, y) // axis-aligned edges only
      }
    }
  }

  private def rectWkb(x0: Double, y0: Double, w: Double, h: Double,
                      steps: Int, amp: Double): Array[Byte] = {
    val pts = zigEdge(x0, y0, x0 + w, y0, steps, amp) ++
      zigEdge(x0 + w, y0, x0 + w, y0 + h, steps, amp) ++
      zigEdge(x0 + w, y0 + h, x0, y0 + h, steps, amp) ++
      zigEdge(x0, y0 + h, x0, y0, steps, amp)
    val ring = (pts :+ pts.head).flatMap(p => Seq(p._1, p._2)).toArray
    Wkb.write(Polygon(Array(ring)))
  }

  test("3x3 grid: simplified cells tile exactly (no cracks, no overlaps)") {
    val s = SparkTestSession.spark
    import s.implicits._
    val cells = (0 until 9).map { c =>
      (c.toLong, rectWkb(8.0 * (c % 3), 8.0 * (c / 3), 8, 8, 4, 0.3))
    }
    val out = Coverage.simplifyCoverage(cells.toDF("id", "wkb"), 0.5)
      .as[(Long, Array[Byte])].collect().toMap
    assert(out.size === 9)
    val geoms = out.values.map(Wkb.read).toSeq
    // every cell an exact 64-area rectangle; areas sum to the extent
    geoms.foreach(g => assert(math.abs(GeoOps.area(g) - 64.0) < 1e-9))
    // shared arcs identical on both owners → zero-area pairwise overlap
    for (a <- 0 until 9; b <- a + 1 until 9) {
      val inter = BoolOps.intersection(Wkb.read(out(a.toLong)), Wkb.read(out(b.toLong)))
      assert(GeoOps.area(inter) < 1e-9, s"cells $a/$b overlap")
    }
    // and the union fills the extent exactly (no cracks)
    val union = geoms.reduce(BoolOps.union)
    assert(math.abs(GeoOps.area(union) - 9 * 64.0) < 1e-9)
  }

  test("island in a hole: the no-node shared ring simplifies identically") {
    val s = SparkTestSession.spark
    import s.implicits._
    // container: exact outer square 0..8 with a zigzagged hole 2..6;
    // island: the SAME zigzag chain as its exterior (traversed opposite)
    val holePts = zigEdge(2, 2, 6, 2, 4, 0.2) ++ zigEdge(6, 2, 6, 6, 4, 0.2) ++
      zigEdge(6, 6, 2, 6, 4, 0.2) ++ zigEdge(2, 6, 2, 2, 4, 0.2)
    val holeRing = (holePts :+ holePts.head).flatMap(p => Seq(p._1, p._2)).toArray
    val outer = Array(0.0, 0, 8, 0, 8, 8, 0, 8, 0, 0)
    val container = Wkb.write(Polygon(Array(outer, holeRing)))
    val island = Wkb.write(Polygon(Array(holeRing)))
    val out = Coverage.simplifyCoverage(
        Seq((1L, container), (2L, island)).toDF("id", "wkb"), 0.5)
      .as[(Long, Array[Byte])].collect().toMap
    val cont = Wkb.read(out(1L)); val isl = Wkb.read(out(2L))
    assert(math.abs(GeoOps.area(isl) - 16.0) < 1e-9) // zigzag collapsed
    assert(math.abs(GeoOps.area(cont) - 48.0) < 1e-9)
    assert(GeoOps.area(BoolOps.intersection(cont, isl)) < 1e-9)
    assert(math.abs(GeoOps.area(BoolOps.union(cont, isl)) - 64.0) < 1e-9)
  }

  test("tolerance below the noise keeps the zigzag (nothing over-simplified)") {
    val s = SparkTestSession.spark
    import s.implicits._
    val cells = Seq((0L, rectWkb(0, 0, 8, 8, 4, 0.3)))
    val out = Coverage.simplifyCoverage(cells.toDF("id", "wkb"), 0.1)
      .as[(Long, Array[Byte])].collect().toMap
    assert(GeoOps.npoints(Wkb.read(out(0L))) > 5) // zigzag survives tol<amp
    val simp = Coverage.simplifyCoverage(cells.toDF("id", "wkb"), 0.5)
      .as[(Long, Array[Byte])].collect().toMap
    assert(GeoOps.npoints(Wkb.read(simp(0L))) === 5)
  }

  test("resolveOverlaps yields a disjoint coverage preserving total extent") {
    val s = SparkTestSession.spark
    import s.implicits._
    // 5 rectangles, each overlapping the next by a sliver, varied heights
    val polys = (0 until 5).map { k =>
      val x = k * 3.0; val h = 2.0 + (k % 3) * 0.7
      (k.toLong, Wkb.write(Polygon(Array(Array(
        x, 0.0, x + 3.4, 0.0, x + 3.4, h, x, h, x, 0.0)))))
    }
    val before = polys.map(p => GeoOps.area(Wkb.read(p._2)))
    val unionBefore = polys.map(p => Wkb.read(p._2))
      .reduce[Geom]((a, b) => BoolOps.union(a, b))
    for (strategy <- Seq("min-index", "max-area", "min-area", "longest-border")) {
      val out = Coverage.resolveOverlaps(polys.toDF("id", "wkb"), strategy, z = 4)
        .as[(Long, Array[Byte])].collect().sortBy(_._1).map(p => Wkb.read(p._2))
      assert(out.length === 5, strategy)
      // pairwise disjoint interiors
      for (i <- out.indices; j <- (i + 1) until out.length)
        assert(GeoOps.area(BoolOps.intersection(out(i), out(j))) < 1e-9,
          s"$strategy: units $i,$j still overlap")
      // nothing lost: areas sum to the union's area
      val total = out.map(GeoOps.area).sum
      assert(math.abs(total - GeoOps.area(unionBefore)) < 1e-9,
        s"$strategy: $total != ${GeoOps.area(unionBefore)}")
      // every overlap was assigned to exactly one side: each area shrank
      // or stayed, never grew
      out.map(GeoOps.area).zip(before).foreach { case (a, b) =>
        assert(a <= b + 1e-12, strategy)
      }
    }
  }

  test("closeGaps: narrow gap merges into longest-border neighbor, wide gap survives") {
    val s = SparkTestSession.spark
    import s.implicits._
    def frame(x0: Double, g: Double): Seq[(Long, Array[Byte])] = {
      val base = (x0 / 30.0).toLong * 5
      val yt = 10.0 - g / 2.0; val yb = 10.0 + g / 2.0
      def rect(id: Long, xa: Double, ya: Double, xb: Double, yb2: Double) =
        (id, Wkb.write(Polygon(Array(Array(xa, ya, xb, ya, xb, yb2, xa, yb2, xa, ya)))))
      Seq(rect(base, x0, 0.0, x0 + 20.0, yt),
        rect(base + 1, x0, yb, x0 + 18.0, 20.0),
        rect(base + 2, x0 + 18.0, yb, x0 + 20.0, 20.0),
        rect(base + 3, x0 - 2.0, 0.0, x0, 20.0),
        rect(base + 4, x0 + 20.0, 0.0, x0 + 22.0, 20.0))
    }
    val units = (frame(0.0, 0.4) ++ frame(30.0, 1.6)).toDF("id", "wkb")
    val out = Coverage.closeGaps(units, maxWidth = 1.0, z = 4)
      .as[(Long, Array[Byte])].collect().toMap
    // narrow gap (0.4): top rect (id 0, border 20 > 18 > 2 > 0.4) gains it
    assert(math.abs(GeoOps.area(Wkb.read(out(0L))) - (20.0 * 9.8 + 20.0 * 0.4)) < 1e-9)
    for (i <- 1L to 4L)
      assert(math.abs(GeoOps.area(Wkb.read(out(i))) -
        GeoOps.area(Wkb.read(units.as[(Long, Array[Byte])].collect().toMap.apply(i)))) < 1e-9)
    // wide gap (1.6 > maxWidth): every unit of the second frame unchanged
    assert(math.abs(GeoOps.area(Wkb.read(out(5L))) - 20.0 * 9.2) < 1e-9)
    // closing introduced no overlap: pairwise intersections stay empty
    val geoms = out.values.map(Wkb.read).toArray
    for (i <- geoms.indices; j <- (i + 1) until geoms.length)
      assert(GeoOps.area(graft.geom.BoolOps.intersection(geoms(i), geoms(j))) < 1e-9)
  }

  test("cleanCoverage snaps sub-precision jitter to identical chains") {
    val s = SparkTestSession.spark
    import s.implicits._
    val a = Wkb.write(Polygon(Array(Array(0.0, 0, 4.02, 0, 3.98, 4, 0, 4, 0, 0))))
    val cleaned = Coverage.cleanCoverage(Seq((0L, a)).toDF("id", "wkb"), 0.1)
      .as[(Long, Array[Byte])].collect().toMap
    val g = Wkb.read(cleaned(0L)).asInstanceOf[Polygon]
    val r = g.rings(0)
    assert(math.abs(r(2) - 4.0) < 1e-12 && math.abs(r(4) - 4.0) < 1e-12)
  }
}
