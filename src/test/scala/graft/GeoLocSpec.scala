package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{GeoLoc, GeoLocGrid}

/** Geolocation-array transformer semantics (alg/gdalgeoloc.cpp): forward
  * bilinear with clamping/edge-retreat/nodata degradation, exact inverse
  * bilinear, backmap generation, and the full inverse round trip. */
class GeoLocSpec extends AnyFunSuite {

  private val W = 33; private val H = 25; private val Nd = -999.0
  private def fgx(i: Int, j: Int): Double =
    if (j == 10 && (i == 20 || i == 21)) Nd
    else 500.0 + i * 2.0 + j * 0.35 + (i * j) * 0.002
  private def fgy(i: Int, j: Int): Double =
    200.0 + j * 1.8 - i * 0.25 + (i * i) * 0.001
  private val grid = GeoLocGrid(W, H,
    Array.tabulate(W * H)(k => fgx(k % W, k / W)),
    Array.tabulate(W * H)(k => fgy(k % W, k / W)),
    pixelOffset = 0.5, pixelStep = 2.0, lineOffset = 1.5, lineStep = 2.0,
    noDataX = Some(Nd))

  test("forward: interior bilinear interpolates node values exactly at nodes") {
    for (i <- Seq(0, 5, 17, 31); j <- Seq(0, 4, 15, 23)) {
      val r = GeoLoc.pixelLineToXY(grid, i.toDouble, j.toDouble)
      assert(r.isDefined)
      assert(math.abs(r.get._1 - fgx(i, j)) < 1e-12 &&
        math.abs(r.get._2 - fgy(i, j)) < 1e-12, s"node ($i,$j)")
    }
  }

  test("forward: nodata cell fails; neighbors degrade to linear/point") {
    assert(GeoLoc.pixelLineToXY(grid, 20.3, 10.4).isEmpty) // inside hole
    // (19, 10): right neighbor (20,10) nodata → bilinear fails, but the
    // degradation chain must still produce a value (linear in y via (19,11))
    val r = GeoLoc.pixelLineToXY(grid, 19.5, 10.0)
    assert(r.isDefined)
  }

  test("forward: beyond-border clamping extends the edge cell") {
    val a = GeoLoc.pixelLineToXY(grid, -1.75, 3.0).get
    val b = GeoLoc.pixelLineToXY(grid, 0.0, 3.0).get
    // extrapolation from cell (0,3): value = g00 + (-1.75)*(g10-g00)
    val ex = fgx(0, 3) + (-1.75) * (fgx(1, 3) - fgx(0, 3))
    assert(math.abs(a._1 - ex) < 1e-12)
    assert(math.abs(b._1 - fgx(0, 3)) < 1e-12)
  }

  test("inverse bilinear is exact inside a forward quad") {
    for (cell <- Seq((3, 4), (12, 7), (28, 20)); fx <- Seq(0.25, 0.75); fy <- Seq(0.1, 0.9)) {
      val (ci, cj) = cell
      val glp = ci + fx; val gll = cj + fy
      val (gX, gY) = GeoLoc.pixelLineToXY(grid, glp, gll).get
      val q0 = (fgx(ci, cj), fgy(ci, cj))
      val q1 = (fgx(ci, cj + 1), fgy(ci, cj + 1))
      val q2 = (fgx(ci + 1, cj), fgy(ci + 1, cj))
      val q3 = (fgx(ci + 1, cj + 1), fgy(ci + 1, cj + 1))
      val xs = Array(q0._1, q2._1, q3._1, q1._1)
      val ys = Array(q0._2, q2._2, q3._2, q1._2)
      assert(GeoLoc.pointInQuad(gX, gY, xs, ys), s"not in quad $cell $fx $fy")
      val (pi, pj) = GeoLoc.inverseBilinear(gX, gY, q0._1, q0._2, q1._1, q1._2,
        q2._1, q2._2, q3._1, q3._2, ci.toDouble, cj.toDouble)
      assert(math.abs(pi - glp) < 1e-9 && math.abs(pj - gll) < 1e-9,
        s"cell $cell ($fx,$fy): got ($pi,$pj) want ($glp,$gll)")
    }
  }

  test("full inverse round trip over the lattice (backmap + max accuracy)") {
    val s = SparkTestSession.spark
    val bm = GeoLoc.buildBackMap(s, grid)
    var worst = 0.0; var fails = 0; var checked = 0
    val badKs = scala.collection.mutable.ArrayBuffer[String]()
    // quarter-offset line lattice: exactly-on-horizontal-edge queries hit
    // the reference's inverse-bilinear root-selection edge quirk
    // (gdalgeoloc.cpp:987-991, A ≈ ±ulp picks the far root) — mirrored,
    // not fixed, so the lattice avoids the degenerate set
    for (k <- 0 until 2760) {
      val glp = 0.5 + (k % 60) * 0.5
      val gll = 0.25 + (k / 60) * 0.5
      if (!(glp >= 18.5 && glp <= 22.5 && gll >= 8.5 && gll <= 11.5)) {
        checked += 1
        val px = (glp + 0.5) * 2.0 + 0.5
        val py = (gll + 0.5) * 2.0 + 1.5
        val (gX, gY) = GeoLoc.pixelLineToXY(grid, glp, gll).get
        GeoLoc.inverseLookup(grid, bm, gX, gY) match {
          case None =>
            fails += 1
            if (badKs.size < 8) badKs += s"k=$k glp=$glp gll=$gll: None"
          case Some((rx, ry)) =>
            val err = math.max(math.abs(rx - px), math.abs(ry - py))
            if (err > worst) worst = err
            if (err > 1e-6) {
              fails += 1
              if (badKs.size < 8)
                badKs += f"k=$k glp=$glp gll=$gll: got ($rx%.6f,$ry%.6f) want ($px,$py)"
            }
        }
      }
    }
    assert(fails == 0, s"$fails/$checked failed, worst=$worst\n" + badKs.mkString("\n"))
    assert(worst < 1e-8, s"worst error $worst")
  }
}
