package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Enhance, Raster, Tile}

/** gdalenhance equalization edge semantics (apps/gdalenhance.cpp +
  * gcore/gdalrasterband.cpp GetDefaultHistogram): degenerate constant band,
  * NaN-safe application ladder, nodata byte pass-through, and the
  * equalization property on a uniform ramp. */
class EnhanceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tiles(f: (Long, Long) => Double) =
    Raster.syntheticTiles(spark, 1, tileSize = 32)(f)

  test("uniform ramp equalizes to a near-identity staircase (monotone, full range)") {
    val l = Enhance.equalizationLut(tiles((gx, gy) => (gy * 64 + gx).toDouble))
    assert(l.nBuckets === 256)
    // cumulative of a uniform histogram is linear → LUT is monotone and
    // spans ~the full output range (ends are zeroed, so lut(0) stays low)
    assert(l.lut.zip(l.lut.tail).forall { case (a, b) => a <= b })
    assert(l.lut.head <= 2 && l.lut.last >= 253)
  }

  test("constant band: 1-bucket ±0.5 degenerate histogram, total==0 path, LUT all zero") {
    val l = Enhance.equalizationLut(tiles((_, _) => 42.0))
    // GetDefaultHistogram min==max: one bucket, range 41.5..42.5; the single
    // bucket is then zeroed as an extreme (hist[0]=hist[n-1]=0) so total
    // degrades to 1 and every LUT entry is 0
    assert(l.scaleMin === 41.5 && l.scaleMax === 42.5)
    assert(l.lut.forall(_ === 0))
  }

  test("application ladder: NaN and below-range map to bin 0, above-range to top bin") {
    val l = Enhance.Lut(0.0, 256.0, 256, Array.tabulate(256)(identity))
    assert(Enhance.applyLut(Double.NaN, l, None) === 0.0)   // !(bin>0) catches NaN
    assert(Enhance.applyLut(-5.0, l, None) === 0.0)
    assert(Enhance.applyLut(1e9, l, None) === 255.0)
    assert(Enhance.applyLut(100.5, l, None) === 100.0)      // truncation, not rounding
  }

  test("nodata passes through as its byte cast and is excluded from the histogram") {
    val l = Enhance.Lut(0.0, 256.0, 256, Array.fill(256)(7))
    assert(Enhance.applyLut(250.0, l, Some(250.0)) === 250.0)
    assert(Enhance.applyLut(250.0, l, None) === 7.0) // same value, no nodata → mapped

    // histogram skip: band of {10, nodata}; min/max must come from 10 alone
    val l2 = Enhance.equalizationLut(
      tiles((gx, _) => if (gx % 2 == 0) 10.0 else 250.0), Some(250.0))
    assert(l2.scaleMin === 9.5 && l2.scaleMax === 10.5) // min==max over valid
  }

  test("equalize is map-only after the LUT jobs (no shuffle in the plan)") {
    val out = Enhance.equalize(tiles((gx, gy) => (gx + gy).toDouble))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(out.count() === 4) // z=1 → 2x2 tiles survive
  }
}
