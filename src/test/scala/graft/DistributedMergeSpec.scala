package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Nearblack, Polygonize, Raster, Sieve, Tile}

/** The three cross-tile merge ops (sieve / polygonize / nearblack) must be
  * tiling-invariant with the driver fast path DISABLED
  * (spark.graft.cc.driverLimit=0): every cross-tile component merge runs
  * through the distributed hash-min path, proving no O(pixels)- or
  * O(perimeter)-sized structure needs to reach the driver — the round-2
  * verdict's three scale-killers. */
class DistributedMergeSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("sieve + polygonize + nearblack tiling-invariant on the distributed CC path") {
    val s = spark
    import s.implicits._
    val g = 32
    // blocky value field with speckle: plenty of components crossing tile
    // borders at both tilings (local vals: closures must not capture the
    // non-serializable suite instance)
    val f = (gx: Long, gy: Long) =>
      (((gx / 5) * 11 + (gy / 4) * 5 + (if ((gx * 29 + gy * 13) % 17 < 2) 1 else 0)) % 4).toDouble
    def grid(ts: Array[Tile]): Array[Double] = {
      val out = new Array[Double](g * g)
      ts.foreach { t =>
        for (y <- 0 until t.h; x <- 0 until t.w)
          out((t.y * t.h + y) * g + (t.x * t.w + x)) = t.pixels(y * t.w + x)
      }
      out
    }
    s.conf.set("spark.graft.cc.driverLimit", "0")
    try {
      val t8 = Raster.syntheticTiles(s, 2, tileSize = 8)(f)   // 4×4 of 8px
      val t16 = Raster.syntheticTiles(s, 1, tileSize = 16)(f) // 2×2 of 16px

      // sieve
      val sa = grid(Sieve.sieve(t8, width = g, threshold = 6).collect())
      val sb = grid(Sieve.sieve(t16, width = g, threshold = 6).collect())
      assert(sa.sameElements(sb), "sieve differs between tilings")

      // polygonize
      def comps(ts: org.apache.spark.sql.Dataset[Tile]) =
        Polygonize.components(ts, width = g)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
      val ca = comps(t8); val cb = comps(t16)
      assert(ca == cb, "polygonize components differ between tilings")
      assert(ca.map(_._3).sum == g.toLong * g, "component sizes must cover the raster")

      // nearblack: near-black collar plus an interior near-black island —
      // only the collar-connected region may be scrubbed
      val nf = (gx: Long, gy: Long) => {
        val edge = gx < 3 || gy < 3 || gx >= g - 3 || gy >= g - 3
        val island = gx >= 14 && gx < 18 && gy >= 14 && gy < 18
        if (edge || island) 1.0 else 5.0
      }
      val n8 = Raster.syntheticTiles(s, 2, tileSize = 8)(nf)
      val n16 = Raster.syntheticTiles(s, 1, tileSize = 16)(nf)
      val na = grid(Nearblack.nearblack(n8, 4, 4, v => v < 2.0).collect())
      val nb = grid(Nearblack.nearblack(n16, 2, 2, v => v < 2.0).collect())
      assert(na.sameElements(nb), "nearblack differs between tilings")
      assert(na(0) == 0.0, "collar must be scrubbed to fill")
      assert(na(15 * g + 15) == 1.0, "interior island must be preserved")
    } finally s.conf.unset("spark.graft.cc.driverLimit")
  }
}
