package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Raster, Tile, TileIndex}
import graft.geom.Mercator

/** gdaltindex/gdalbuildvrt analog: VRT window algebra (non-overlap, exact
  * coverage), mosaic == closed-form crop, and the index-driven read must
  * prune hive partitions at plan time (the point of a tile index at 100 TB:
  * a bbox query touches only the files whose footprint intersects). */
class TileIndexSpec extends AnyFunSuite {

  private def synth(z: Int) = {
    val s = SparkTestSession.spark
    Raster.syntheticTiles(s, z) { (gx, gy) => ((7919L * gx + 104729L * gy) % 9973L).toDouble }
  }

  test("vrt windows: dst non-overlap and exact bbox coverage") {
    val s = SparkTestSession.spark
    val os = Mercator.OriginShift
    val idx = TileIndex.buildIndex(synth(3))
    val (mnx, mny, mxx, mxy) = (-0.37 * os, -0.11 * os, 0.52 * os, 0.63 * os)
    val srcs = TileIndex.buildVrt(idx, mnx, mny, mxx, mxy).collect()
    assert(srcs.nonEmpty)
    // dst extent rounded out, as buildVrt computes it
    val res = Mercator.resolution(3)
    val dw = math.ceil((mxx + os) / res).toLong - math.floor((mnx + os) / res).toLong
    val dh = math.ceil((os - mny) / res).toLong - math.floor((os - mxy) / res).toLong
    // every dst pixel covered exactly once (full synthetic grid → no gaps)
    val covered = new java.util.BitSet((dw * dh).toInt)
    srcs.foreach { sr =>
      var r = 0
      while (r < sr.h) {
        var c = 0
        while (c < sr.w) {
          val bit = ((sr.dstYOff + r).toLong * dw + (sr.dstXOff + c)).toInt
          assert(!covered.get(bit), s"dst pixel covered twice at src $sr")
          covered.set(bit)
          c += 1
        }
        r += 1
      }
    }
    assert(covered.cardinality() == dw * dh,
      s"coverage ${covered.cardinality()} != ${dw * dh}")
  }

  test("mosaic == closed-form crop of the synthetic raster") {
    val s = SparkTestSession.spark
    import s.implicits._
    val os = Mercator.OriginShift
    val z = 2
    val tiles = synth(z)
    val idx = TileIndex.buildIndex(tiles)
    val (mnx, mny, mxx, mxy) = (-0.6 * os, -0.45 * os, 0.3 * os, 0.7 * os)
    val vrt = TileIndex.buildVrt(idx, mnx, mny, mxx, mxy)
    val out = TileIndex.mosaic(tiles, vrt).collect()
    val res = Mercator.resolution(z)
    val dx0 = math.floor((mnx + os) / res).toLong
    val dy0 = math.floor((os - mxy) / res).toLong
    val dx1 = math.ceil((mxx + os) / res).toLong
    val dy1 = math.ceil((os - mny) / res).toLong
    assert(out.nonEmpty)
    out.foreach { t =>
      var i = 0
      while (i < t.pixels.length) {
        val dpx = t.x.toLong * t.w + (i % t.w)
        val dpy = t.y.toLong * t.h + (i / t.w)
        val (gx, gy) = (dpx + dx0, dpy + dy0)
        val want =
          if (dpx < dx1 - dx0 && dpy < dy1 - dy0)
            ((7919L * gx + 104729L * gy) % 9973L).toDouble
          else 0.0 // dst-grid padding beyond the request
        assert(t.pixels(i) == want, s"tile (${t.x},${t.y}) px $i: ${t.pixels(i)} != $want")
        i += 1
      }
    }
  }

  test("index-driven bbox read prunes hive partitions at plan time") {
    val s = SparkTestSession.spark
    import s.implicits._
    val os = Mercator.OriginShift
    val path = "/tmp/graft_tindex_spec"
    val tiles = synth(3) // 64 tiles, 8 x-columns
    tiles.toDF().write.mode("overwrite").partitionBy("x").parquet(path)
    // index query → x-range → partition-pruned read
    val idx = TileIndex.buildIndex(tiles)
    val sel = TileIndex.queryBbox(idx, 0.1 * os, -os, 0.9 * os, os)
      .select("x").distinct().as[Int].collect().sorted
    assert(sel.length < 8 && sel.nonEmpty, s"bbox should select a strict subset: ${sel.toSeq}")
    val rd = s.read.parquet(path).where(col("x").isin(sel.map(Integer.valueOf): _*))
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("x"),
      s"expected x partition filter in:\n$plan")
    assert(rd.count() == sel.length.toLong * 8, "each x column holds 8 tiles at z3")
  }
}
