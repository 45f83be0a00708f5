package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GridInterp

/** Linear (Delaunay) gridding beyond the affine-field gate (g35 proves
  * engine/SQL parity on affine data): tiling invariance — when the halo
  * covers the whole point set, the per-tile distributed triangulation
  * must reproduce the single-tile (≈ single-node GDAL) result exactly,
  * including on a non-affine field where facet choice matters. */
class GridLinearSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("per-tile linear gridding matches the single-tile run on a non-affine field") {
    import spark.implicits._
    val pts = (0 until 200).map { k =>
      val x = 10.0 * ((k * 0.6180339887498949) % 1.0)
      val y = 8.0 * ((k * 0.41421356237309515) % 1.0)
      (k.toLong, x, y, x * x + 3.0 * y)
    }.toDF("pid", "lon", "lat", "value")
    val nodes = GridInterp.gridNodes(spark, 16, 16, -5.0, 15.0, -5.0, 13.0)
    def run(tile: Double) =
      GridInterp.linear(nodes, pts, radius = 2.0, tileSize = tile, halo = 13.0)
        .select("i", "j", "src", "value").orderBy("i", "j")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    val single = run(100.0)
    val tiled = run(3.0)
    assert(single.length == 256 && tiled.length == 256)
    single.zip(tiled).foreach { case ((i1, j1, s1, v1), (i2, j2, s2, v2)) =>
      assert(i1 == i2 && j1 == j2 && s1 == s2, s"node ($i1,$j1) src $s1 vs $s2")
      if (!v1.isNaN || !v2.isNaN)
        assert(math.abs(v1 - v2) < 1e-9, s"node ($i1,$j1): $v1 vs $v2")
    }
    // sanity: all three source classes occur on this layout
    val srcs = single.map(_._3).toSet
    assert(srcs == Set(0, 1, 2), s"expected all srcs, got $srcs")
  }
}
