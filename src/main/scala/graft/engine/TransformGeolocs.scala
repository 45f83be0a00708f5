package graft.engine

import org.apache.spark.sql.Dataset

/** GDALTransformGeolocations — bulk-apply a point transformer to
  * geolocation-style bands
  * (/root/reference/alg/gdaltransformgeolocs.cpp:50-131).
  *
  * The reference walks the X/Y(/Z) bands one row at a time, feeds each row
  * through the transformer, and writes the transformed values back —
  * UNCONDITIONALLY: `panSuccess` is ignored on write-back (lines 115-123),
  * so a failing transformer's sentinel outputs (e.g. HUGE_VAL) land in the
  * bands exactly as the transformer left them. A missing Z band feeds
  * z = 0 to the transformer and writes back only X and Y (line 109 memset,
  * 121 `poZBand != nullptr` guard). Mismatched band sizes abort with
  * "Size of X, Y and/or Z bands do not match." (lines 75-82).
  *
  * Spark shape: the transform is pointwise, so row-at-a-time becomes
  * tile-at-a-time — ONE co-group shuffle keys the X/Y/Z tiles of each
  * (z, x, y) cell together and the rewrite is a local pixel loop. Each
  * band byte moves exactly once; no driver state, no per-row jobs; the
  * plan is identical at 2×2 tiles and at a 10^6-tile geolocation array.
  */
object TransformGeolocs {

  /** Returns the transformed bands as one dataset: band 1 = X, band 2 = Y,
    * and band 3 = Z only when `zBand` was given (reference write-back
    * guard). `f` is the transformer in GDALTransformerFunc position
    * (dst-direction, in-place semantics): (x, y, z) → (x', y', z'). */
  def apply(xBand: Dataset[Tile], yBand: Dataset[Tile],
            zBand: Option[Dataset[Tile]],
            f: (Double, Double, Double) => (Double, Double, Double)): Dataset[Tile] = {
    val spark = xBand.sparkSession
    import spark.implicits._
    val hasZ = zBand.isDefined
    val tagged = xBand.map(t => t.copy(band = 1))
      .union(yBand.map(t => t.copy(band = 2)))
      .union(zBand.map(_.map(t => t.copy(band = 3)))
        .getOrElse(spark.emptyDataset[Tile]))
    tagged.groupByKey(t => (t.z, t.x, t.y)).flatMapGroups { (_, it) =>
      var xt: Tile = null; var yt: Tile = null; var zt: Tile = null
      it.foreach { t =>
        t.band match {
          case 1 => xt = t
          case 2 => yt = t
          case _ => zt = t
        }
      }
      require(xt != null && yt != null && (!hasZ || zt != null),
        "Size of X, Y and/or Z bands do not match.")
      require(xt.w == yt.w && xt.h == yt.h &&
        (zt == null || (zt.w == xt.w && zt.h == xt.h)),
        "Size of X, Y and/or Z bands do not match.")
      val n = xt.w * xt.h
      val ox = new Array[Double](n)
      val oy = new Array[Double](n)
      val oz = if (zt != null) new Array[Double](n) else null
      var i = 0
      while (i < n) {
        // reference: memset(padfZ, 0, ...) when no Z band (line 109)
        val z0 = if (zt != null) zt.pixels(i) else 0.0
        val (a, b, c) = f(xt.pixels(i), yt.pixels(i), z0)
        ox(i) = a; oy(i) = b
        if (oz != null) oz(i) = c
        i += 1
      }
      val out = Seq(xt.copy(pixels = ox), yt.copy(pixels = oy)) ++
        (if (oz != null) Seq(zt.copy(pixels = oz)) else Nil)
      out.iterator
    }
  }
}
