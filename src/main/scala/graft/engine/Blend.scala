package graft.engine

import org.apache.spark.sql.Dataset

/** Raster blend (reference: `gdal raster blend` src-over operator,
  * /root/reference/apps/gdalalg_raster_blend.cpp:1711-1780
  * BlendSrcOverRGBA_Generic — exact integer Porter–Duff over with the
  * (x*y+255)/256 ratio product and the (255<<8 + a/2)/a inverse-alpha
  * table). All arithmetic is integer, so the oracle twin is bit-exact.
  * Spark shape: tag-union the 8 bands, ONE shuffle per (z,x,y), per-tile
  * integer loop. */
object Blend {

  @inline private def mul255(a: Int, b: Int): Int = (a * b + 255) / 256

  @inline private def div255(a: Int, b: Int): Int =
    if (a == 0) 0 else if (b == 0) 255 else (a * 255) / b

  /** Generic premultiplied composition (BlendMultiply_Generic /
    * BlendScreen_Generic shape, gdalalg_raster_blend.cpp:890-1000):
    * alpha via ProcessAlphaChannels, channels premultiplied with
    * MulScale255, per-mode Dca' formula, unpremultiply with DivScale255.
    * Modes: "multiply" (Sca.Dca + Sca(1-Da) + Dca(1-Sa)), "screen"
    * (Sca + Dca - Sca.Dca). */
  def compose(base: Seq[Dataset[Tile]], overlay: Seq[Dataset[Tile]],
              opacity: Int, mode: String): Dataset[Tile] = {
    require(mode == "multiply" || mode == "screen", s"mode $mode")
    require(base.length == 4 && overlay.length == 4)
    val spark = base.head.sparkSession
    import spark.implicits._
    val isMultiply = mode == "multiply"
    val tagged = (base ++ overlay).zipWithIndex
      .map { case (ds, i) => ds.map(t => t.copy(band = i)) }
      .reduce(_ union _)
    tagged.groupByKey(t => (t.z, t.x, t.y))
      .flatMapGroups { (key, it) =>
        val (z, x, y) = key
        val bands = new Array[Array[Double]](8)
        var tw = 0; var th = 0
        it.foreach { t => bands(t.band) = t.pixels; tw = t.w; th = t.h }
        if (bands.exists(_ == null)) Iterator.empty
        else {
          val n = tw * th
          val outs = Array.fill(4)(new Array[Double](n))
          var i = 0
          while (i < n) {
            // ProcessAlphaChannels (opacity on overlay alpha)
            val a = bands(3)(i).toInt
            val oa = mul255(bands(7)(i).toInt, opacity)
            val finalA = oa + a - mul255(oa, a)
            var c = 0
            while (c < 3) {
              // premultiply
              val dca = mul255(bands(c)(i).toInt, a)
              val sca = mul255(bands(4 + c)(i).toInt, oa)
              val outP =
                if (isMultiply)
                  mul255(dca, sca) + mul255(dca, 255 - oa) + mul255(sca, 255 - a)
                else sca + dca - mul255(sca, dca)
              outs(c)(i) = div255(outP, finalA)
              c += 1
            }
            outs(3)(i) = finalA
            i += 1
          }
          outs.iterator.zipWithIndex.map { case (px, bi) =>
            Tile(z, x, y, bi + 1, tw, th, px)
          }
        }
      }
  }

  /** bands: base r,g,b,a = 0..3; overlay r,g,b,a = 4..7. Output bands
    * 1..4 = blended r,g,b,a. Opacity in [0,255]. */
  def srcOver(base: Seq[Dataset[Tile]], overlay: Seq[Dataset[Tile]],
              opacity: Int): Dataset[Tile] = {
    require(base.length == 4 && overlay.length == 4)
    val spark = base.head.sparkSession
    import spark.implicits._
    val tagged = (base ++ overlay).zipWithIndex
      .map { case (ds, i) => ds.map(t => t.copy(band = i)) }
      .reduce(_ union _)
    tagged.groupByKey(t => (t.z, t.x, t.y))
      .flatMapGroups { (key, it) =>
        val (z, x, y) = key
        val bands = new Array[Array[Double]](8)
        var tw = 0; var th = 0
        it.foreach { t => bands(t.band) = t.pixels; tw = t.w; th = t.h }
        if (bands.exists(_ == null)) Iterator.empty
        else {
          val n = tw * th
          val outs = Array.fill(4)(new Array[Double](n))
          var i = 0
          while (i < n) {
            val r = bands(0)(i).toInt; val g = bands(1)(i).toInt
            val b = bands(2)(i).toInt; val a = bands(3)(i).toInt
            val or0 = bands(4)(i).toInt; val og = bands(5)(i).toInt
            val ob = bands(6)(i).toInt
            val oa = (bands(7)(i).toInt * opacity + 255) / 256
            val srcAmul = (a * (255 - oa) + 255) / 256
            val dstA = oa + srcAmul
            var dstR = (or0 * oa + r * srcAmul + 255) / 256
            var dstG = (og * oa + g * srcAmul + 255) / 256
            var dstB = (ob * oa + b * srcAmul + 255) / 256
            val invDstA = if (dstA == 0) 0 else ((255 << 8) + dstA / 2) / dstA
            dstR = (dstR * invDstA + 255) >> 8
            dstG = (dstG * invDstA + 255) >> 8
            dstB = (dstB * invDstA + 255) >> 8
            outs(0)(i) = dstR; outs(1)(i) = dstG; outs(2)(i) = dstB; outs(3)(i) = dstA
            i += 1
          }
          outs.iterator.zipWithIndex.map { case (px, bi) =>
            Tile(z, x, y, bi + 1, tw, th, px)
          }
        }
      }
  }
}
