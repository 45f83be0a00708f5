package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryFixtures._

/** Round-2 gate queries: the remaining gdaldem derivatives, the
  * neighbors focal-statistics kernels, warp resampling kernels, and the
  * overlay/viewshed/pansharpen families (SURVEY.md §2.F/§2.G rows the
  * round-1 verdict flagged as missing). Same conventions as [[Queries]]. */
object Queries2 {

  /** GDALChecksumImage column over per-pixel ints, negative-safe: the
    * engine masks the accumulator with &0xffff per row (always the
    * canonical [0,65535] representative), so the SQL twin takes the same
    * representative of the total sum. */
  private def cksCol(iv: String): String =
    s"CAST(((sum($iv % ([7,11,13,17,19,23,29,31,37,41,43])[CAST((cy * 256 + cx) % 11 AS INT) + 1]) % 65536) + 65536) % 65536 AS BIGINT)"

  private def toInt(col: String): String = s"CAST(floor($col + 0.5) AS BIGINT)"

  val defs4: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // -- gdaldem aspect / TPI / TRI (Riley + Wilson) / roughness over the
    // tiled synthetic raster: ONE halo exchange feeds all five kernels
    // (focal3x3Multi), checksummed per tile; the oracle recomputes every
    // 3x3 window in closed form (same double arithmetic, so bit-exact
    // before the checksum rounding)
    ("r13_dem_extras", (s, dir) => {
      val sp = s
      import sp.implicits._
      val z = 3
      val base = engine.Raster.syntheticTiles(s, z) { (gx, gy) =>
        ((gx * 7919 + gy * 104729) % 9973).toDouble
      }
      val kernels: Seq[Array[Double] => Double] = Seq(
        engine.Focal.aspectWindow(), engine.Focal.tpiWindow _,
        engine.Focal.triRileyWindow _, engine.Focal.triWilsonWindow _,
        engine.Focal.roughnessWindow _)
      engine.Focal.focal3x3Multi(base, kernels)
        .map { case (k, ti) => (ti.x.toLong, ti.y.toLong, k,
          engine.Raster.checksum(ti.pixels, ti.w, ti.h).toLong) }
        .toDF("x", "y", "k", "cks")
        .groupBy("x", "y")
        .agg(max(when(col("k") === 0, col("cks"))).as("cks_aspect"),
          max(when(col("k") === 1, col("cks"))).as("cks_tpi"),
          max(when(col("k") === 2, col("cks"))).as("cks_tri_r"),
          max(when(col("k") === 3, col("cks"))).as("cks_tri_w"),
          max(when(col("k") === 4, col("cks"))).as("cks_rough"))
        .withColumn("z", lit(z).cast("long"))
        .select("z", "x", "y", "cks_aspect", "cks_tpi", "cks_tri_r",
          "cks_tri_w", "cks_rough")
        .orderBy("x", "y")
    }, Some {
      val maxG = 8 * 256 - 1
      def fAt(dx: Int, dy: Int) =
        s"CAST(((gx + ($dx)) * 7919 + (gy + ($dy)) * 104729) % 9973 AS DOUBLE)"
      val (a, b, c) = (fAt(-1, -1), fAt(0, -1), fAt(1, -1))
      val (d0, e0, f0) = (fAt(-1, 0), fAt(0, 0), fAt(1, 0))
      val (g0, h0, i0) = (fAt(-1, 1), fAt(0, 1), fAt(1, 1))
      val pi = dlit(math.Pi)
      // aspect (gdaldem_lib.cpp:1441): unweighted-corner gradient,
      // azimuth fold, flat -> -9999 nodata
      val dxA = s"(($c + 2.0 * $f0 + $i0) - ($a + 2.0 * $d0 + $g0))"
      val dyA = s"(($g0 + 2.0 * $h0 + $i0) - ($a + 2.0 * $b + $c))"
      val asp0 = s"(atan2($dyA, -($dxA)) * 180.0 / $pi)"
      val az = s"(CASE WHEN $asp0 > 90.0 THEN 450.0 - $asp0 ELSE 90.0 - $asp0 END)"
      val aspect = s"(CASE WHEN $dxA = 0.0 AND $dyA = 0.0 THEN -9999.0 " +
        s"WHEN $az = 360.0 THEN 0.0 ELSE $az END)"
      val tpi = s"($e0 - (($a + $b + $c + $d0 + $f0 + $g0 + $h0 + $i0) * 0.125))"
      val triR = s"sqrt(($a-$e0)*($a-$e0) + ($b-$e0)*($b-$e0) + ($c-$e0)*($c-$e0) + " +
        s"($d0-$e0)*($d0-$e0) + ($f0-$e0)*($f0-$e0) + ($g0-$e0)*($g0-$e0) + " +
        s"($h0-$e0)*($h0-$e0) + ($i0-$e0)*($i0-$e0))"
      val triW = s"((abs($a-$e0) + abs($b-$e0) + abs($c-$e0) + abs($d0-$e0) + " +
        s"abs($f0-$e0) + abs($g0-$e0) + abs($h0-$e0) + abs($i0-$e0)) * 0.125)"
      val all = s"$a, $b, $c, $d0, $e0, $f0, $g0, $h0, $i0"
      val rough = s"(greatest($all) - least($all))"
      val border = s"gx = 0 OR gy = 0 OR gx = $maxG OR gy = $maxG"
      s"""WITH px AS (SELECT xs.gx AS gx, ys.gy AS gy
            FROM (SELECT unnest(generate_series(0, $maxG)) AS gx) xs
            CROSS JOIN (SELECT unnest(generate_series(0, $maxG)) AS gy) ys),
          v AS (SELECT gx, gy,
            CASE WHEN $border THEN 0.0 ELSE $aspect END AS va,
            CASE WHEN $border THEN 0.0 ELSE $tpi END AS vt,
            CASE WHEN $border THEN 0.0 ELSE $triR END AS vr,
            CASE WHEN $border THEN 0.0 ELSE $triW END AS vw,
            CASE WHEN $border THEN 0.0 ELSE $rough END AS vg FROM px),
          cells AS (SELECT gx >> 8 AS tx, gy >> 8 AS ty, gx % 256 AS cx, gy % 256 AS cy,
            ${toInt("va")} AS iva, ${toInt("vt")} AS ivt, ${toInt("vr")} AS ivr,
            ${toInt("vw")} AS ivw, ${toInt("vg")} AS ivg FROM v)
          SELECT CAST(3 AS BIGINT) AS z, tx AS x, ty AS y,
            ${cksCol("iva")} AS cks_aspect, ${cksCol("ivt")} AS cks_tpi,
            ${cksCol("ivr")} AS cks_tri_r, ${cksCol("ivw")} AS cks_tri_w,
            ${cksCol("ivg")} AS cks_rough
          FROM cells GROUP BY 2, 3 ORDER BY x, y"""
    }),

    // -- neighbors focal statistics (gdalalg_raster_neighbors methods
    // sum/min/max/median/stddev/mode): five kernels over the hash raster
    // in one halo pass, mode over a (gx+gy)%5 raster whose window mode has
    // the closed form (gx+gy)%5 (offset-sum multiplicities 1,2,3,2,1 over
    // five distinct residues — unique mode, no tie ambiguity)
    ("r14_focal_stats", (s, dir) => {
      val sp = s
      import sp.implicits._
      val z = 2
      val base = engine.Raster.syntheticTiles(s, z) { (gx, gy) =>
        ((gx * 7919 + gy * 104729) % 9973).toDouble
      }
      val modeBase = engine.Raster.syntheticTiles(s, z) { (gx, gy) =>
        ((gx + gy) % 5).toDouble
      }
      val kernels: Seq[Array[Double] => Double] = Seq(
        engine.Focal.sumWindow _, engine.Focal.minWindow _,
        engine.Focal.maxWindow _, engine.Focal.medianWindow _,
        engine.Focal.stddevWindow _)
      val stats = engine.Focal.focal3x3Multi(base, kernels)
        .map { case (k, ti) => (ti.x.toLong, ti.y.toLong, k,
          engine.Raster.checksum(ti.pixels, ti.w, ti.h).toLong) }
        .toDF("x", "y", "k", "cks")
        .groupBy("x", "y")
        .agg(max(when(col("k") === 0, col("cks"))).as("cks_sum"),
          max(when(col("k") === 1, col("cks"))).as("cks_min"),
          max(when(col("k") === 2, col("cks"))).as("cks_max"),
          max(when(col("k") === 3, col("cks"))).as("cks_med"),
          max(when(col("k") === 4, col("cks"))).as("cks_sd"))
      val mode = engine.Focal.focal3x3(modeBase, engine.Focal.modeWindow)
        .map(ti => (ti.x.toLong, ti.y.toLong,
          engine.Raster.checksum(ti.pixels, ti.w, ti.h).toLong))
        .toDF("x", "y", "cks_mode")
      stats.join(mode, Seq("x", "y"))
        .withColumn("z", lit(z).cast("long"))
        .select("z", "x", "y", "cks_sum", "cks_min", "cks_max", "cks_med",
          "cks_sd", "cks_mode")
        .orderBy("x", "y")
    }, Some {
      val maxG = 4 * 256 - 1
      def fAt(dx: Int, dy: Int) =
        s"CAST(((gx + ($dx)) * 7919 + (gy + ($dy)) * 104729) % 9973 AS DOUBLE)"
      val w9 = for (dy <- -1 to 1; dx <- -1 to 1) yield fAt(dx, dy)
      val sum9 = w9.mkString("(", " + ", ")")
      val sq9 = w9.map(v => s"$v * $v").mkString("(", " + ", ")")
      val lst = w9.mkString("[", ", ", "]")
      val med = s"(list_sort($lst)[5])"
      val sd = s"sqrt($sq9 / 9.0 - ($sum9 / 9.0) * ($sum9 / 9.0))"
      val mn = w9.mkString("least(", ", ", ")")
      val mx = w9.mkString("greatest(", ", ", ")")
      val modeV = "CAST((gx + gy) % 5 AS DOUBLE)"
      val border = s"gx = 0 OR gy = 0 OR gx = $maxG OR gy = $maxG"
      s"""WITH px AS (SELECT xs.gx AS gx, ys.gy AS gy
            FROM (SELECT unnest(generate_series(0, $maxG)) AS gx) xs
            CROSS JOIN (SELECT unnest(generate_series(0, $maxG)) AS gy) ys),
          v AS (SELECT gx, gy,
            CASE WHEN $border THEN 0.0 ELSE $sum9 END AS vs,
            CASE WHEN $border THEN 0.0 ELSE $mn END AS vn,
            CASE WHEN $border THEN 0.0 ELSE $mx END AS vx,
            CASE WHEN $border THEN 0.0 ELSE $med END AS vm,
            CASE WHEN $border THEN 0.0 ELSE $sd END AS vd,
            CASE WHEN $border THEN 0.0 ELSE $modeV END AS vo FROM px),
          cells AS (SELECT gx >> 8 AS tx, gy >> 8 AS ty, gx % 256 AS cx, gy % 256 AS cy,
            ${toInt("vs")} AS ivs, ${toInt("vn")} AS ivn, ${toInt("vx")} AS ivx,
            ${toInt("vm")} AS ivm, ${toInt("vd")} AS ivd, ${toInt("vo")} AS ivo FROM v)
          SELECT CAST(2 AS BIGINT) AS z, tx AS x, ty AS y,
            ${cksCol("ivs")} AS cks_sum, ${cksCol("ivn")} AS cks_min,
            ${cksCol("ivx")} AS cks_max, ${cksCol("ivm")} AS cks_med,
            ${cksCol("ivd")} AS cks_sd, ${cksCol("ivo")} AS cks_mode
          FROM cells GROUP BY 2, 3 ORDER BY x, y"""
    })
  )
}
