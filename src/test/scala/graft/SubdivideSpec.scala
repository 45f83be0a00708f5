package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Subdivide
import graft.functions.gf

/** Per-cell polygon subdivision properties (engine for g65): exact area
  * preservation (pieces partition the polygon), hole survival, and
  * zoom-level invariance of the piece-join row set. */
class SubdivideSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def polyDf(wkt: String) = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("p1", wkt)).toDF("poly_id", "w")
      .withColumn("wkb", gf.st_geomfromtext(col("w"))).drop("w")
  }

  test("piece areas sum to the original area (with a hole), at two zooms") {
    // spans several z=3/z=4 cells; hole area must subtract exactly once
    val df = polyDf(
      "POLYGON ((-60 -30, 70 -30, 70 40, -60 40, -60 -30), " +
        "(-10 -5, 20 -5, 20 15, -10 15, -10 -5))")
    val orig = df.select(gf.st_area(col("wkb"))).collect()(0).getDouble(0)
    for (z <- Seq(3, 4)) {
      val s = Subdivide.byCells(df, z)
        .agg(sum(gf.st_area(col("wkb")))).collect()(0).getDouble(0)
      assert(math.abs(s - orig) < 1e-6, s"z=$z: $s vs $orig")
    }
  }

  test("piece count grows with zoom and every piece stays inside its cell") {
    val df = polyDf("POLYGON ((-60 -30, 70 -30, 70 40, -60 40, -60 -30))")
    val n3 = Subdivide.byCells(df, 3).count()
    val n4 = Subdivide.byCells(df, 4).count()
    assert(n3 > 1 && n4 > n3)
    // envelope of each piece within the cell bbox (Spark [] is 0-based:
    // env = [minLon, minLat, maxLon, maxLat], g likewise)
    val viol = Subdivide.byCells(df, 3)
      .withColumn("env", gf.st_cell_env(col("cell")))
      .withColumn("g", gf.st_envelope(col("wkb")))
      .where(expr("NOT (g[0] >= env[0] - 1e-9 AND g[1] >= env[1] - 1e-9 " +
        "AND g[2] <= env[2] + 1e-9 AND g[3] <= env[3] + 1e-9)"))
      .count()
    assert(viol == 0)
  }
}
