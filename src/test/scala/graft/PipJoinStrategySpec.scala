package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{gf, GraftFunctions}

/** The SparkStrategy path (PipJoinExec.scala): with
  * spark.graft.celljoin.strategy=exec a naive st_contains_point join must
  * plan as BroadcastPipJoinExec (no nested loop, no exploded cover) and
  * return exactly the rows the Rule path / naive path return. Runs on an
  * isolated newSession so the conf never leaks into other suites. */
class PipJoinStrategySpec extends AnyFunSuite {

  private def fixture(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val pts = Queries.eventPoints(s, "/root/testdata/sf0.001")
      .where(col("event_id") < 2000)
    val polys = (0 until 12).map { i =>
      val x0 = -180.0 + 30.0 * i
      (i.toLong, s"POLYGON (($x0 -60, ${x0 + 20} -60, ${x0 + 20} 60, $x0 60, $x0 -60))")
    }.toDF("poly_id", "wkt")
      .withColumn("wkb", gf.st_geomfromtext(col("wkt"))).drop("wkt")
    (pts, polys)
  }

  private def join(s: org.apache.spark.sql.SparkSession) = {
    val (pts, polys) = fixture(s)
    pts.join(polys, gf.st_contains_point(polys("wkb"), pts("lon"), pts("lat")))
      .select("event_id", "poly_id")
  }

  test("exec mode plans BroadcastPipJoinExec and matches the rule path") {
    val base = SparkTestSession.spark
    val ruleRows = join(base).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val s = base.newSession()
    GraftFunctions.register(s)
    s.conf.set("spark.graft.celljoin.strategy", "exec")
    val df = join(s)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastPipJoin"), s"strategy did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"quadratic join remained:\n$plan")
    val execRows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(execRows === ruleRows)
    assert(execRows.nonEmpty)
  }

  test("boundary predicate (st_intersects_point) also plans through the strategy") {
    val base = SparkTestSession.spark
    val s = base.newSession()
    GraftFunctions.register(s)
    s.conf.set("spark.graft.celljoin.strategy", "exec")
    val (pts, polys) = fixture(s)
    val df = pts.join(polys,
        gf.st_intersects_point(polys("wkb"), pts("lon"), pts("lat")))
      .select("event_id", "poly_id")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastPipJoin"))
    val want = join(base).count() // boundary hits are a superset of interior
    assert(df.count() >= want)
  }

  test("oversize polygon (cover above the 4096-cell cap) degrades to the side list") {
    val base = SparkTestSession.spark
    val s = base.newSession()
    GraftFunctions.register(s)
    import s.implicits._
    s.conf.set("spark.graft.celljoin.strategy", "exec")
    s.conf.set("spark.graft.celljoin.zoom", "12") // world cover at z12 >> 4096
    val pts = Queries.eventPoints(s, "/root/testdata/sf0.001")
      .where(col("event_id") < 500)
    val world = Seq((0L, "POLYGON ((-179 -84, 179 -84, 179 84, -179 84, -179 -84))"))
      .toDF("poly_id", "wkt")
      .withColumn("wkb", gf.st_geomfromtext(col("wkt"))).drop("wkt")
    val df = pts.join(world,
        gf.st_contains_point(world("wkb"), pts("lon"), pts("lat")))
      .select("event_id", "poly_id")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastPipJoin"))
    val inWorld = pts.where(col("lon") > -179 && col("lon") < 179 &&
      col("lat") > -84 && col("lat") < 84).count()
    assert(df.count() === inWorld)
  }
}
