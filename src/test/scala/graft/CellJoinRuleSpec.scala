package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{gf, GraftFunctions}

/** The optimizer rule must turn a naive spatial-predicate join (nested
  * loop) into a cell equi-join, with identical results. */
class CellJoinRuleSpec extends AnyFunSuite {

  test("naive st_contains_point join is rewritten to a hash join on cell") {
    val s = SparkTestSession.spark
    GraftFunctions.register(s)
    import s.implicits._
    val pts = Queries.eventPoints(s, "/root/testdata/sf0.001")
      .where(col("event_id") < 3000).cache()
    val polys = (0 until 20).map { i =>
      val x0 = -180.0 + 18.0 * i
      (i.toLong, s"POLYGON (($x0 -50, ${x0 + 10} -50, ${x0 + 10} 50, $x0 50, $x0 -50))")
    }.toDF("poly_id", "wkt")
      .withColumn("wkb", gf.st_geomfromtext(col("wkt"))).drop("wkt").cache()

    // naive formulation: join condition is ONLY the spatial predicate
    val naive = pts.join(polys,
      gf.st_contains_point(polys("wkb"), pts("lon"), pts("lat")))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("__graft_cell") || plan.contains("HashJoin") ||
      plan.contains("SortMergeJoin"), s"no equi-join in:\n$plan")

    // results must equal the hand-built cell join
    val got = naive.select("event_id", "poly_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = engine.SpatialJoin.pipJoin(pts, polys, z = 4)
      .select("event_id", "poly_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length}")
    assert(got.nonEmpty)
  }
}
