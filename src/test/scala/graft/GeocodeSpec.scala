package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Geocode

/** Geocode matching semantics (the OGRGeocode cache-and-match analog) +
  * the scale-shape contract: the query side is the 100 TB side and must
  * reach its match through broadcast joins only — no query-side Exchange. */
class GeocodeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gaz = Seq(
    (0L, "Springfield", -93.29, 37.21),
    (1L, "Springvale", -70.45, 43.47),
    (2L, "Shelbyville", -85.78, 39.52),
    (3L, "Ogdenville", -111.97, 41.22)
  ).toDF("key", "name", "lon", "lat")

  test("forward: exact normalized match scores 1000 and wins over fuzzy") {
    val q = Seq((10L, "  SPRINGFIELD "), (11L, "springfeld"), (12L, "zzz"))
      .toDF("qid", "query")
    val got = Geocode.forward(q, gaz, minSimMilli = 400)
      .select("qid", "key", "sim_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // qid 10: exact (case+padding normalized) → key 0 at 1000
    // qid 11: misspelled → fuzzy, still key 0 (shares 8 of 11 trigrams)
    // qid 12: below threshold → no row
    assert(got.length === 2)
    assert(got(0) === ((10L, 0L, 1000L)))
    assert(got(1)._1 === 11L && got(1)._2 === 0L &&
      got(1)._3 >= 400L && got(1)._3 < 1000L)
  }

  test("forward: deterministic tie-break by (sim desc, name, key)") {
    // query equidistant (same integer milli-sim) from two entries with
    // equal trigram overlap: name order decides
    val g2 = Seq((7L, "abcdefg"), (5L, "abcdefh")).toDF("key", "name")
      .withColumn("lon", lit(0.0)).withColumn("lat", lit(0.0))
    val q = Seq((1L, "abcdefx")).toDF("qid", "query")
    val got = Geocode.forward(q, g2, minSimMilli = 100).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("name") === "abcdefg") // 'g' < 'h'
  }

  test("reverse: nearest entry by great-circle, tie-break by key") {
    val pts = Seq((100L, -93.0, 37.0), (101L, -70.0, 43.0))
      .toDF("qid", "plon", "plat")
    val got = Geocode.reverse(pts, gaz).select("qid", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq((100L, 0L), (101L, 1L)))
  }

  test("plan shape: no query-side Exchange in forward (broadcast-only)") {
    val q = Seq((10L, "springfield"), (11L, "springfeld")).toDF("qid", "query")
    val plan = Geocode.forward(q, gaz).queryExecution.executedPlan.toString
    // window ranking of fuzzy candidates partitions by qid — the ONLY
    // allowed exchange is that per-query-row candidate ranking (bounded:
    // #candidates ≤ gazetteer size per query); the scan side itself must
    // meet the gazetteer via Broadcast joins
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.length <= 1, s"too many shuffles:\n$plan")
  }
}
