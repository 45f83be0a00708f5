package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.CellLayout

/** Cell-partitioned + hilbert-sorted layout: roundtrip equality with the
  * unpartitioned filter, and the bbox cover must appear as a planning-time
  * PartitionFilter on the scan (directory pruning, the point of the layout). */
class CellLayoutSpec extends AnyFunSuite {

  test("bbox read == direct filter; cover prunes partitions at plan time") {
    val s = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val pts = Queries.eventPoints(s, dir).cache()
    val path = "/tmp/graft_layout_spec"
    CellLayout.write(pts, path, prefixZ = 3)

    val (minLon, minLat, maxLon, maxLat) = (-20.0, -30.0, 40.0, 35.0)
    val got = CellLayout.readBbox(s, path, 3, minLon, minLat, maxLon, maxLat)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = pts.where(col("lon") >= minLon && col("lon") <= maxLon &&
        col("lat") >= minLat && col("lat") <= maxLat)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length}")

    // the pcell IN (...) predicate must be a PartitionFilter (planning-time
    // directory pruning), not a post-scan filter
    val plan = CellLayout.readBbox(s, path, 3, minLon, minLat, maxLon, maxLat)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pcell"),
      s"expected pcell partition filter in:\n$plan")
    // and the scan must read fewer partitions than exist
    val allParts = new java.io.File(path).listFiles().count(_.getName.startsWith("pcell="))
    assert(allParts > 1, "fixture should span multiple cells")
  }
}
