package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** tee / materialize pipeline step (`gdal ... tee` — one upstream, several
  * sinks without re-reading): in Spark the idiom is persist() + N actions.
  * This pins the contract the COVERAGE row claims: the second consumer
  * reuses the cached relation (no second scan) and both sinks see the
  * identical row set. */
class TeeMaterializeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("persist + two sinks: one upstream evaluation, identical outputs") {
    import spark.implicits._
    val evals = spark.sparkContext.longAccumulator("upstream_evals")
    val src = (0 until 1000).toDF("i")
      .map { r => evals.add(1); r.getInt(0).toLong } // count upstream work
      .toDF("v")
      .persist()
    val outA = java.nio.file.Files.createTempDirectory("tee_a").toString
    val outB = java.nio.file.Files.createTempDirectory("tee_b").toString
    src.write.mode("overwrite").parquet(outA) // materializes the cache
    val evalsAfterFirst = evals.value
    assert(evalsAfterFirst === 1000L, "first sink evaluates upstream once")
    src.groupBy().agg(sum("v")).write.mode("overwrite").parquet(outB)
    assert(evals.value === evalsAfterFirst, "second sink must NOT re-run upstream")
    // second consumer's plan reads the InMemoryRelation, not the source
    val plan = src.groupBy().agg(sum("v")).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    val a = spark.read.parquet(outA).as[Long].collect().sorted
    val b = spark.read.parquet(outB).as[Long].collect()
    assert(a.toSeq === (0L until 1000L))
    assert(b.toSeq === Seq((0L until 1000L).sum))
    src.unpersist()
  }
}
