package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamJobs

/** Streaming kill/resume E2E: a checkpointed file stream killed MID-STREAM
  * (stopped after the first micro-batch of a multi-batch run) and restarted
  * from its checkpoint must produce exactly the batch-twin aggregation — no
  * lost windows, no duplicates, regardless of where the kill landed
  * (file-source offset log + parquet sink commit log). */
class StreamResumeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("mid-stream kill + checkpoint restart reproduces the batch twin") {
    val work = "/tmp/graft_stream_kill_spec"
    val events = s"$sfDir/events.parquet"
    val p = new org.apache.hadoop.fs.Path(work)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val inDir = s"$work/in"; val outDir = s"$work/out"; val ck = s"$work/ck"

    val writers = StreamJobs.stageTimeSlices(spark, events, inDir)
    writers.foreach(_())  // everything already arrived (incl. sentinel)

    // run with one file per micro-batch and KILL after the first batch
    // commits — a mid-stream interruption at a nondeterministic-but-early
    // boundary (the invariant below must hold wherever it lands)
    val q1 = StreamJobs.runFileStream(spark, inDir, outDir, ck, events,
      maxFilesPerTrigger = Some(1))
    var waited = 0
    while (Option(q1.lastProgress).isEmpty && waited < 600) {
      q1.awaitTermination(100); waited += 1
    }
    if (q1.isActive) q1.stop()
    q1.awaitTermination()

    // resume from checkpoint to completion + flush-only restart
    StreamJobs.runFileStream(spark, inDir, outDir, ck, events).awaitTermination()
    StreamJobs.runFileStream(spark, inDir, outDir, ck, events).awaitTermination()

    val got = spark.read.parquet(outDir)
      .where(col("event_type") =!= "sentinel_flush")
      .select("wstart", "event_type", "n", "sum_cents")
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val expected = spark.read.parquet(events)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sum_cents"))
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(got.length === expected.length)
    assert(got.toSeq === expected.toSeq)
  }

  test("late-data watermark drop: interleaved arrival drops exactly the analytic set") {
    // lateDemo slices by event_id % 4 (every slice spans the full range →
    // slices 1-3 arrive almost entirely late). Replay Spark's watermark
    // advancement analytically IN BATCH SQL and require (a) exact
    // equality and (b) that the drop path genuinely fired.
    val got = StreamJobs.lateDemo(spark, s"$sfDir/events.parquet",
        "/tmp/graft_stream_late_spec")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.createOrReplaceTempView("ev_late")
    val expected = spark.sql("""
      WITH e AS (SELECT event_id, event_type, value,
                        unix_micros(CAST(ts AS TIMESTAMP)) AS us,
                        event_id % 4 AS b FROM ev_late),
      w AS (SELECT *, CAST(us / 300000000 AS BIGINT) * 300 AS wstart,
                   CAST(us / 300000000 AS BIGINT) * 300000 + 300000 AS wend_ms,
                   CAST(us / 1000 AS BIGINT) AS ms FROM e),
      bm AS (SELECT b, max(ms) AS mx FROM w GROUP BY b),
      pm AS (SELECT b, max(mx) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
             FROM bm),
      kept AS (SELECT w.* FROM w JOIN pm USING (b)
               WHERE pm.prevmax IS NULL OR w.wend_ms > pm.prevmax - 600500)
      SELECT wstart, event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM kept GROUP BY 1, 2 ORDER BY wstart, event_type""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(got.toSeq === expected.toSeq)
    val keptRows = got.map(_._3).sum
    val totalRows = ev.count()
    assert(keptRows < totalRows, s"no rows dropped ($keptRows of $totalRows) — late path untested")
    // slices 1-3 are ~75% of rows and almost all late: expect a large drop
    assert(keptRows < totalRows / 2, s"drop too small: $keptRows of $totalRows")
  }
}
