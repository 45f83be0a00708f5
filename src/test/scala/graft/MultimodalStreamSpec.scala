package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.engine.Multimodal
import graft.engine.Multimodal.{MediaRow, MediaFeatures}
import graft.streaming.StreamJobs
import java.sql.Timestamp

/** Multimodal binary plumbing (stubbed decode) and Structured Streaming
  * jobs: batch/streaming unification — the streaming windowed counts must
  * equal the batch query over the same rows. */
class MultimodalStreamSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("multimodal: typed decode pipeline (deterministic stub)") {
    val s = spark
    import s.implicits._
    val media = Seq(
      MediaRow(1L, "media://a", "image", "hello world".getBytes("UTF-8")),
      MediaRow(2L, "media://b", "audio", Array[Byte](0, 1, 2, 3, -1)),
      MediaRow(3L, "media://c", "image", Array.emptyByteArray)
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.length == 3)
    assert(feats(0).n_bytes == 11)
    assert(feats(2).n_bytes == 0)
    // deterministic: same input → same fake dimensions/features
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.width == b.width && a.height == b.height &&
        a.features.toSeq == b.features.toSeq })
    // histogram is normalized
    assert(math.abs(feats(0).features.sum - 1.0f) < 1e-5)
    // batched variant identical
    val batched = Multimodal.extractFeaturesBatched(media).collect().sortBy(_.doc_id)
    assert(feats.zip(batched).forall { case (a, b) => a == b || a.features.toSeq == b.features.toSeq })
  }

  test("multimodal: REAL PNG decode via JDK ImageIO — exact dims + luminance histogram") {
    val s = spark
    import s.implicits._
    // 20×10 gray ramp: pixel v = (x*7 + y*13) % 256, closed-form histogram
    val png = Multimodal.grayPng(20, 10)((x, y) => (x * 7 + y * 13) % 256)
    val expected = new Array[Long](16)
    for (y <- 0 until 10; x <- 0 until 20) expected(((x * 7 + y * 13) % 256) >> 4) += 1
    val media = Seq(MediaRow(7L, "media://p.png", "image", png)).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.width == 20 && f.height == 10)
    assert(f.n_bytes == png.length)
    val counts = f.features.map(v => math.floor(v * 200.0 + 0.5).toLong).toSeq
    assert(counts == expected.toSeq)
    // corrupt payload falls back to the deterministic stub, never throws
    val bad = png.take(11) ++ Array[Byte](1, 2, 3)
    val fb = Multimodal.extractFeatures(
      Seq(MediaRow(8L, "media://bad", "image", bad)).toDS()).collect().head
    assert(fb.n_bytes == bad.length && fb.width >= 16)
  }

  test("streaming windowed counts == batch query on same rows") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val rows = (0 until 300).map { i =>
      (new Timestamp(1700000000000L + i * 61000L), if (i % 2 == 0) "click" else "view", i * 1.5)
    }
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val sdf = stream.toDF().toDF("ts", "event_type", "value")
    val q = StreamJobs.windowedCounts(sdf)
      .writeStream.format("memory").queryName("wc_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT * FROM wc_test ORDER BY wstart, event_type").collect()
      // batch twin: the exact same transform over a batch DataFrame
      val batch = StreamJobs.windowedCounts(
          rows.toDF("ts", "event_type", "value").withColumn("ts", col("ts")))
        .orderBy("wstart", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming exact dedup: first arrival of each digest survives, state watermark-bounded") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val t0 = 1700000000000L
    // 40 docs over 10 distinct texts, arriving in ts order — only the
    // first arrival of each text may pass
    val rows = (0 until 40).map { i =>
      (i.toLong, s"text-${i % 10}", new Timestamp(t0 + i * 1000L))
    }
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(rows: _*)
    val sdf = stream.toDF().toDF("doc_id", "text", "ts")
    val q = StreamJobs.streamingDedup(sdf)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = s.sql("SELECT doc_id, text FROM dedup_test ORDER BY doc_id").collect()
      assert(out.length == 10, s"got ${out.length}")
      // the survivors are the first arrivals (doc_id 0..9)
      assert(out.map(_.getLong(0)).toSeq == (0L until 10L))
      assert(out.map(_.getString(1)).distinct.length == 10)
    } finally q.stop()
  }
}
