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
}
