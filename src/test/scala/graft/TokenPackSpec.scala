package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.TokenPack

/** Two-pass distributed prefix-sum properties for the concat-and-chunk
  * token index (d18 engine): bucket-count invariance (the offsets move,
  * the answer must not), agreement with a naive sequential scan, and the
  * empty-doc/EOS edge. */
class TokenPackSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong * 3 + 1, t) } // gappy ids
      .toDF("doc_id", "text")
  }

  private def naive(texts: Seq[String], budget: Int): Seq[(Long, Long, Long, Long, Long)] = {
    var run = 0L
    texts.zipWithIndex.map { case (t, i) =>
      val words = (t.length - t.replace(" ", "").length + 1).toLong
      val start = run
      run += words + 1
      val last = start + math.max(words - 1, 0)
      (i.toLong * 3 + 1, words, start, start / budget, last / budget)
    }
  }

  test("matches a naive sequential scan at several bucket counts") {
    val texts = (0 until 57).map(i => Seq.fill(1 + (i * 7) % 23)("w" + i).mkString(" "))
    val expect = naive(texts, 16)
    for (nb <- Seq(1, 3, 16, 64)) {
      val got = TokenPack.chunkIndex(docsDf(texts), budget = 16, nBuckets = nb)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      assert(got == expect, s"nBuckets=$nb")
    }
  }

  test("chunks partition the stream: next doc's start is prev start + nt + 1") {
    val texts = (0 until 30).map(i => Seq.fill(5 + i % 7)("x").mkString(" "))
    val rows = TokenPack.chunkIndex(docsDf(texts), budget = 8, nBuckets = 4)
      .orderBy("doc_id").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1) + 1)
    }
    assert(rows.head.getLong(2) == 0L)
  }

  test("single-word and empty-ish docs: EOS still advances the stream") {
    val rows = TokenPack.chunkIndex(docsDf(Seq("a", "b c", "d")), budget = 2, nBuckets = 2)
      .orderBy("doc_id").collect()
    // "a"(1)+EOS → start 0, "b c"(2)+EOS → start 2, "d"(1) → start 5
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 2L, 5L))
    assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 1L, 2L)) // last_chunk
  }
}
