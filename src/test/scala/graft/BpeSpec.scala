package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Bpe

/** BPE trainer/encoder properties (engine for d22/d23): the published
  * worked example (Sennrich et al. 2016 §3.2 vocabulary), the greedy
  * left-to-right non-overlapping merge-application semantics the bracketed
  * literal replace must reproduce, determinism, and the vocab-cap guard. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def wfDf(wf: Seq[(String, Long)]) = {
    import spark.implicits._
    wf.toDF("word", "freq")
  }

  // The paper's example vocabulary: low×5, lower×2, newest×6, widest×3.
  private val paperWf =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("reproduces the Sennrich worked-example merge sequence") {
    val ms = Bpe.train(wfDf(paperWf), nMerges = 6, vocabCap = 100)
    val got = ms.map(m => (m.p1, m.p2, m.cnt))
    // Hand-derived with the (count desc, p1 asc, p2 asc) tie-break:
    // es(9), es+t(9), est+_(9), lo(7), lo+w(7), then ew(6) beats n*/w*
    // lexicographically at count 6.
    assert(got == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "_", 9L),
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "w", 6L)))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // [a,a,a]   -> [aa,a]    (first pair wins, no overlap reuse)
    // [a,a,a,a] -> [aa,aa]
    // [a,a,a,a,a] -> [aa,aa,a]
    val m = Seq(Bpe.Merge(0L, "a", "a", 0L))
    import spark.implicits._
    val got = Seq("aaa", "aaaa", "aaaaa").toDF("w")
      .select(Bpe.applyMerges(col("w"), m).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("<aa><a><_>", "<aa><aa><_>", "<aa><aa><a><_>"))
  }

  test("encodeDocs token counts match a driver-side replay") {
    import spark.implicits._
    val docs = Seq((1L, "newest lower low"), (2L, "widest newest newest"))
      .toDF("doc_id", "text")
    val ms = Bpe.train(wfDf(paperWf), nMerges = 5, vocabCap = 100)
    val got = Bpe.encodeDocs(docs, "doc_id", "text", ms)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Replay on the driver with the same literal replaces.
    def enc(w: String): String =
      ms.foldLeft(Bpe.initRepr(w)) { (acc, m) =>
        acc.replace(s"<${m.p1}><${m.p2}>", s"<${m.p1}${m.p2}>") }
    def nTok(text: String): Long =
      text.split(" ").map(w => enc(w).substring(1, enc(w).length - 1)
        .split("><").length.toLong).sum
    assert(got == Seq((1L, nTok("newest lower low")),
                      (2L, nTok("widest newest newest"))))
  }

  test("training is deterministic across repeated runs") {
    val a = Bpe.train(wfDf(paperWf), nMerges = 8, vocabCap = 100)
    val b = Bpe.train(wfDf(paperWf), nMerges = 8, vocabCap = 100)
    assert(a == b)
  }

  test("vocab-cap guard refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      Bpe.train(wfDf(paperWf), nMerges = 2, vocabCap = 2L)
    }
    assert(e.getMessage.contains("vocabCap"))
  }
}
