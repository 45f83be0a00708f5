package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextKernel

/** Gopher repetition-stats kernel (Rae et al. 2021 §A1.1) vs a naive
  * Scala-collections re-implementation, plus edge cases the d11 oracle
  * cannot isolate (empty words, short docs, all-duplicate docs). */
class RepStatsSpec extends AnyFunSuite {

  private def kernel(s: String): Array[Long] =
    TextKernel.repStats(UTF8String.fromString(s))

  /** Naive reference: same definitions, built from collections ops. */
  private def naive(s: String): Array[Long] = {
    val words = s.split(" ", -1)
    val m = words.length
    val tot = words.map(_.length.toLong).sum
    val out = new Array[Long](8)
    out(0) = m.toLong; out(1) = tot
    for (n <- 2 to 7) {
      val grams = words.sliding(n).filter(_.length == n).map(_.mkString(" ")).toVector
      if (grams.nonEmpty) {
        val cnt = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
        if (n <= 4) {
          out(n) = cnt.map { case (g, c) =>
            c.toLong * (g.length.toLong - (n - 1)) }.max
        } else {
          val covered = grams.zipWithIndex.collect {
            case (g, i) if cnt(g) >= 2 => (i until i + n)
          }.flatten.toSet
          out(n) = covered.toSeq.map(j => words(j).length.toLong).sum
        }
      }
    }
    out
  }

  test("matches naive reference on deterministic pseudo-random docs") {
    val vocab = Array("the", "a", "scan", "join", "sort", "data", "row", "batch")
    var seed = 12345L
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    for (trial <- 0 until 40) {
      val len = 1 + nextInt(60)
      val text = Array.fill(len)(vocab(nextInt(vocab.length))).mkString(" ")
      assert(kernel(text).sameElements(naive(text)), s"trial $trial: $text")
    }
  }

  test("all-duplicate doc: dup coverage equals total word chars") {
    val text = Array.fill(20)("spark").mkString(" ")
    val r = kernel(text)
    assert(r(0) == 20 && r(1) == 100)
    assert(r(5) == 100 && r(6) == 100 && r(7) == 100)
    // top-2-gram: "spark spark" occurs 19 times covering 19*10 chars
    assert(r(2) == 190L)
  }

  test("no repetition: dup coverage is zero, top-n coverage is one gram") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota"
    val r = kernel(text)
    assert(r(5) == 0 && r(6) == 0 && r(7) == 0)
    // all counts are 1, so the max-coverage 2-gram is the longest one
    assert(r(2) == ("delta".length + "epsilon".length).toLong)
  }

  test("short docs degrade: fewer words than n gives zero") {
    val r = kernel("one two")
    assert(r(0) == 2 && r(3) == 0 && r(5) == 0)
    assert(r(2) == ("one".length + "two".length).toLong)
  }

  test("empty words from double spaces are kept (split -1 semantics)") {
    val r = kernel("a  b")
    assert(r(0) == 3 && r(1) == 2) // "a", "", "b"
    assert(r.sameElements(naive("a  b")))
  }

  // ---- charClassSegs (d15 kernel) ----

  private def segs(s: String): Array[Long] =
    TextKernel.charClassSegs(UTF8String.fromString(s))

  test("char-class segmentation: mixed classes") {
    // "ab12 -x" → [ab][12][ ][-][x]: 5 segs, 2 letter, 1 digit, 1 other, 1 space
    val r = segs("ab12 -x")
    assert(r.sameElements(Array(5L, 2L, 1L, 1L, 1L, 2L, 0L)))
  }

  test("char-class segmentation: long run counting and max") {
    val r = segs("a" * 20 + " " + "b" * 17 + "7")
    // [aaaa...20][ ][bbb...17][7] → 4 segs, 2 letter, 1 digit, 1 space
    assert(r(0) == 4 && r(1) == 2 && r(2) == 1 && r(4) == 1)
    assert(r(5) == 20 && r(6) == 2) // two segments longer than 16
  }

  test("char-class segmentation: empty and single-class strings") {
    assert(segs("").sameElements(new Array[Long](7)))
    val r = segs("abc")
    assert(r.sameElements(Array(1L, 1L, 0L, 0L, 0L, 3L, 0L)))
  }
}
