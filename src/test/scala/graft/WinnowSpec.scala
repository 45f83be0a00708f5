package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextKernel

/** Winnowing fingerprint properties (Schleimer–Wilkerson–Aiken, SIGMOD
  * 2003): window coverage, rightmost-min tie-break, the shared-substring
  * detection guarantee, and short-document degradation. */
class WinnowSpec extends AnyFunSuite {

  private def fp(s: String, k: Int = 5, w: Int = 8): Array[(Int, Long)] =
    TextKernel.winnow(UTF8String.fromString(s), k, w).map(p => ((p >>> 32).toInt, p & 0xffffffffL))

  private def gramHashes(s: String, k: Int): Array[Long] =
    (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((v, c) => v * 31L + c.toInt)
    }.toArray

  test("every window of w grams contains a selected fingerprint (coverage)") {
    val s = "key agg row scan slow fast table value part hash value"
    val k = 5; val w = 8
    val sel = fp(s, k, w).map(_._1).toSet
    val ng = s.length - k + 1
    for (e <- (w - 1) until ng)
      assert((e - w + 1 to e).exists(sel.contains), s"window ending $e uncovered")
  }

  test("selected position is the rightmost minimum of some window") {
    val s = "the line sort table window table table key agg row"
    val k = 5; val w = 8
    val h = gramHashes(s, k)
    for ((p, hv) <- fp(s, k, w)) {
      assert(h(p) == hv)
      val ok = (0 until w).exists { j =>
        val st = p - (w - 1 - j) // window with p at offset j from end... any window containing p
        val e = st + w - 1
        st >= 0 && e < h.length &&
          (st to e).forall(q => h(q) > h(p) || (h(q) == h(p) && q <= p))
      }
      assert(ok, s"pos $p not a rightmost window min")
    }
  }

  test("positions are strictly increasing; hashes match gram hashes") {
    val s = "value table part a row fast merge batch part value fast spark"
    val ps = fp(s).map(_._1)
    assert(ps.sameElements(ps.sorted.distinct))
  }

  test("detection guarantee: shared substring of length >= w+k-1 shares a fingerprint hash") {
    val common = "abcdefghijklm" // 13 = w+k-1 with k=5,w=8 → 9 grams = one full window
    val a = fp("xxxQQ" + common + "zzzz").map(_._2).toSet
    val b = fp("uuuuuuuRR" + common + "pp").map(_._2).toSet
    assert(a.intersect(b).nonEmpty)
  }

  test("short documents degrade to one window over all grams") {
    val s = "abcdefg" // 3 grams < w
    val sel = fp(s)
    assert(sel.length == 1)
    val h = gramHashes(s, 5)
    val m = h.zipWithIndex.filter(_._1 == h.min).map(_._2).max
    assert(sel(0) == (m, h(m)))
    assert(fp("abcd").isEmpty) // shorter than k
  }
}
