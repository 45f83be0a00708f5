package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Lsh

/** Hot-bucket guard for banded LSH: a boilerplate bucket over the cap is
  * excluded from pair generation (and reported), normal buckets are
  * untouched — the 100-TB quadratic-bucket safeguard. */
class LshSpec extends AnyFunSuite {

  private def sig(rows: Seq[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]) = {
    val s = SparkTestSession.spark
    import s.implicits._
    rows.toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
  }

  test("oversized bucket excluded + reported; small buckets keep all pairs") {
    // 20 docs share band-0 signature (1,1,1,1) — the hot template bucket;
    // docs 100..102 share (9,9,9,9) — a normal 3-doc bucket; band 1 all
    // distinct (doc-specific) so it contributes no pairs
    val hot = (0L until 20L).map(i => (i, 1, 1, 1, 1, 1000 + i.toInt, 2, 3, 4))
    val cool = (100L to 102L).map(i => (i, 9, 9, 9, 9, 2000 + i.toInt, 2, 3, 4))
    val bands = Lsh.bandify(sig(hot ++ cool), nBands = 2)

    val (pairs, oversized) = Lsh.candidatePairs(bands, maxBucket = 8)
    val got = pairs.orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((100L, 101L), (100L, 102L), (101L, 102L)),
      s"only the cool bucket pairs should survive: ${got.toSeq}")
    val over = oversized.collect()
    assert(over.length === 1 && over(0).getAs[Long]("n") === 20L,
      "the hot bucket must be reported, not silently dropped")

    // uncapped: the hot bucket contributes its full 190 pairs
    val (all, none) = Lsh.candidatePairs(bands, maxBucket = Long.MaxValue)
    assert(all.count() === 190L + 3L)
    assert(none.where(col("n") > Long.MaxValue).count() === 0L)
  }
}
