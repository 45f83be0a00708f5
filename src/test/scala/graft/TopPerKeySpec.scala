package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.TopPerKey

/** Bounded min-K-per-key aggregator properties (engine for d30): equality
  * with the window-rank form on skewed keys at several parallelism levels,
  * buffer boundedness, and merge determinism on adversarial splits. */
class TopPerKeySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("matches window rank on skewed keys at several partition counts") {
    import spark.implicits._
    // key 0 is hot (700 values), keys 1..9 small — the skew case the
    // bounded buffer exists for
    val rows = (0 until 700).map(i => (0L, (i * 7919L) % 100000L)) ++
      (1 to 9).flatMap(k => (0 until k * 3).map(i => (k.toLong, (i * 31L + k) % 500L)))
    val df = rows.toDF("key", "v")
    val expect = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).sorted.take(5)
    }
    for (np <- Seq(1, 4, 32)) {
      val got = df.repartition(np).groupBy("key")
        .agg(TopPerKey.minKCol(5)(col("v")).as("kept"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      expect.foreach { case (k, want) =>
        assert(got(k) == want, s"np=$np key=$k")
      }
    }
  }

  test("reduce keeps the buffer bounded and sorted") {
    val agg = TopPerKey.minKAgg(3)
    var buf = agg.zero
    Seq(9L, 1L, 5L, 5L, 0L, 7L, 2L).foreach(v => buf = agg.reduce(buf, v))
    assert(buf.toSeq == Seq(0L, 1L, 2L) && buf.length == 3)
  }

  test("merge is exact on adversarial splits (duplicates across sides)") {
    val agg = TopPerKey.minKAgg(4)
    val a = Array(1L, 3L, 3L, 8L)
    val b = Array(2L, 3L, 9L, 10L)
    assert(agg.merge(a, b).toSeq == Seq(1L, 2L, 3L, 3L))
    assert(agg.merge(b, a).toSeq == Seq(1L, 2L, 3L, 3L))
    assert(agg.merge(a, agg.zero).toSeq == a.toSeq)
  }
}
