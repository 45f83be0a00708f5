package graft.engine

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact bounded-state top-K per key: a typed Aggregator whose buffer is
  * the ascending array of (at most) the K smallest values seen — O(K)
  * state per key with map-side partial merges, so a hot key NEVER
  * materializes its full value list (`collect_list` + sort would be
  * unbounded on exactly the key that matters). This is the per-domain-cap
  * shape every crawl-scale corpus pipeline runs (C4 / RefinedWeb-style
  * per-host document limits): keep the K smallest ids per domain,
  * deterministically, at any key skew.
  *
  * Same extensibility tier as [[Dissolve.unionAgg]] (SURVEY §2.J typed
  * Aggregators): reduce/merge are associative + commutative on the
  * bounded buffer, which is what lets Spark run it as a partial
  * aggregation before the shuffle.
  */
object TopPerKey {

  def minKAgg(k: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(k >= 1, s"TopPerKey.minKAgg: k=$k must be >= 1")
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.empty

      def reduce(buf: Array[Long], v: Long): Array[Long] = {
        if (buf.length == k && v >= buf(k - 1)) return buf
        val i = {
          val p = java.util.Arrays.binarySearch(buf, v)
          if (p >= 0) p else -(p + 1)
        }
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, i)
        out(i) = v
        System.arraycopy(buf, i, out, i + 1, n - i - 1)
        out
      }

      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        val n = math.min(a.length + b.length, k)
        val out = new Array[Long](n)
        var i = 0; var j = 0; var o = 0
        while (o < n) {
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            out(o) = a(i); i += 1
          } else { out(o) = b(j); j += 1 }
          o += 1
        }
        out
      }

      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }
  }

  /** Column form: `df.groupBy(key).agg(minKCol(30)(col("doc_id")))`. */
  def minKCol(k: Int)(c: Column): Column = udaf(minKAgg(k)).apply(c)
}
