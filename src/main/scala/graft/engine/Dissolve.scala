package graft.engine

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.geom.{BoolOps, MultiPolygon, Wkb}

/** Dissolve: geometric union of all features sharing attribute keys
  * (reference: `gdal vector dissolve`,
  * /root/reference/apps/gdalalg_vector_dissolve.cpp:120 — ST_Union(geom)
  * GROUP BY fields). Spark shape: a typed union Aggregator over WKB — the
  * partial-aggregate (map-side combine) runs the Martinez–Rueda union
  * incrementally per partition, so the shuffle carries one partially
  * dissolved geometry per (partition × key), not every input feature.
  * At 100 TB this is the difference between shuffling the dataset and
  * shuffling #keys rows. */
object Dissolve {

  private val emptyWkb: Array[Byte] = Wkb.write(MultiPolygon(Array.empty))

  val unionAgg: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = emptyWkb
      def reduce(buf: Array[Byte], wkb: Array[Byte]): Array[Byte] =
        Wkb.write(BoolOps.union(Wkb.read(buf), Wkb.read(wkb)))
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        Wkb.write(BoolOps.union(Wkb.read(a), Wkb.read(b)))
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Column form for DataFrame groupBy: `df.groupBy(keys).agg(unionCol(col))`. */
  def unionCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(unionAgg).apply(c)
  }
}
