package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded MinHash LSH candidate generation with the 100-TB hot-bucket
  * guard. The band equi-join is bucket-bounded (never all-pairs), but a
  * single boilerplate bucket of B near-identical documents still yields
  * B²/2 candidate pairs inside the join — at web scale a template shared
  * by 10⁷ pages is a quadratic bomb. The guard excludes buckets larger
  * than `maxBucket` from pair generation and reports them to the caller
  * (never silently: they are counted, logged, and returned) — oversized
  * buckets are near-exact template clusters better handled by the exact
  * digest dedup (d01/m01 path) than by pairwise Jaccard.
  *
  * Scale shape: bucket sizes are one aggregate on the band table; the
  * oversized key set is small by construction (each key holds >maxBucket
  * rows) so the exclusion join broadcasts. AQE skew splitting still
  * handles the surviving below-cap buckets.
  */
object Lsh {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Band table from a signature frame (doc_id, h0..h{n-1}):
    * one row per (doc, band) with the band's hash tuple columns x1..x4. */
  def bandify(sig: DataFrame, nBands: Int, rowsPerBand: Int = 4): DataFrame = {
    val bs = (0 until nBands).map { b =>
      struct((lit(b).as("band") +: (1 to rowsPerBand).map(i =>
        col(s"h${rowsPerBand * b + i - 1}").as(s"x$i"))): _*)
    }
    sig.select(col("doc_id"), explode(array(bs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.*"))
  }

  private val BandKey = Seq("band", "x1", "x2", "x3", "x4")

  /** Candidate pairs (a < b) from the band table, excluding buckets with
    * more than `maxBucket` members. Returns (pairs, oversizedBuckets) —
    * the second frame carries (band, x1..x4, n) for every excluded
    * bucket so callers can route them to exact dedup. */
  def candidatePairs(bands: DataFrame,
                     maxBucket: Long = 4096L): (DataFrame, DataFrame) = {
    val key = BandKey.map(col)
    val sizes = bands.groupBy(key: _*).agg(count(lit(1)).as("n"))
    val oversized = sizes.where(col("n") > maxBucket)
    val kept =
      if (maxBucket == Long.MaxValue) bands
      else bands.join(broadcast(oversized.select(BandKey.map(col): _*)),
        BandKey, "left_anti")
    if (maxBucket != Long.MaxValue) {
      val dropped = oversized.count()
      if (dropped > 0)
        log.warn(s"LSH hot-bucket guard: $dropped bucket(s) over $maxBucket " +
          "members excluded from pair generation — route them to exact dedup")
    }
    val pairs = kept.as("l").join(kept.as("r"),
        BandKey.map(k => col(s"l.$k") === col(s"r.$k"))
          .reduce(_ && _) && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    (pairs, oversized)
  }
}
