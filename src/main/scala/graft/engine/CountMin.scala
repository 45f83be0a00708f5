package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared count-min sketch kernel for the d26 batch gate, the s07
  * streaming gate, and [[graft.streaming.StreamJobs.streamCountMin]] —
  * ONE definition of the hash family / cell build / estimation pipeline,
  * so the "streamed sketch ≡ batch sketch" twin relationship is pinned
  * structurally (an edit here changes all three together; divergent
  * copies would silently break the equality the s07 gate asserts).
  *
  * 4 rows × 256 columns; row r's hash of word w is the first md5 hex
  * byte of "r:w" (string bucket keys — any engine buckets identically).
  * Cells are counts, so partition/micro-batch sketches merge by
  * addition; estimation is the standard min over rows.
  */
object CountMin {

  val HashRows: Seq[Int] = Seq(0, 1, 2, 3)

  private def bucketExpr(src: String) =
    s"substring(md5(concat(CAST(r AS STRING), ':', $src)), 1, 2)"

  /** (r, b, c) sketch cells for a DataFrame with a `w` word column —
    * ≤1024 rows regardless of input size. */
  def cells(words: DataFrame): DataFrame =
    words.select(col("w"), explode(typedLit(HashRows)).as("r"))
      .withColumn("b", expr(bucketExpr("w")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))

  /** Point-frequency estimates for `terms` against a cell table:
    * est = min over rows of the hashed cell (0 when unset). */
  def estimate(spark: SparkSession, cellsDf: DataFrame,
               terms: Seq[String]): DataFrame = {
    val sp = spark
    import sp.implicits._
    terms.toDF("term")
      .select(col("term"), explode(typedLit(HashRows)).as("r"))
      .withColumn("b", expr(bucketExpr("term")))
      .join(broadcast(cellsDf), Seq("r", "b"), "left")
      .groupBy("term").agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
