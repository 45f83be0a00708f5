package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GPT-style concat-and-chunk token indexing: documents are concatenated
  * in doc_id order with one EOS token after each, and the resulting token
  * stream is cut into fixed-`budget` training sequences. Every document is
  * mapped to its global token offset and the chunk range it lands in —
  * the index a training loader needs to materialize sequence k without
  * scanning the corpus.
  *
  * The global prefix sum is computed WITHOUT a global window (the
  * single-task trap at 100 TB): docs are assigned DETERMINISTIC ordered
  * buckets (doc_id ranges — no sampled range partitioner, so both passes
  * see identical assignment without caching), one bounded aggregation
  * yields per-bucket token totals (driver state: one long per bucket, the
  * same bounded-budget class as the ANN centroids), exclusive bucket
  * offsets broadcast back, and a map-only second pass runs each bucket's
  * local prefix sum from its offset. Output is invariant to the bucket
  * count — only the offsets move. */
object TokenPack {

  /** @param docs (doc_id: long, text: string); token count = whitespace
    *             words (the d02 rule), +1 EOS per document.
    * @return (doc_id, n_tokens, start_tok, first_chunk, last_chunk) */
  def chunkIndex(docs: DataFrame, budget: Int, nBuckets: Int = 16): DataFrame = {
    require(budget > 0 && nBuckets > 0, "budget and nBuckets must be positive")
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long").as("n_tokens"))
    val (minId, maxId) = {
      val r = base.agg(min("doc_id"), max("doc_id")).head()
      if (r.isNullAt(0)) return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
      (r.getLong(0), r.getLong(1))
    }
    val span = math.max(1L, (maxId - minId) / nBuckets + 1L)
    val tk = base.withColumn("bucket",
      expr(s"(doc_id - ${minId}L) div ${span}L"))
    // pass 1: per-bucket totals (bounded aggregation, map-side combine)
    val totals = tk.groupBy("bucket")
      .agg(sum(col("n_tokens") + 1L).as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = new java.util.HashMap[Long, Long]()
    var acc = 0L
    totals.foreach { case (b, tot) => offsets.put(b, acc); acc += tot }
    val bOff = spark.sparkContext.broadcast(offsets)
    val bl = budget.toLong
    // pass 2: whole buckets co-located + (bucket, doc_id)-sorted, then a
    // map-only local prefix sum seeded from the bucket's exclusive offset
    val rows = tk.repartition(nBuckets, col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .rdd.mapPartitions { it =>
        var curBucket = Long.MinValue
        var run = 0L
        it.map { r =>
          val id = r.getLong(0); val nt = r.getLong(1); val bk = r.getLong(2)
          if (bk != curBucket) { curBucket = bk; run = bOff.value.get(bk) }
          val start = run
          run += nt + 1L
          // an empty doc still occupies its EOS token's chunk
          val lastTok = start + math.max(nt - 1L, 0L)
          Row(id, nt, start, start / bl, lastTok / bl)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("first_chunk", LongType, nullable = false),
    StructField("last_chunk", LongType, nullable = false)))
}
