package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, gf}

/** EXACT order statistics of a double column without a global sort — the
  * k-th smallest of 10^12 values in four bounded aggregation passes.
  *
  * Method: values map to [[graft.functions.GeoKernel.doubleUsortBits]]
  * (a long whose unsigned order equals the double order), and the k-th
  * element's 64 bits are found 16 bits at a time — each round is ONE
  * distributed aggregation counting the ≤65536 possible next digits among
  * rows that match the prefix fixed so far, after which the driver picks
  * the digit whose cumulative count crosses k. Driver state is bounded by
  * construction (≤2^16 counters per round, 4 rounds); no sample, no
  * sort shuffle, no approximation — the selection-by-radix classic
  * (Blum et al.-era selection, radix flavor), which is what "exact p99 of
  * a 100-TB column" has to look like when a global sort is off the table.
  *
  * Each quantile costs 4 filtered scans; callers needing many quantiles
  * at scale would carry the per-quantile prefixes through shared passes
  * (same aggregation keyed by (quantile, digit)) — the gate keeps the
  * single-k form.
  */
object Quantiles {

  /** Inverse of doubleUsortBits. */
  def fromUsortBits(u: Long): Double = {
    val s = u ^ java.lang.Long.MIN_VALUE
    val bits = if (s >= 0) s else java.lang.Long.MIN_VALUE - s
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Exact k-th smallest (1-based) value of `valueCol`. Throws if k is
    * out of range. NaNs, if present, order above +Infinity (IEEE bit
    * order); nulls are excluded by the expression's null semantics. */
  def exactKth(df: DataFrame, valueCol: String, k: Long): Double = {
    require(k >= 1, s"exactKth: k=$k must be >= 1")
    GraftFunctions.register(df.sparkSession)
    val us = df.select(
      gf.double_usort_bits(col(valueCol).cast("double")).as("u"))
      .where(col("u").isNotNull)
    var prefix = 0L
    var kk = k
    var r = 0
    while (r < 4) {
      val shift = 48 - 16 * r
      val base =
        if (r == 0) us
        else us.where(shiftrightunsigned(col("u"), shift + 16) === prefix)
      val counts = base
        .groupBy(shiftrightunsigned(col("u"), shift)
          .bitwiseAND(lit(0xffffL)).as("d"))
        .agg(count(lit(1)).as("c"))
        .collect() // ≤ 2^16 rows by construction
        .map(row => (row.getLong(0), row.getLong(1)))
        .sortBy(_._1)
      var digit = -1L
      var i = 0
      while (digit < 0 && i < counts.length) {
        val (d, c) = counts(i)
        if (kk <= c) digit = d else kk -= c
        i += 1
      }
      require(digit >= 0,
        s"exactKth: k=$k exceeds the row count; refusing")
      prefix = (prefix << 16) | digit
      r += 1
    }
    fromUsortBits(prefix)
  }
}
