package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared HyperLogLog kernel for the d27 batch gate and the s08 streaming
  * gate (one definition of the hash/bucket/rank/estimator pipeline, so
  * the streamed-equals-batch twin relationship is structural — the
  * [[CountMin]] pattern).
  *
  * m = 64 registers over md5 bits: bucket = first two hex chars decoded
  * via instr (no hex→int builtin needed), rank ρ = leading-zero BITS of
  * the next 12 hex chars + 1 (regexp zero-prefix × 4 + a per-digit CASE).
  * Registers merge by MAX — the other mergeable-sketch class next to
  * count-min's sums. The indicator Σ2^−M sums exact dyadic rationals
  * spanning < 53 bits, so IEEE addition is order-independent and
  * cross-engine bit-equal; estimation applies the Flajolet α₆₄ raw
  * formula with the small-range linear-counting branch.
  */
object Hll {

  /** (scope, bkt, rho) per input gram — input needs (scope, g). */
  def ranks(grams: DataFrame): DataFrame =
    grams
      .withColumn("h", md5(col("g")))
      .withColumn("bkt", expr(
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(h, 2, 1)) - 1)) % 64"))
      .withColumn("z", expr("length(regexp_extract(substring(h, 3, 12), '^0*', 0))"))
      .withColumn("rho", expr(
        "CAST(z * 4 + CASE WHEN z = 12 THEN 1 ELSE " +
          "CASE WHEN instr('89abcdef', substring(h, 3 + z, 1)) > 0 THEN 1 " +
          "WHEN instr('4567', substring(h, 3 + z, 1)) > 0 THEN 2 " +
          "WHEN instr('23', substring(h, 3 + z, 1)) > 0 THEN 3 " +
          "ELSE 4 END END AS BIGINT)"))
      .select("scope", "g", "bkt", "rho")

  /** Max-merged registers: (scope, bkt, m_reg), ≤64 rows per scope. */
  def registers(ranksDf: DataFrame): DataFrame =
    ranksDf.groupBy("scope", "bkt").agg(max("rho").as("m_reg"))

  /** Estimate from a register table: (scope, v, est_e2) — v = empty
    * registers, est_e2 = fixed-point estimate with the linear-counting
    * small-range branch (raw ≤ 2.5m ∧ v > 0). */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy("scope").agg(
        sum(expr("pow(2.0, -CAST(m_reg AS DOUBLE))")).as("s"),
        count(lit(1)).as("nz"))
      .withColumn("v", lit(64L) - col("nz"))
      .withColumn("raw", expr("0.709 * 4096.0 / (s + CAST(v AS DOUBLE))"))
      .withColumn("est_e2", expr(
        "CAST(floor((CASE WHEN v > 0 AND raw <= 160.0 " +
          "THEN 64.0 * ln(64.0 / CAST(v AS DOUBLE)) ELSE raw END) * 100.0) AS BIGINT)"))
      .select("scope", "v", "est_e2")
}
