package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exact arithmetic helpers.
  *
  * Floating-point REDUCTIONS (sum/avg over doubles) are order-dependent,
  * so a Spark sum and a DuckDB sum of the same 60k doubles can differ in
  * the last ulps — enough to break a hash-compare. Per-ROW double ops are
  * IEEE-deterministic. The contract used by every oracle-checked query:
  *
  *   1. per-row arithmetic in double (deterministic bit-for-bit),
  *   2. scale to fixed-point integer "cents" (round(x·10^s) as BIGINT),
  *   3. aggregate the longs (exact, order-independent, codegen-fast —
  *      the earlier DECIMAL formulation was ~5× slower through Spark's
  *      Decimal slow path),
  *   4. one exact long→double conversion + one division at the end.
  *
  * Overflow budget: scale 6 × |x|≤1e5 × ~6e5 rows ≈ 6e16 ≪ 2^63; the
  * final double conversion is exact while |sum| < 2^53. At extreme row
  * counts switch dsum back to decimal sums (sumDecimal below).
  */
object Exact {
  private def pow10(s: Int): Double = math.pow(10, s)

  /** Per-row fixed-point long at `scale` decimals. */
  def fixedLong(c: Column, scale: Int = 2): Column =
    round(c * pow10(scale), 0).cast("long")

  /** Exact, order-independent sum of a double column → DOUBLE. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(fixedLong(c, scale)).cast("double") / pow10(scale)

  /** Exact average: fixed-point sum, then two IEEE divisions. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(fixedLong(c, scale)).cast("double") / pow10(scale) / count(c).cast("double")

  /** Decimal-cast per-row value (for exact decimal comparisons). */
  def dec(c: Column, scale: Int = 2): Column =
    round(c, scale).cast(DecimalType(18, scale))

  // ---- oracle-side (DuckDB) fragment equivalents ----

  private def sqlPow10(s: Int): String =
    if (s == 0) "1.0" else "1" + "0" * s + ".0"

  def sqlFixedLong(e: String, scale: Int = 2): String =
    s"CAST(round(($e) * ${sqlPow10(scale)}, 0) AS BIGINT)"
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(sum(${sqlFixedLong(e, scale)}) AS DOUBLE) / ${sqlPow10(scale)}"
  def sqlDavg(e: String, scale: Int = 2): String =
    s"CAST(sum(${sqlFixedLong(e, scale)}) AS DOUBLE) / ${sqlPow10(scale)} / CAST(count($e) AS DOUBLE)"
  def sqlDec(e: String, scale: Int = 2): String =
    s"CAST(round($e, $scale) AS DECIMAL(18,$scale))"
}
