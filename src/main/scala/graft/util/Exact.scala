package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exact arithmetic helpers.
  *
  * Floating-point REDUCTIONS (sum/avg over doubles) are order-dependent, so
  * a Spark sum and a DuckDB sum of the same 60k doubles can differ in the
  * last few ulps — enough to break a hash-compare. Per-ROW double ops are
  * IEEE-deterministic though. So the contract used by every query that
  * feeds the oracle compare is:
  *
  *   1. per-row arithmetic in double (deterministic bit-for-bit),
  *   2. round to a fixed scale and cast to DECIMAL before any aggregation,
  *   3. aggregate the DECIMAL (exact, order-independent),
  *   4. cast the final value back to DOUBLE (one exact conversion).
  *
  * The oracle SQL mirrors the same casts, so both engines produce the
  * identical double bit pattern.
  */
object Exact {
  /** Round-and-fix a per-row double expression at `scale` decimals. */
  def dec(c: Column, scale: Int = 2): Column =
    round(c, scale).cast(DecimalType(18, scale))

  /** Exact, order-independent sum of a double column → DOUBLE. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast("double")

  /** Exact average: decimal sum divided by count, both exact, one IEEE
    * division → deterministic double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast("double") / count(c).cast("double")

  /** Oracle-side (DuckDB) fragment equivalents, for building oracleSql. */
  def sqlDec(e: String, scale: Int = 2): String =
    s"CAST(round($e, $scale) AS DECIMAL(18,$scale))"
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(sum(${sqlDec(e, scale)}) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 2): String =
    s"CAST(sum(${sqlDec(e, scale)}) AS DOUBLE) / CAST(count($e) AS DOUBLE)"
}
