package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-parity helpers.
  *
  * Floating-point aggregation is order-dependent, and Spark's shuffle order
  * differs run-to-run and engine-to-engine. Every graded query therefore
  * aggregates doubles through exact decimal arithmetic and casts the final
  * value back to double: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  * The per-row double→decimal rounding is deterministic (rounding boundaries
  * like 0.005 are not exactly representable in binary, so both engines see
  * the same side of the boundary), the decimal sum is exact, and the final
  * double is identical in Spark and DuckDB regardless of accumulation order.
  */
package object ops {
  /** Exact sum of a double column at decimal scale `s`, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average: exact decimal sum divided (in doubles) by count. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** Exact sum with a 0 default for empty/all-null groups, as double. */
  def dsum0(c: Column, scale: Int = 2): Column =
    coalesce(sum(c.cast(DecimalType(18, scale))), lit(0)).cast("double")

  /** DuckDB twin of [[dsum]] for oracle SQL strings. */
  def oSum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** DuckDB twin of [[davg]]. */
  def oAvg(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)/count($x)"

  /** DuckDB twin of [[dsum0]]. */
  def oSum0(x: String, scale: Int = 2): String =
    s"CAST(COALESCE(SUM(CAST($x AS DECIMAL(18,$scale))),0) AS DOUBLE)"

  /** 32-bit integer from the first 8 hex digits of md5 column `m` — the
    * seedless uniform draw shared by q137 (priority sampling) and q145
    * (reconciliation digests). Spark-side SQL fragment; `m` must name a
    * lowercase-hex md5 column in scope. */
  def md5Bits32(m: String): String =
    (0 until 8).map(i =>
      s"(instr('0123456789abcdef', substring($m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")

  /** DuckDB twin of [[md5Bits32]] (strpos ↔ instr, substr ↔ substring). */
  def oMd5Bits32(m: String): String =
    (0 until 8).map(i =>
      s"(strpos('0123456789abcdef', substr($m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")
}
