package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-independent numeric aggregation helpers.
  *
  * Double summation is order-dependent, and Spark's shuffle-time partial
  * aggregation visits rows in a different order than DuckDB's scan — so
  * any oracle-checked money/metric sum routes through exact decimal
  * accumulation and only surfaces a double at the end (SURVEY.md §7.0).
  * Decimal partial aggregates combine exactly, so the map-side-combine
  * benefit is kept; this is also the right call at 100 TB, where a
  * nondeterministic revenue total is a real reconciliation hazard.
  */
object Exact {

  /** sum(column) with exact decimal accumulation, surfaced as double. */
  def dsum(c: String): Column = sum(col(c).cast(DecimalType(18, 2))).cast("double")

  def dsumSql(c: String): String = s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** TPC-H style revenue: sum(extendedprice * (1 - discount)) in exact
    * decimal arithmetic (decimal*decimal and decimal-sum are exact).
    * The decimal-returning form is the single source of truth for the
    * precision-sensitive expression; keep window-frame consumers (q52)
    * and the final-double form below derived from it.
    */
  def revenueDecimal: Column =
    sum(
      col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4)))
    )

  val revenueDecimalSql: String =
    "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"

  def revenueExpr: Column = revenueDecimal.cast("double")

  val revenueSql: String = s"CAST($revenueDecimalSql AS DOUBLE)"

  // ------------------------------------------------------------------
  // Exact integer square root — floor(√x) for non-negative int64 x.
  //
  // float sqrt + a one-step integer correction IS exact for x < 2⁵³:
  // the double holds x exactly and IEEE sqrt is correctly rounded, so
  // the float result is within 0.5 ulp ≈ √x·1.1e-16 < 1 of √x — the
  // naive floor can only be off by ±1, and the correction below checks
  // both neighbors with pure integer comparisons. This makes √ usable
  // inside hash-matched fixed-point pipelines (q42's centroid
  // normalization): both engines run the SAME correction, so they
  // cannot disagree even where their libm sqrt might.
  // ------------------------------------------------------------------

  /** Exact isqrt as a Column (input ≥ 0, < 2⁵³; output long). */
  def isqrt(x: Column): Column = {
    val y0 = floor(sqrt(x.cast("double"))).cast("long")
    when((y0 + 1) * (y0 + 1) <= x, y0 + 1)
      .when(y0 * y0 > x, y0 - 1)
      .otherwise(y0)
  }

  /** The same correction as inline DuckDB SQL — `x` should be a simple
    * column reference (it is repeated textually).
    */
  def isqrtSql(x: String): String = {
    val y = s"CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT)"
    s"(CASE WHEN ($y+1)*($y+1) <= ($x) THEN $y+1 " +
      s"WHEN $y*$y > ($x) THEN $y-1 ELSE $y END)"
  }

  /** Driver-side exact isqrt (for scalar parameters like cell counts). */
  def isqrtLong(n: Long): Long = {
    require(n >= 0 && n < (1L << 53), s"isqrtLong domain: 0 <= n < 2^53, got $n")
    val y0 = math.floor(math.sqrt(n.toDouble)).toLong
    if ((y0 + 1) * (y0 + 1) <= n) y0 + 1 else if (y0 * y0 > n) y0 - 1 else y0
  }
}
