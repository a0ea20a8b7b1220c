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
}
