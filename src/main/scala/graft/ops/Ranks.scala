package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Pin.PinOps

/** Distributed global ranking — the scalable replacement for an
  * unpartitioned `Window.orderBy` (which Spark executes as ONE task
  * holding the whole frame, the q67/q83 few-groups-window bottleneck).
  *
  * Mechanism: the same two-level scheme Spark's own scalable `orderBy`
  * uses — a RANGE repartition on the sort key (sampled boundaries,
  * parallel), then per-partition local ranks, then each partition's
  * rank offset = the total row count of all partitions before it.
  * Partition counts are a P-row frame (P = shuffle partitions, bounded
  * by CONFIG, not data) — its prefix sum is the only unpartitioned
  * window anywhere, and it broadcasts back as a map-side join.
  *
  * Equal sort keys land in one range partition, so ranks are exact; we
  * additionally require the caller to pass a TOTAL order (unique
  * tie-break column last) so `row_number` semantics are deterministic —
  * the same §7.0 rule every oracle-checked window query follows.
  */
object Ranks {

  /** Adds column `out` = the 1-based global row_number of each row
    * under the total order `order`, without a single-task sort.
    *
    * The pid-stamped frame is lineage-pinned ([[Pin]]): the partition-count
    * branch and the rank branch both read it, and the checkpoint pins
    * one materialization (and one pid assignment) for both. Intended
    * input is a REDUCED frame (per-entity aggregates, ≪ facts) — the
    * same contract as every q78-style bounded-frame exception, except
    * this one stays parallel however large the entity dimension grows.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val p = df
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .pinLineage(true)
    val offs = p
      .groupBy("__pid")
      .agg(count(lit(1)).as("__c"))
      // P rows total — config-bounded, not data-bounded
      .withColumn(
        "__off",
        coalesce(
          sum(col("__c")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__off")
    p.join(broadcast(offs), Seq("__pid"))
      .withColumn(
        out,
        (row_number().over(Window.partitionBy("__pid").orderBy(order: _*)).cast("long") +
          col("__off")))
      .drop("__pid", "__off")
  }

  /** Adds BOTH `outRank` = the 1-based global row_number and `outSum` =
    * the inclusive global running sum of `value`, under the total order
    * `order`, without a single-task sort — the distributed prefix-sum
    * (scan) primitive.
    *
    * Same two-level mechanism as [[withGlobalRank]]: range-partition on
    * the order keys, per-partition local rank/cumsum, then add each
    * partition's (row-count, value-total) offsets — a P-row frame whose
    * own prefix sum is the only unpartitioned window, broadcast back.
    * This is what replaces the `sum(x) OVER (ORDER BY …)` single-task
    * window for frames that grow with the data (water-filling caps,
    * quantile boundaries, cumulative-share curves).
    */
  def withGlobalPrefixSum(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      outRank: String,
      outSum: String,
  ): DataFrame = {
    val p = df
      .withColumn("__v", value)
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .pinLineage(true)
    val offs = p
      .groupBy("__pid")
      .agg(count(lit(1)).as("__c"), sum(col("__v")).as("__s"))
      // P rows total — config-bounded, not data-bounded
      .withColumn(
        "__off",
        coalesce(
          sum(col("__c")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(
        "__soff",
        coalesce(
          sum(col("__s")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__off", "__soff")
    val local = Window.partitionBy("__pid").orderBy(order: _*)
    p.join(broadcast(offs), Seq("__pid"))
      .withColumn(outRank,
        row_number().over(local).cast("long") + col("__off"))
      .withColumn(outSum,
        sum(col("__v")).over(local.rowsBetween(Window.unboundedPreceding, 0)) +
          col("__soff"))
      .drop("__pid", "__off", "__soff", "__v")
  }

  /** SQL `ntile(k)` bucket from a gap-free 1-based global rank over n
    * rows — pure arithmetic, no window: n rows split into k buckets,
    * the first n % k of size ⌈n/k⌉ (the exact ANSI ntile rule, same as
    * q83's bucket-boundary derivation). All operands stay < 2⁵² so the
    * double-division floors are exact.
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long") // base bucket size
    val m = (n % k).cast("long") // buckets carrying one extra row
    val cut = m * (q + lit(1L)) // last rank inside the big buckets
    when(rank <= cut, floor((rank + q) / (q + lit(1L))).cast("long"))
      .otherwise(m + floor((rank - cut + q - lit(1L)) / q).cast("long"))
  }
}
