package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each left point with every
  * right interval `[start, end)` of the same key that contains it.
  *
  * Spark plans a raw `l.ts >= r.start && l.ts < r.end` join condition
  * as BroadcastNestedLoopJoin (or a cartesian product under a key
  * equi-condition it can't use alone) — O(left × right) comparisons,
  * the classic range-join cliff. The scalable shape is BUCKETING: both
  * sides map to fixed-width time buckets, intervals exploding into one
  * row per covered bucket, and the join becomes an EQUIJOIN on
  * (keys…, bucket) followed by the exact containment filter.
  *
  * Cost: shuffle O(left + right · avg-buckets-per-interval) on uniform
  * keys, comparisons only within a bucket. `bucketWidth` trades
  * replication (long intervals → many buckets) against per-bucket
  * pair density; set it near the typical interval length.
  */
object RangeJoin {

  def bucketedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
  ): DataFrame = {
    require(bucketWidth > 0)
    // Integer bucket math via decimal division: Column `/` computes in
    // double, whose 53-bit mantissa mis-buckets values above ~9e15
    // (e.g. nanosecond epochs) and silently drops boundary matches.
    def bucketOf(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(bucketWidth).cast("decimal(38,0)")).cast("long")
    val l = left.withColumn("__bucket", bucketOf(col(pointCol)))
    // One row per bucket the interval overlaps; end is EXCLUSIVE so an
    // interval ending exactly on a bucket boundary does not spill into
    // the next bucket. Empty/inverted intervals (end <= start) yield NO
    // bucket rows — without the guard, sequence() would generate a
    // DESCENDING range and replicate garbage intervals across it.
    val r = right
      .withColumn(
        "__buckets",
        when(col(endCol) > col(startCol),
          sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1)))
          .otherwise(array().cast("array<long>")))
      .withColumn("__bucket", explode(col("__buckets")))
      .drop("__buckets")
    l.join(r, keys :+ "__bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
