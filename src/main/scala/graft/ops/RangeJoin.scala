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
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val l = left.withColumn("__bucket", bucketOf(col(pointCol)))
    // one row per bucket the interval overlaps; end is EXCLUSIVE so an
    // interval ending exactly on a bucket boundary does not spill into
    // the next bucket
    val r = right.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1))))
    l.join(r, keys :+ "__bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
