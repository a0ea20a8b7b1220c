package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations — the 100 TB form of the
  * observe queries (SURVEY §7.2: `approx_count_distinct` is the first
  * knob when exact countDistinct's per-group hash sets stop fitting).
  * Excluded from the oracle map by design (sketches are
  * implementation-defined); accuracy is asserted in tests against the
  * exact forms at test scale.
  */
object ApproxOps {

  /** A5 at scale: HyperLogLog++ distinct counts per group. rsd=0.01
    * ≈ 1% error with KBs of state per group, vs exact countDistinct's
    * unbounded hash sets.
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], target: String, rsd: Double = 0.01): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(target), rsd).as(s"approx_n_$target"))

  /** A2 at scale: t-digest style quantiles in one pass (exact
    * percentile needs a full sort or all values in memory).
    */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], target: String,
      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile_approx(
          col(target),
          array(probabilities.map(lit): _*),
          lit(accuracy),
        ).as(s"quantiles_$target")
      )
}
