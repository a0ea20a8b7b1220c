package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for scan-fused hot expressions.
  *
  * A heavy per-row expression (shingle explode, pixel-grid fold, an
  * md5 fan-out) fuses into the SCAN stage under whole-stage codegen,
  * so its parallelism is the scan's split count — and a bench-scale
  * table is one parquet row group, so the whole pass runs on ONE task
  * no matter how many cores the session has (stage-traced r10: the
  * single-split scan stages owned 1.3–4 s of every cascade/multimodal
  * query). `spark.sql.files.minPartitionNum` cannot fix this: byte
  * -range splits of a single row group yield empty tasks.
  *
  * [[widened]] repartitions to the session's shuffle parallelism ONLY
  * when the frame's planned partitioning is narrower — at production
  * scale a corpus scans with thousands of splits and the guard makes
  * this a no-op, so the raw payload is never shuffled just to spread
  * it (guide §8: move heavy bytes only when placement demands it).
  * Costs one extra physical planning of the (scan-shaped) subtree to
  * read the partition count.
  */
object Widen {

  /** True when the analyzed plan contains a shuffle-inducing operator.
    * Such frames already carry the session's shuffle parallelism, so
    * widening is pointless — and probing their `.rdd` partition count
    * would EXECUTE the shuffle stages eagerly under AQE (query stages
    * materialize at planning time), running part of the query twice.
    * The narrow-plan case (scan + project/filter/generate) is the one
    * with the single-row-group problem, and there `.rdd` is pure
    * planning.
    */
  private def shuffleShaped(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.analyzed.collectFirst {
      case p @ (_: Aggregate | _: Join | _: Distinct | _: Deduplicate |
          _: Repartition | _: RepartitionByExpression | _: Sort |
          _: Window | _: GlobalLimit | _: Intersect | _: Except) => p
    }.isDefined
  }

  def widened(df: DataFrame): DataFrame =
    if (df.isStreaming || shuffleShaped(df)) df // streaming: no .rdd, microbatches size themselves
    else {
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      if (df.rdd.getNumPartitions < n) df.repartition(n) else df
    }
}
