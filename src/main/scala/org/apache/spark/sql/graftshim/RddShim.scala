package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the `private[sql]` [[LogicalRDD]] node so pinned frames
  * (localCheckpoint — an RDD-level persist) can be RELEASED the moment
  * a loop supersedes them, instead of waiting for the ContextCleaner
  * to notice the dropped reference. Same access technique as
  * [[ColumnShim]]; public Spark source knowledge only.
  */
object RddShim {

  /** Unpersist the RDD behind a `localCheckpoint`ed frame. ONLY the
    * plan ROOT is considered: a pinned frame's analyzed plan IS a
    * LogicalRDD — matching deeper leaves would tear down UPSTREAM pins
    * the caller still shares (e.g. the corpus `fp` frame every k-means
    * round reads), which is exactly the checkpoint-block-not-found
    * failure this guard exists for. Best-effort and idempotent: frames
    * whose root is not an RDD leaf (reliable checkpoints read files;
    * plain frames) are left untouched. Non-blocking — the blocks drop
    * asynchronously, which is enough to stop unbounded accumulation
    * across loop rounds.
    */
  def unpersistPinned(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
