package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.classic.Dataset

/** Bridge to the `private[sql]` [[Dataset.ofRows]] constructor so a
  * logical plan can be REBOUND to another session of the same
  * SparkContext. [[graft.ops.Pin]] uses it to run a materialization
  * job under a CLONED session (own SQLConf — e.g. non-adaptive
  * planning so the checkpoint captures its partitioning) without ever
  * mutating conf a concurrent query on the caller's session could
  * observe. Same access technique as [[ColumnShim]]; public Spark
  * source knowledge only.
  */
object DatasetShim {

  /** `plan` (an ANALYZED logical plan — resolution happened under the
    * owning session) re-wrapped as a DataFrame of `spark`.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    Dataset.ofRows(castToImpl(spark), plan)
}
