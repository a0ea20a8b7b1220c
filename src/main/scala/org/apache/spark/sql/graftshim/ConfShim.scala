package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` [[SerializableConfiguration]] so
  * executor-side tasks (distributed seal writes) can carry the
  * session's Hadoop configuration — credentials, filesystem settings —
  * instead of reconstructing a default `new Configuration()`. The
  * private type cannot be *named* outside `org.apache.spark`, so the
  * bridge hands back a serializable thunk. Same access technique as
  * [[ColumnShim]]; public Spark source knowledge only.
  */
object ConfShim {

  /** A serializable factory over `conf`; invoke on the executor to get
    * the deserialized Configuration.
    */
  def confFactory(conf: Configuration): () => Configuration = {
    val sc = new SerializableConfiguration(conf)
    () => sc.value
  }
}
